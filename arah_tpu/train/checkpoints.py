"""Checkpointing: Orbax-based save/resume plus a converter from the
reference's PyTorch checkpoints into arah_tpu param pytrees.

The converter understands three reference formats
(`im2mesh/metaavatar_render/config.py:18-93,291-300`):
  * full ARAH Lightning checkpoints (`state_dict` with `model.` prefix),
  * pretrained MetaAvatar SDF hypernet ckpts (`model` with `decoder.` keys),
  * pretrained SNARF-style forward skinning ckpts
    (`model` with `skinning_decoder_fwd.` keys).

All inputs are dicts of numpy arrays (call `.numpy()` on torch tensors
before passing; this module never imports torch).
"""
from __future__ import annotations

import os
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from arah_tpu.nn.hypernet import HypernetConfig, siren_layer_dims
from arah_tpu.render.renderer import ModelConfig


def _j(x):
    return jnp.asarray(np.asarray(x), jnp.float32)


def strip_prefix(sd: Mapping[str, np.ndarray], prefix: str):
    out = {}
    for k, v in sd.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


# ------------------------- sub-converters ----------------------------------

def convert_fc_block(sd, prefix):
    """pytorch_prototyping FCBlock -> {'hidden': [...], 'last': {...}}.

    torch layout: net.0.net.0 (Linear), net.0.net.1 (LayerNorm), ...,
    net.<L-1> (final Linear).
    """
    hidden = []
    i = 0
    while f'{prefix}net.{i}.net.0.weight' in sd:
        hidden.append({
            'lin': {'w': _j(sd[f'{prefix}net.{i}.net.0.weight']),
                    'b': _j(sd[f'{prefix}net.{i}.net.0.bias'])},
            'ln': {'gamma': _j(sd[f'{prefix}net.{i}.net.1.weight']),
                   'beta': _j(sd[f'{prefix}net.{i}.net.1.bias'])},
        })
        i += 1
    last = {'w': _j(sd[f'{prefix}net.{i}.weight']),
            'b': _j(sd[f'{prefix}net.{i}.bias'])}
    return {'hidden': hidden, 'last': last}


def convert_pose_encoder(sd, prefix):
    layers = []
    j = 0
    while f'{prefix}layers.{j}.0.weight' in sd:
        layers.append({
            'fc1': {'w': _j(sd[f'{prefix}layers.{j}.0.weight']),
                    'b': _j(sd[f'{prefix}layers.{j}.0.bias'])},
            'fc2': {'w': _j(sd[f'{prefix}layers.{j}.2.weight']),
                    'b': _j(sd[f'{prefix}layers.{j}.2.bias'])},
        })
        j += 1
    return {'layer_0': {'w': _j(sd[f'{prefix}layer_0.weight']),
                        'b': _j(sd[f'{prefix}layer_0.bias'])},
            'layers': layers}


def convert_hypernet(sd, cfg: HypernetConfig, prefix='sdf_decoder.'):
    """Reference `HyperBVPNet` state dict -> arah_tpu hypernet params."""
    dims = siren_layer_dims(cfg)
    hyper_layers, hypo_init = [], []
    for i in range(len(dims)):
        if i < len(dims) - 1:
            base = f'{prefix}net.layers.{i}.hyper_linear.'
        else:
            base = f'{prefix}net.layers.{i}.'
        hyper_layers.append(convert_fc_block(sd, base + 'hypo_params.'))
        key = base + 'hypo_params_init'
        if key in sd:
            hypo_init.append(_j(sd[key]).reshape(-1))
        else:
            d_in, d_out = dims[i]
            hypo_init.append(jnp.zeros((d_in * d_out + d_out,)))
    params = {'hyper_layers': hyper_layers, 'hypo_init': hypo_init}

    if cfg.use_film:
        lins = []
        for idx in (0, 2, 4):
            lins.append({'w': _j(sd[f'{prefix}net.mapping_network.network.{idx}.weight']),
                         'b': _j(sd[f'{prefix}net.mapping_network.network.{idx}.bias'])})
        params['mapping'] = {
            'lins': lins,
            'last': {'w': _j(sd[f'{prefix}net.mapping_network.network.6.weight']),
                     'b': _j(sd[f'{prefix}net.mapping_network.network.6.bias'])}}
    if cfg.hierarchical_pose:
        params['pose_encoder'] = convert_pose_encoder(
            sd, f'{prefix}pose_encoder.')
    return params


def convert_wn_mlp(sd, prefix, n_layers):
    """Weight-normed `lin{l}` layers -> list of {'v','g','b'}."""
    layers = []
    for l in range(n_layers):
        if f'{prefix}lin{l}.weight_v' in sd:
            layers.append({'v': _j(sd[f'{prefix}lin{l}.weight_v']),
                           'g': _j(sd[f'{prefix}lin{l}.weight_g']).reshape(-1, 1),
                           'b': _j(sd[f'{prefix}lin{l}.bias'])})
        else:
            layers.append({'w': _j(sd[f'{prefix}lin{l}.weight']),
                           'b': _j(sd[f'{prefix}lin{l}.bias'])})
    return layers


def convert_model_state_dict(sd: Mapping[str, np.ndarray], cfg: ModelConfig,
                             latent: bool = True):
    """Full ARAH checkpoint (`model.`-stripped state dict) -> params pytree."""
    params = {
        'hypernet': convert_hypernet(sd, cfg.hypernet, 'sdf_decoder.'),
        'skinning': {'layers': convert_wn_mlp(
            sd, 'skinning_model.skinning_decoder_fwd.',
            cfg.skinning.n_layers + 1)},
        'color': {'layers': convert_wn_mlp(
            sd, 'color_decoder.', cfg.color.n_layers + 1)},
        'deviation': {'variance': _j(sd['deviation_decoder.variance']
                                     ).reshape(())},
    }
    if cfg.color.pose_encoder == 'leap':
        params['color']['pose_encoder'] = convert_pose_encoder(
            sd, 'color_decoder.pose_encoder.')
    if latent and 'latent.weight' in sd:
        params['latent'] = _j(sd['latent.weight'])
    if 'cam_rots' in sd:
        params['cam_rots'] = _j(sd['cam_rots'])
        params['cam_trans'] = _j(sd['cam_trans'])
    return params


def load_metaavatar_hypo_init(sd: Mapping[str, np.ndarray],
                              cfg: HypernetConfig):
    """Pretrained MetaAvatar ckpt -> frozen `hypo_init` vectors.

    Mirrors `hyperlayers.py:315-342`: for SIREN layer i the init vector is
    [decoder.net.net.{i}.0.weight.ravel(); decoder.net.net.{i}.0.bias].
    """
    dims = siren_layer_dims(cfg)
    out = []
    for i in range(len(dims)):
        w = np.asarray(sd[f'decoder.net.net.{i}.0.weight']).reshape(-1)
        b = np.asarray(sd[f'decoder.net.net.{i}.0.bias']).reshape(-1)
        out.append(_j(np.concatenate([w, b])))
    return out


def load_snarf_skinning(sd: Mapping[str, np.ndarray], n_layers: int):
    """Pretrained SNARF fwd-skinning ckpt -> skinning params
    (mirrors `metaavatar_render/config.py:77-89`)."""
    stripped = strip_prefix(sd, 'skinning_decoder_fwd.')
    return {'layers': convert_wn_mlp(stripped, '', n_layers + 1)}


def load_torch_checkpoint(path: str):
    """Load a torch .pt/.ckpt into numpy dicts without importing torch
    eagerly (torch is only needed here, not on the training path)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    for key in ('state_dict', 'model'):
        if key in ckpt:
            return {k: v.numpy() if hasattr(v, 'numpy') else v
                    for k, v in ckpt[key].items()}
    return {k: v.numpy() if hasattr(v, 'numpy') else v
            for k, v in ckpt.items()}


# ----------------------------- Orbax save/load -----------------------------

def save_checkpoint(ckpt_dir: str, step: int, state):
    """Save a train state pytree with Orbax (async-safe, atomic)."""
    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), f'step_{step:08d}')
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # update 'last' pointer (process 0 only in multi-process runtimes)
    import jax
    if jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, 'LAST'), 'w') as f:
            f.write(str(step))
    return path


def latest_step(ckpt_dir: str):
    p = os.path.join(ckpt_dir, 'LAST')
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def restore_checkpoint(ckpt_dir: str, target, step: int | None = None):
    """Restore into `target` (usually a TrainState). Also accepts
    params-only checkpoints ({'params': ...}, what convert_checkpoint.py
    writes from reference torch ckpts): the params leaf restores into
    target.params and the optimizer state / step keep their init values
    — so `validate.py`/`test.py` run converted reference checkpoints
    with zero extra glue (tests/test_convert_cli.py)."""
    import orbax.checkpoint as ocp
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            return None, None
    path = os.path.join(os.path.abspath(ckpt_dir), f'step_{step:08d}')
    ckptr = ocp.StandardCheckpointer()
    params_only = False
    try:
        md = ckptr.metadata(path)
        tree = getattr(md, 'item_metadata', None) or md
        keys = set(tree.keys()) if hasattr(tree, 'keys') else None
        params_only = keys == {'params'}
    except Exception:
        pass
    if params_only and hasattr(target, 'params'):
        restored = ckptr.restore(path, {'params': target.params})
        return target._replace(params=restored['params']), step
    state = ckptr.restore(path, target)
    return state, step
