"""Hypernetwork that emits per-frame SIREN SDF weights from body pose.

Functional re-design of the reference hypernetwork stack
(`im2mesh/hyperlayers.py:107-510`, `siren_modules.py:247-316`):

  pose (24x9 rots, 24x3 Jtrs)
    -> HierarchicalPoseEncoder -> 144-d cond
    -> per-SIREN-layer hyper-MLP (144 -> 256 -> 256 -> in*out+out,
       LayerNorm+ReLU hidden, zero-init last layer, + frozen
       `hypo_params_init` from a pretrained MetaAvatar checkpoint)
    -> GeneratedMLP weights
  latent (128-d, optional FiLM)
    -> CustomMappingNetwork -> per-layer (freq, phase)

On TPU this runs once per frame (a handful of small matmuls) and the
generated weights are passed to the point-evaluation kernels as operands.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from arah_tpu.nn.layers import init_linear, linear
from arah_tpu.nn.pose_encoder import init_pose_encoder, pose_encoder_apply
from arah_tpu.nn.siren import GeneratedMLP


# -------------------------- FCLayer / FCBlock ------------------------------
# reference pytorch_prototyping.FCBlock: FCLayer = Linear + LayerNorm + ReLU.

def init_layer_norm(dim: int):
    return {'gamma': jnp.ones((dim,)), 'beta': jnp.zeros((dim,))}


def layer_norm(params, x, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params['gamma'] + params['beta']


def init_fc_block(key, in_features, hidden, num_hidden_layers, out_features,
                  zero_last: bool = False):
    """[FCLayer(in->h), FCLayer(h->h) x num_hidden_layers, Linear(h->out)].

    All linear weights kaiming_relu-init (ref FCBlock.init_weights); the
    final linear may be zero-init (`hyperlayers.py:418-423,451`).
    """
    n = num_hidden_layers + 2
    keys = jax.random.split(key, n)
    layers = []
    d = in_features
    for i in range(num_hidden_layers + 1):
        layers.append({'lin': init_linear(keys[i], d, hidden, 'kaiming_relu'),
                       'ln': init_layer_norm(hidden)})
        d = hidden
    last = init_linear(keys[-1], d, out_features,
                       'zeros' if zero_last else 'kaiming_relu')
    return {'hidden': layers, 'last': last}


def fc_block_apply(params, x):
    for lyr in params['hidden']:
        x = jax.nn.relu(layer_norm(lyr['ln'], linear(lyr['lin'], x)))
    return linear(params['last'], x)


# ------------------------- FiLM mapping network ----------------------------

def init_mapping_network(key, z_dim=128, hidden=256, out_dim=None,
                         pretrained_siren: bool = True):
    """CustomMappingNetwork (`hyperlayers.py:107-139`): 4 linears with
    LeakyReLU(0.2); last layer zero-weight, bias = [1...1, 0...0] so the
    initial FiLM is the identity (freq=1, phase=0)."""
    keys = jax.random.split(key, 4)
    lins = [init_linear(keys[0], z_dim, hidden, 'kaiming_leaky02'),
            init_linear(keys[1], hidden, hidden, 'kaiming_leaky02'),
            init_linear(keys[2], hidden, hidden, 'kaiming_leaky02')]
    last = init_linear(keys[3], hidden, out_dim, 'kaiming_leaky02')
    if pretrained_siren:
        b = jnp.concatenate([jnp.ones((out_dim // 2,)),
                             jnp.zeros((out_dim - out_dim // 2,))])
        last = {'w': jnp.zeros_like(last['w']), 'b': b}
    else:
        last = {'w': last['w'] * 0.25, 'b': last['b']}
    return {'lins': lins, 'last': last}


def mapping_network_apply(params, z):
    x = z
    for lin in params['lins']:
        x = jax.nn.leaky_relu(linear(lin, x), negative_slope=0.2)
    out = linear(params['last'], x)
    half = out.shape[-1] // 2
    return out[..., :half], out[..., half:]   # freqs, phase_shifts


# ----------------------------- HyperFC -------------------------------------

class HypernetConfig(NamedTuple):
    in_features: int = 3
    out_features: int = 1
    hidden_features: int = 256
    num_hidden_layers: int = 5   # SIREN hidden layers (total L = nhl + 2)
    hyper_in_ch: int = 144       # pose-encoder output dim
    hyper_hidden_ch: int = 256
    hyper_num_hidden_layers: int = 1
    use_film: bool = True
    hierarchical_pose: bool = True
    rel_joints: bool = False
    latent_dim: int = 128


def siren_layer_dims(cfg: HypernetConfig):
    dims = [(cfg.in_features, cfg.hidden_features)]
    for _ in range(cfg.num_hidden_layers):
        dims.append((cfg.hidden_features, cfg.hidden_features))
    dims.append((cfg.hidden_features, cfg.out_features))
    return dims


def init_hypernet(key, cfg: HypernetConfig):
    """Build hypernet params. `hypo_init` entries are the frozen base SIREN
    weights the hypernetwork emits residuals against: in the reference they
    come from a pretrained MetaAvatar checkpoint (`hyperlayers.py:315-342`,
    loaded here by train/checkpoints.py); absent one we default to a proper
    sine-initialized SIREN (the reference's zero default leaves the
    generated net degenerate — it is unusable without the checkpoint)."""
    dims = siren_layer_dims(cfg)
    keys = jax.random.split(key, len(dims) + 2)
    hyper_layers = []
    hypo_init = []
    for i, (d_in, d_out) in enumerate(dims):
        hyper_layers.append(init_fc_block(
            keys[i], cfg.hyper_in_ch, cfg.hyper_hidden_ch,
            cfg.hyper_num_hidden_layers, d_in * d_out + d_out,
            zero_last=True))
        base = init_linear(jax.random.fold_in(keys[i], 7), d_in, d_out,
                           'sine_first' if i == 0 else 'sine')
        hypo_init.append(jnp.concatenate(
            [base['w'].reshape(-1), base['b']]))
    params = {'hyper_layers': hyper_layers, 'hypo_init': hypo_init}
    if cfg.use_film:
        n_mod = (len(dims) - 1) * cfg.hidden_features
        params['mapping'] = init_mapping_network(
            keys[-2], cfg.latent_dim, 256, n_mod * 2, pretrained_siren=True)
    if cfg.hierarchical_pose:
        params['pose_encoder'] = init_pose_encoder(keys[-1])
    return params


def hypernet_cond(params, cfg: HypernetConfig, rots, Jtrs):
    """Pose conditioning vector (B, 144)."""
    return pose_encoder_apply(params['pose_encoder'], rots, Jtrs,
                              rel_joints=cfg.rel_joints)


def hypernet_generate(params, cfg: HypernetConfig, cond: jax.Array,
                      latent: jax.Array | None = None) -> GeneratedMLP:
    """Emit the SIREN weights for a single conditioning vector (144,).

    Ref `HyperFC.forward`/`HyperFCFiLM.forward` + `HyperLinear.forward`
    (`hyperlayers.py:270-285,356-365,453-466`): generated flat params are
    hypernet(cond) + hypo_params_init, split into (out, in) weight and
    (out,) bias.
    """
    dims = siren_layer_dims(cfg)
    weights, biases = [], []
    for i, (d_in, d_out) in enumerate(dims):
        flat = fc_block_apply(params['hyper_layers'][i], cond)
        flat = flat + params['hypo_init'][i]
        w = flat[..., :d_in * d_out].reshape(flat.shape[:-1] + (d_out, d_in))
        b = flat[..., d_in * d_out:d_in * d_out + d_out]
        weights.append(w)
        biases.append(b)

    freqs, phases = (), ()
    if cfg.use_film and latent is not None:
        f, p = mapping_network_apply(params['mapping'], latent)
        h = cfg.hidden_features
        n_mod_layers = len(dims) - 1
        freqs = tuple(f[..., i * h:(i + 1) * h] for i in range(n_mod_layers))
        phases = tuple(p[..., i * h:(i + 1) * h] for i in range(n_mod_layers))
    return GeneratedMLP(tuple(weights), tuple(biases), freqs, phases)


def hypernet_flat_params(gen: GeneratedMLP):
    """Per-layer flattened weight vectors (biases excluded), for the params
    L2 loss (ref `siren_modules.py:310-314`, `loss.py:108-112`)."""
    return [w.reshape(w.shape[:-2] + (-1,)) for w in gen.weights]
