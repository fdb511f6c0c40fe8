"""LPIPS perceptual distance in JAX (VGG16 backbone).

Re-implements the `lpips.LPIPS(net='vgg')` metric/loss the reference uses
(`lightning_model.py:125`, `loss.py:62-84`): ImageNet-normalized inputs,
VGG16 relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 features, unit-normalized
channels, learned 1x1 linear weights, spatial mean, sum over layers.

Weights ship separately (they're derived from torchvision + the LPIPS
release): run `convert_lpips_weights(...)` once on a machine that has the
torch checkpoints to produce `lpips_vgg.npz`. When the weight file is
missing, `get_default_lpips` falls back to a multi-scale SSIM proxy so the
pipeline stays runnable (clearly not LPIPS-calibrated; tracked as a gap).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

VGG16_CFG = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
             512, 512, 512, 'M', 512, 512, 512, 'M']
# indices (into conv list) after which LPIPS taps features
LPIPS_TAPS = (1, 3, 6, 9, 12)   # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


def _conv(x, w, b):
    # x: (N, H, W, C); w: (out, in, kh, kw) torch layout
    out = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out + b


def vgg16_features(params, x):
    """x: (N, H, W, 3) in [-1, 1] (LPIPS 'normalize=True' converts [0,1]
    inputs to [-1,1] first). Returns the 5 tapped feature maps."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    ci = 0
    for v in VGG16_CFG:
        if v == 'M':
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                'VALID')
        else:
            x = jax.nn.relu(_conv(x, params['convs'][ci]['w'],
                                  params['convs'][ci]['b']))
            if ci in LPIPS_TAPS:
                feats.append(x)
            ci += 1
    return feats


def lpips_distance(params, a, b):
    """a, b: (N, H, W, 3) in [0, 1]. Returns (N,) LPIPS distances."""
    a = 2.0 * a - 1.0
    b = 2.0 * b - 1.0
    fa = vgg16_features(params, a)
    fb = vgg16_features(params, b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / jnp.sqrt(jnp.sum(xa * xa, -1, keepdims=True) + 1e-10)
        nb = xb / jnp.sqrt(jnp.sum(xb * xb, -1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        lin = params['lins'][i]          # (C,) nonneg weights
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1), axis=(1, 2))
    return total


def load_lpips_params(path: str):
    d = np.load(path)
    n_convs = len([k for k in d.files if k.startswith('conv')]) // 2
    params = {
        'convs': [{'w': jnp.asarray(d[f'conv{i}_w']),
                   'b': jnp.asarray(d[f'conv{i}_b'])}
                  for i in range(n_convs)],
        'lins': [jnp.asarray(d[f'lin{i}']) for i in range(5)],
    }
    return params


def convert_lpips_weights(out_path: str):
    """One-time converter: torchvision VGG16 + lpips linear heads -> npz.
    Requires torchvision + lpips installed (not in this image)."""
    import torch
    import torchvision
    import lpips as lpips_torch
    vgg = torchvision.models.vgg16(weights='IMAGENET1K_V1').features
    heads = lpips_torch.LPIPS(net='vgg')
    out = {}
    ci = 0
    for m in vgg:
        if isinstance(m, torch.nn.Conv2d):
            out[f'conv{ci}_w'] = m.weight.detach().numpy()
            out[f'conv{ci}_b'] = m.bias.detach().numpy()
            ci += 1
    for i, lin in enumerate(heads.lins):
        out[f'lin{i}'] = lin.model[1].weight.detach().numpy().reshape(-1)
    np.savez(out_path, **out)


def weights_path() -> str:
    return os.environ.get(
        'ARAH_LPIPS_WEIGHTS',
        os.path.join(os.path.dirname(__file__), 'lpips_vgg.npz'))


def lpips_available() -> bool:
    """True when converted VGG16+linear-head weights exist on disk."""
    return os.path.exists(weights_path())


def metric_key() -> str:
    """Honest name for the reported perceptual metric: 'lpips' only when
    the real calibrated weights are loaded; otherwise the multi-scale
    DSSIM proxy is named as such so numbers are never mistaken for
    LPIPS (this sandbox has no torchvision/lpips checkpoints and no
    network egress — see convert_lpips_weights)."""
    return 'lpips' if lpips_available() else 'lpips_proxy_msdssim'


_WARNED = False


def _warn_proxy(context: str):
    global _WARNED
    if not _WARNED:
        import sys
        print(f'WARNING: LPIPS VGG weights not found at {weights_path()}; '
              f'{context} uses a multi-scale DSSIM proxy instead '
              '(reported as "lpips_proxy_msdssim", NOT comparable to '
              'published LPIPS numbers). Run convert_lpips_weights() on '
              'a machine with torchvision+lpips to fix.',
              file=sys.stderr, flush=True)
        _WARNED = True


def _ssim_nhwc(a, b, win: int = 7):
    """Differentiable uniform-window SSIM over (N, H, W, C) in [0, 1].
    Returns per-image mean SSIM (N,). Matches the standard constants
    (K1=0.01, K2=0.03, L=1); a uniform window stands in for skimage's
    default, which is what `utils/metrics.ssim` also uses."""
    def filt(x):
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                  (1, win, win, 1), (1, 1, 1, 1), 'VALID')
        return s / (win * win)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a * mu_a
    var_b = filt(b * b) - mu_b * mu_b
    cov = filt(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def msdssim(a, b):
    """Differentiable multi-scale structural dissimilarity for patch
    batches (N, H, W, 3) in [0, 1]: mean over scales of 1 - SSIM."""
    vals = []
    x, y = a, b
    for _ in range(3):
        if min(x.shape[1], x.shape[2]) < 8:
            break
        vals.append(1.0 - _ssim_nhwc(x, y))
        x = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                  (1, 2, 2, 1), (1, 2, 2, 1), 'VALID') / 4
        y = jax.lax.reduce_window(y, 0.0, jax.lax.add,
                                  (1, 2, 2, 1), (1, 2, 2, 1), 'VALID') / 4
    return jnp.mean(jnp.stack(vals), axis=0)


def make_perceptual_loss():
    """Differentiable patch perceptual loss for TRAINING:
    (pred (P,ps,ps,3), gt (P,ps,ps,3)) in [0,1] -> scalar mean distance.

    Real LPIPS (`loss.py:62-84` semantics: p_loss(pred, gt,
    normalize=True).mean()) when converted weights exist; otherwise the
    differentiable multi-scale DSSIM proxy with a loud warning."""
    if lpips_available():
        params = load_lpips_params(weights_path())
        return lambda p, g: jnp.mean(lpips_distance(params, p, g))
    _warn_proxy('the training perceptual loss')
    return lambda p, g: jnp.mean(msdssim(p, g))


_DEFAULT = None


def get_default_lpips():
    """LPIPS if weights are on disk, else a multi-scale DSSIM proxy
    (see metric_key() — callers must report the proxy under its own
    name, never as 'lpips')."""
    global _DEFAULT
    if _DEFAULT is not None:
        return _DEFAULT
    path = weights_path()
    if os.path.exists(path):
        params = load_lpips_params(path)
        fn = jax.jit(lambda a, b: lpips_distance(params, a, b))
        _DEFAULT = lambda a, b: float(np.mean(np.asarray(
            fn(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))))
    else:
        _warn_proxy('the eval perceptual metric')
        from arah_tpu.utils.metrics import ssim

        def proxy(a, b):
            a = np.asarray(a)[0]
            b = np.asarray(b)[0]
            vals = []
            for scale in (1, 2, 4):
                aa, bb = a[::scale, ::scale], b[::scale, ::scale]
                if min(aa.shape[:2]) >= 8:
                    vals.append(1.0 - ssim(aa, bb))
            return float(np.mean(vals)) if vals else 0.0
        _DEFAULT = proxy
    return _DEFAULT
