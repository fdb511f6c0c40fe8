"""Real-LPIPS code-path tests with FABRICATED weights.

The sandbox has no torchvision/lpips checkpoints and no egress, so the
calibrated VGG16 weights can't exist here — but the *code path* that will
consume them (`load_lpips_params` -> `lpips_distance`) must be correct
the day they drop in (reference semantics:
`/root/reference/im2mesh/utils/eval.py:20-30` metric,
`renderer/loss.py:62-84` patch loss). These tests drive it with small
random weights against an independent torch oracle that re-implements
the published LPIPS(VGG) pipeline, plus the metric_key()/loss-plumbing
flip that must happen with zero code changes once weights exist.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arah_tpu.utils.lpips_jax import (LPIPS_TAPS, VGG16_CFG,
                                      load_lpips_params, lpips_distance,
                                      metric_key, weights_path)

torch = pytest.importorskip('torch')


def _fabricate_weights(rng, scale=0.3):
    """Random VGG16-shaped conv stacks + nonneg linear heads (torch
    layouts, exactly what convert_lpips_weights writes)."""
    out = {}
    ci = 0
    c_in = 3
    tap_channels = []
    for v in VGG16_CFG:
        if v == 'M':
            continue
        out[f'conv{ci}_w'] = (rng.randn(v, c_in, 3, 3) * scale
                              / np.sqrt(c_in * 9)).astype(np.float32)
        out[f'conv{ci}_b'] = (rng.randn(v) * 0.01).astype(np.float32)
        if ci in LPIPS_TAPS:
            tap_channels.append(v)
        c_in = v
        ci += 1
    for i, c in enumerate(tap_channels):
        out[f'lin{i}'] = np.abs(rng.randn(c)).astype(np.float32)
    return out


def _torch_oracle(d, a_np, b_np):
    """Independent LPIPS(VGG) pipeline in torch (NCHW), mirroring the
    published lpips package: [0,1] -> [-1,1] -> scaling layer -> VGG16
    relu taps -> unit-normalize channels -> squared diff -> 1x1 nonneg
    lin -> spatial mean -> sum over layers."""
    import torch.nn.functional as F
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)

    def feats(x):
        x = 2.0 * x - 1.0
        x = (x - shift) / scale
        taps = []
        ci = 0
        for v in VGG16_CFG:
            if v == 'M':
                x = F.max_pool2d(x, 2, 2)
            else:
                x = F.relu(F.conv2d(x, torch.from_numpy(d[f'conv{ci}_w']),
                                    torch.from_numpy(d[f'conv{ci}_b']),
                                    padding=1))
                if ci in LPIPS_TAPS:
                    taps.append(x)
                ci += 1
        return taps

    a = torch.from_numpy(a_np).permute(0, 3, 1, 2)
    b = torch.from_numpy(b_np).permute(0, 3, 1, 2)
    total = torch.zeros(a.shape[0])
    for i, (xa, xb) in enumerate(zip(feats(a), feats(b))):
        na = xa / torch.sqrt((xa * xa).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb * xb).sum(1, keepdim=True) + 1e-10)
        lin = torch.from_numpy(d[f'lin{i}']).view(1, -1, 1, 1)
        total = total + ((na - nb) ** 2 * lin).sum(1).mean((1, 2))
    return total.numpy()


class TestLpipsPath:
    def test_distance_matches_torch_oracle(self, rng, tmp_path):
        d = _fabricate_weights(rng)
        path = str(tmp_path / 'lpips_vgg.npz')
        np.savez(path, **d)
        params = load_lpips_params(path)
        a = rng.rand(2, 32, 32, 3).astype(np.float32)
        b = rng.rand(2, 32, 32, 3).astype(np.float32)
        got = np.asarray(lpips_distance(params, jnp.asarray(a),
                                        jnp.asarray(b)))
        want = _torch_oracle(d, a, b)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
        # identical inputs -> exactly zero distance
        same = np.asarray(lpips_distance(params, jnp.asarray(a),
                                         jnp.asarray(a)))
        np.testing.assert_allclose(same, 0.0, atol=1e-7)

    def test_metric_key_and_loss_flip_on_weights(self, rng, tmp_path,
                                                 monkeypatch):
        """The day real weights drop in (ARAH_LPIPS_WEIGHTS or the
        default path), metric_key() flips to 'lpips' and the training
        perceptual loss uses the real differentiable pipeline — with
        zero code changes."""
        from arah_tpu.utils.lpips_jax import make_perceptual_loss
        assert metric_key() == 'lpips_proxy_msdssim'
        path = str(tmp_path / 'w.npz')
        np.savez(path, **_fabricate_weights(rng))
        monkeypatch.setenv('ARAH_LPIPS_WEIGHTS', path)
        assert weights_path() == path
        assert metric_key() == 'lpips'
        loss_fn = make_perceptual_loss()
        a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        b = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
        val, grad = jax.value_and_grad(
            lambda x: loss_fn(x, b))(a)
        assert float(val) > 0.0
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).max()) > 0.0

    def test_converter_roundtrip_if_torchvision(self, tmp_path):
        """Full converter round-trip — skipped in this image (no
        torchvision/lpips), runs wherever they exist. Other tests stub
        torchvision/lpips into sys.modules for the reference imports, so
        importorskip alone isn't enough — verify the real attributes."""
        tv = pytest.importorskip('torchvision')
        lp = pytest.importorskip('lpips')
        if not hasattr(getattr(tv, 'models', None), 'vgg16') \
                or not hasattr(getattr(lp, 'LPIPS', None), '__call__') \
                or getattr(lp, 'LPIPS', None) is object:
            pytest.skip('torchvision/lpips are test stubs, not the '
                        'real packages')
        from arah_tpu.utils.lpips_jax import convert_lpips_weights
        path = str(tmp_path / 'real.npz')
        convert_lpips_weights(path)
        params = load_lpips_params(path)
        assert len(params['convs']) == 13 and len(params['lins']) == 5
