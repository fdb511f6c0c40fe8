"""Bench-scene bootstrap (`arah_tpu/utils/bench_scene.py`).

The throughput benches render a *fitted* synthetic avatar so solver
early exits / surface sampling engage like they do for a trained model
(see module docstring; the reference always renders from pretrained
MetaAvatar/SNARF weights, `im2mesh/metaavatar_render/config.py:32-89`).
These tests check the capsule oracle itself and that the quick-fit
actually moves the generated SIREN toward it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arah_tpu.utils.bench_scene import (capsule_sdf_and_weights,
                                        capsule_segments_02v,
                                        pretrain_scene)


def _scene(small=True):
    import sys
    sys.path.insert(0, '.')
    from __graft_entry__ import _flagship_config, _build_scene
    cfg = _flagship_config(small=small)
    params, fd, inp = _build_scene(cfg, n_rays=8, pretrain=False)
    return cfg, params, fd, inp


def test_capsule_sdf_oracle():
    """Capsule-union SDF: exact distances for points straddling a single
    isolated capsule, and softmax weights sum to one."""
    seg_a = jnp.zeros((24, 3)).at[0].set(jnp.array([10.0, 0.0, 0.0]))
    seg_b = jnp.zeros((24, 3)).at[0].set(jnp.array([10.0, 1.0, 0.0]))
    r = 0.055
    # side of the isolated capsule's cylinder, axial middle
    x = jnp.array([[10.3, 0.5, 0.0],    # 0.3 from axis -> sdf 0.3 - r
                   [10.0, 1.2, 0.0]])   # 0.2 beyond endpoint -> 0.2 - r
    sdf, w = capsule_sdf_and_weights(x, seg_a, seg_b, radius=r)
    np.testing.assert_allclose(np.asarray(sdf), [0.3 - r, 0.2 - r],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-5)
    # nearest capsule dominates the softmax at temp=0.02
    assert np.asarray(w)[0, 0] > 0.9


def test_capsule_segments_match_body_scale():
    """Segments live inside the canonical coord bounds of the frame the
    synthetic body produced (same metric space as verts_cano)."""
    _, _, fd, _ = _scene()
    from arah_tpu.data.synthetic import synthetic_smpl
    model = synthetic_smpl(n_verts=256)
    betas = jnp.zeros((10,))
    a, b = capsule_segments_02v(model, betas)
    assert a.shape == (24, 3) and b.shape == (24, 3)
    lo = fd.frame.center + 1.5 * (fd.frame.coord_min - fd.frame.center)
    hi = fd.frame.center + 1.5 * (fd.frame.coord_max - fd.frame.center)
    assert bool(jnp.all((a >= lo) & (a <= hi)))


@pytest.mark.timeout(600)
def test_pretrain_fits_sdf_and_skinning():
    """A short fit run reduces the capsule-SDF regression loss and makes
    sphere tracing find the surface on rays aimed at the body."""
    cfg, params, fd, inp = _scene(small=True)
    from arah_tpu.data.synthetic import synthetic_smpl
    model = synthetic_smpl(n_verts=256)
    betas = jnp.zeros((10,))
    params2, losses = pretrain_scene(params, cfg, model, betas, fd,
                                     steps=120, batch=1024)
    losses = np.asarray(losses)
    assert losses[-10:].mean() < 0.5 * losses[:10].mean(), losses

    # the fitted SDF is negative at capsule centers, positive far away
    from arah_tpu.render.renderer import generate_sdf, make_sdf_fn
    from arah_tpu.render.ray_tracing import (normalize_canonical_points,
                                             sdf_to_metric)
    seg_a, seg_b = capsule_segments_02v(model, betas)
    mid = 0.5 * (seg_a + seg_b)
    far = fd.frame.center + jnp.asarray([0.0, 0.0, 0.0]) \
        + (fd.frame.coord_max - fd.frame.center) * 0.95
    pts = jnp.concatenate([mid, far[None]], axis=0)
    gen = generate_sdf(params2, cfg, fd.rots, fd.Jtrs, params2['latent'][0])
    x_norm = normalize_canonical_points(pts, fd.frame.coord_min,
                                        fd.frame.coord_max, fd.frame.center)
    s = sdf_to_metric(make_sdf_fn(gen)(x_norm), fd.frame.coord_min,
                      fd.frame.coord_max)
    s_true, _ = capsule_sdf_and_weights(pts, seg_a, seg_b)
    # same sign pattern as the oracle on a clear majority of probes
    agree = np.mean(np.sign(np.asarray(s)) == np.sign(np.asarray(s_true)))
    assert agree > 0.7, (np.asarray(s), np.asarray(s_true))
