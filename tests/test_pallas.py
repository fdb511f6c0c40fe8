"""Pallas kernel correctness tests (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from arah_tpu.nn.hypernet import (HypernetConfig, hypernet_cond,
                                  hypernet_generate, init_hypernet)
from arah_tpu.nn.siren import siren_apply
from arah_tpu.ops.knn import nn_idx
from arah_tpu.ops.pallas.knn_kernel import nn_idx_pallas
from arah_tpu.ops.pallas.siren_kernel import siren_sdf_pallas


class TestSirenKernel:
    def test_matches_reference_apply(self, rng):
        cfg = HypernetConfig()
        params = init_hypernet(jax.random.PRNGKey(0), cfg)
        cond = hypernet_cond(
            params, cfg,
            jnp.asarray(rng.randn(1, 24, 9).astype(np.float32)),
            jnp.asarray(rng.randn(1, 24, 3).astype(np.float32)))[0]
        gen = hypernet_generate(params, cfg, cond,
                                jnp.asarray(rng.randn(128).astype(
                                    np.float32)))
        x = jnp.asarray(rng.randn(2048, 3).astype(np.float32))
        ref = siren_apply(gen, x)
        out = siren_sdf_pallas(gen, x, tile=512)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_no_film(self, rng):
        cfg = HypernetConfig(use_film=False, hidden_features=128,
                             num_hidden_layers=3)
        params = init_hypernet(jax.random.PRNGKey(1), cfg)
        cond = hypernet_cond(
            params, cfg,
            jnp.asarray(rng.randn(1, 24, 9).astype(np.float32)),
            jnp.asarray(rng.randn(1, 24, 3).astype(np.float32)))[0]
        gen = hypernet_generate(params, cfg, cond, None)
        x = jnp.asarray(rng.randn(1024, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(siren_sdf_pallas(gen, x, tile=256)),
            np.asarray(siren_apply(gen, x)), atol=1e-5)


class TestKnnKernel:
    def test_matches_xla_knn(self, rng):
        pts = jnp.asarray(rng.randn(2048, 3).astype(np.float32))
        verts = jnp.asarray(rng.randn(1500, 3).astype(np.float32))
        ref = nn_idx(pts, verts)
        out = nn_idx_pallas(pts, verts, tile=512, v_tile=512)
        # ties can differ; compare distances instead of raw indices
        d_ref = np.linalg.norm(np.asarray(pts) - np.asarray(verts)[ref],
                               axis=-1)
        d_out = np.linalg.norm(
            np.asarray(pts) - np.asarray(verts)[np.asarray(out)], axis=-1)
        np.testing.assert_allclose(d_out, d_ref, atol=1e-5)
