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

    def test_transposed_matches_xla_knn(self, rng):
        """(k, T) transposed KNN kernel (round 4, `use_pallas_knn`):
        points on lanes, min/argmin over sublanes."""
        from arah_tpu.ops.pallas.knn_kernel import nn_idx_pallas_t
        pts = jnp.asarray(rng.randn(4096, 3).astype(np.float32))
        verts = jnp.asarray(rng.randn(1500, 3).astype(np.float32))
        ref = np.asarray(nn_idx(pts, verts))
        out = np.asarray(nn_idx_pallas_t(pts, verts, tile=1024,
                                         v_tile=512))
        d_ref = np.linalg.norm(np.asarray(pts) - np.asarray(verts)[ref],
                               axis=-1)
        d_out = np.linalg.norm(np.asarray(pts) - np.asarray(verts)[out],
                               axis=-1)
        np.testing.assert_allclose(d_out, d_ref, atol=1e-5)


class TestCorrKernel:
    def test_matches_search_canonical_corr(self, rng):
        from arah_tpu.nn.skinning import SkinningConfig, init_skinning
        from arah_tpu.nn.layers import wn_linear
        from arah_tpu.render.ray_tracing import CanonicalFrame
        from arah_tpu.solver.root_find import (forward_skinning,
                                               search_canonical_corr)
        from arah_tpu.ops.pallas.corr_kernel import corr_search_pallas
        from arah_tpu.core.smpl import batch_rodrigues
        from arah_tpu.core.body import normalize_canonical_points

        cfg = SkinningConfig(d_hidden=128, n_layers=4)
        params = init_skinning(jax.random.PRNGKey(0), cfg)

        # articulated frame: small random bone transforms
        aa = (rng.randn(24, 3) * 0.15).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        tfs = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
        tfs[:, :3, :3] = R
        tfs[:, :3, 3] = (rng.randn(24, 3) * 0.05).astype(np.float32)
        frame = CanonicalFrame(
            bone_transforms=jnp.asarray(tfs), trans=jnp.zeros(3),
            coord_min=jnp.float32(-1.1), coord_max=jnp.float32(1.0),
            center=jnp.asarray(rng.randn(3).astype(np.float32) * 0.05))

        from arah_tpu.render.renderer import make_skin_fn
        skin_fn = make_skin_fn({'skinning': params},
                               type('C', (), {'skinning': cfg}))

        n = 512
        x_gt = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
        x_bar, T_gt = forward_skinning(skin_fn, frame, x_gt)
        x0 = x_gt + 0.03 * jnp.asarray(rng.randn(n, 3).astype(np.float32))
        x0n = normalize_canonical_points(x0, frame.coord_min,
                                         frame.coord_max, frame.center)
        w0 = skin_fn(x0n)
        T0 = jnp.einsum('nj,jab->nab', w0, frame.bone_transforms)
        mask = jnp.asarray(rng.rand(n) > 0.1)

        ref = search_canonical_corr(skin_fn, frame, x_bar, x0,
                                    T0, active_init=mask)

        # collapse weight norm to dense transposed weights
        wts, bs = [], []
        for lyr in params['layers']:
            v = lyr['v']
            w = lyr['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
            wts.append(w.T)
            bs.append(lyr['b'])
        x_hat, T16, valid = corr_search_pallas(
            x_bar, x0, T0.reshape(n, 16), mask, wts, bs,
            frame.bone_transforms.reshape(24, 16),
            frame.coord_min, frame.coord_max, frame.center, tile=256)

        v_ref = np.asarray(ref.valid)
        v_ker = np.asarray(valid)
        agree = (v_ref == v_ker).mean()
        assert agree > 0.98, agree
        both = v_ref & v_ker
        assert both.mean() > 0.8
        np.testing.assert_allclose(np.asarray(x_hat)[both],
                                   np.asarray(ref.x_hat)[both], atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(T16).reshape(n, 4, 4)[both],
            np.asarray(ref.T_fwd)[both], atol=5e-4)
        # masked-out points frozen at init
        off = ~np.asarray(mask)
        np.testing.assert_allclose(np.asarray(x_hat)[off],
                                   np.asarray(x0)[off], atol=1e-6)


class TestCorrKernelTransposed:
    def test_matches_search_canonical_corr(self, rng):
        """(k, T) transposed-layout kernel vs the XLA solver (same harness
        as TestCorrKernel)."""
        from arah_tpu.nn.skinning import SkinningConfig, init_skinning
        from arah_tpu.render.ray_tracing import CanonicalFrame
        from arah_tpu.solver.root_find import (forward_skinning,
                                               search_canonical_corr)
        from arah_tpu.ops.pallas.corr_kernel_t import corr_search_pallas_t
        from arah_tpu.core.smpl import batch_rodrigues
        from arah_tpu.core.body import normalize_canonical_points
        from arah_tpu.render.renderer import make_skin_fn

        cfg = SkinningConfig(d_hidden=128, n_layers=4)
        params = init_skinning(jax.random.PRNGKey(0), cfg)

        aa = (rng.randn(24, 3) * 0.15).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        tfs = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
        tfs[:, :3, :3] = R
        tfs[:, :3, 3] = (rng.randn(24, 3) * 0.05).astype(np.float32)
        frame = CanonicalFrame(
            bone_transforms=jnp.asarray(tfs), trans=jnp.zeros(3),
            coord_min=jnp.float32(-1.1), coord_max=jnp.float32(1.0),
            center=jnp.asarray(rng.randn(3).astype(np.float32) * 0.05))

        skin_fn = make_skin_fn({'skinning': params},
                               type('C', (), {'skinning': cfg}))

        n = 512
        x_gt = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
        x_bar, T_gt = forward_skinning(skin_fn, frame, x_gt)
        x0 = x_gt + 0.03 * jnp.asarray(rng.randn(n, 3).astype(np.float32))
        x0n = normalize_canonical_points(x0, frame.coord_min,
                                         frame.coord_max, frame.center)
        w0 = skin_fn(x0n)
        T0 = jnp.einsum('nj,jab->nab', w0, frame.bone_transforms)
        mask = jnp.asarray(rng.rand(n) > 0.1)

        ref = search_canonical_corr(skin_fn, frame, x_bar, x0,
                                    T0, active_init=mask)

        # collapse weight norm to dense (out, in) weights
        wts, bs = [], []
        for lyr in params['layers']:
            v = lyr['v']
            w = lyr['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
            wts.append(w)
            bs.append(lyr['b'])
        x_hat, T16, valid, _ = corr_search_pallas_t(
            x_bar, x0, T0.reshape(n, 16), mask, wts, bs,
            frame.bone_transforms.reshape(24, 16),
            frame.coord_min, frame.coord_max, frame.center, tile=256)

        v_ref = np.asarray(ref.valid)
        v_ker = np.asarray(valid)
        agree = (v_ref == v_ker).mean()
        assert agree > 0.98, agree
        both = v_ref & v_ker
        assert both.mean() > 0.8
        np.testing.assert_allclose(np.asarray(x_hat)[both],
                                   np.asarray(ref.x_hat)[both], atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(T16).reshape(n, 4, 4)[both],
            np.asarray(ref.T_fwd)[both], atol=5e-4)
        off = ~np.asarray(mask)
        np.testing.assert_allclose(np.asarray(x_hat)[off],
                                   np.asarray(x0)[off], atol=1e-6)

    def test_want_jac_matches_exact_jacobian(self, rng):
        """want_jac=True: the kernel's in-kernel-jvp Jacobian at the
        returned roots must equal forward_skinning_jac there (it feeds
        the renderer's implicit-diff correction, renderer.py
        idiff_kernel_jac)."""
        from arah_tpu.nn.skinning import SkinningConfig, init_skinning
        from arah_tpu.render.ray_tracing import CanonicalFrame
        from arah_tpu.solver.root_find import (forward_skinning,
                                               forward_skinning_jac)
        from arah_tpu.ops.pallas.corr_kernel_t import corr_search_pallas_t
        from arah_tpu.core.smpl import batch_rodrigues
        from arah_tpu.core.body import normalize_canonical_points
        from arah_tpu.render.renderer import make_skin_fn

        cfg = SkinningConfig(d_hidden=64, n_layers=3)
        params = init_skinning(jax.random.PRNGKey(0), cfg)
        aa = (rng.randn(24, 3) * 0.15).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        tfs = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
        tfs[:, :3, :3] = R
        tfs[:, :3, 3] = (rng.randn(24, 3) * 0.05).astype(np.float32)
        frame = CanonicalFrame(
            bone_transforms=jnp.asarray(tfs), trans=jnp.zeros(3),
            coord_min=jnp.float32(-1.1), coord_max=jnp.float32(1.0),
            center=jnp.asarray(rng.randn(3).astype(np.float32) * 0.05))
        skin_fn = make_skin_fn({'skinning': params},
                               type('C', (), {'skinning': cfg}))
        n = 256
        x_gt = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
        x_bar, _ = forward_skinning(skin_fn, frame, x_gt)
        x0 = x_gt + 0.03 * jnp.asarray(rng.randn(n, 3).astype(np.float32))
        x0n = normalize_canonical_points(x0, frame.coord_min,
                                         frame.coord_max, frame.center)
        T0 = jnp.einsum('nj,jab->nab', skin_fn(x0n),
                        frame.bone_transforms)
        wts, bs = [], []
        for lyr in params['layers']:
            v = lyr['v']
            w = lyr['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
            wts.append(w)
            bs.append(lyr['b'])
        x_hat, _, valid, _, jac = corr_search_pallas_t(
            x_bar, x0, T0.reshape(n, 16), jnp.ones((n,), bool), wts, bs,
            frame.bone_transforms.reshape(24, 16),
            frame.coord_min, frame.coord_max, frame.center, tile=256,
            want_jac=True)
        J_ref = forward_skinning_jac(skin_fn, frame, x_hat)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(J_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_bf16_precision_relaxed_threshold(self, rng):
        """precision='bf16' (single-pass bf16 matmuls, f32 accum) pins
        the ROADMAP-3 contract: hidden-activation rounding floors the
        residual at ~1e-3, so it only converges under a relaxed
        cvg_thresh and agrees with f32 roots to ~2e-3. Speed verdict
        lives in PERF.md (kernel is VPU-bound); this test keeps the
        option compiling and semantically honest."""
        from arah_tpu.nn.skinning import SkinningConfig, init_skinning
        from arah_tpu.ops.pallas.corr_kernel_t import corr_search_pallas_t

        cfg = SkinningConfig(d_hidden=128, n_layers=4)
        params = init_skinning(jax.random.PRNGKey(0), cfg)
        wts, bs = [], []
        for lyr in params['layers']:
            v = lyr['v']
            w = lyr['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
            wts.append(w)
            bs.append(lyr['b'])

        n = 256
        x_bar = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
        x0 = x_bar + 0.01 * jnp.asarray(rng.randn(n, 3).astype(np.float32))
        T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32).reshape(1, 16), (n, 1))
        mask = jnp.ones((n,), bool)
        bones16 = jnp.tile(jnp.eye(4, dtype=jnp.float32).reshape(1, 16),
                           (24, 1))
        common = (x_bar, x0, T0, mask, tuple(wts), tuple(bs), bones16,
                  jnp.float32(-1.1), jnp.float32(1.0), jnp.zeros(3))
        x_f32, _, v_f32, _ = corr_search_pallas_t(
            *common, tile=256, max_steps=20, precision='f32')
        x_b16, _, v_b16, _ = corr_search_pallas_t(
            *common, tile=256, max_steps=20, precision='bf16',
            cvg_thresh=5e-3)
        # relaxed threshold: bf16 must still converge broadly
        assert np.asarray(v_b16).mean() > 0.95
        both = np.asarray(v_f32) & np.asarray(v_b16)
        assert both.mean() > 0.8
        d = np.abs(np.asarray(x_b16) - np.asarray(x_f32))[both].max()
        assert d < 5e-3, d


def test_skinning_dense_params_collapse(rng):
    """Dense collapse must reproduce wn_linear layer-by-layer, and reject
    kernel-incompatible architectures."""
    from arah_tpu.nn.skinning import SkinningConfig, init_skinning
    from arah_tpu.nn.layers import wn_linear
    from arah_tpu.ops.pallas.corr_kernel_t import skinning_dense_params

    cfg = SkinningConfig()
    params = init_skinning(jax.random.PRNGKey(3), cfg)
    wts, bs = skinning_dense_params(params, cfg)
    x = jnp.asarray(rng.randn(16, 3).astype(np.float32))
    h = x
    for lyr, w, b in zip(params['layers'], wts, bs):
        np.testing.assert_allclose(np.asarray(h @ w.T + b),
                                   np.asarray(wn_linear(lyr, h)), atol=1e-6)
        h = wn_linear(lyr, h)

    assert skinning_dense_params(params, cfg._replace(multires=2)) is None
    assert skinning_dense_params(params, cfg._replace(d_out=24)) is None
    assert skinning_dense_params(params, cfg._replace(skip_in=(2,))) is None


class TestMarchKernel:
    def test_matches_xla_march(self, rng):
        """Fused march kernel vs the XLA while_loop march on a synthetic
        body + generated SIREN."""
        from arah_tpu.core.rays import ray_aabb
        from arah_tpu.data.synthetic import synthetic_smpl
        from arah_tpu.model import init_model_params, prepare_frame
        from arah_tpu.render.ray_tracing import (RayTracerConfig, SmplRef,
                                                 _march_xla)
        from arah_tpu.render.renderer import generate_sdf, make_sdf_fn
        from arah_tpu.ops.pallas.march_kernel import sphere_march_pallas
        from test_renderer import small_config

        cfg = small_config()
        model = synthetic_smpl(n_verts=460)
        params = init_model_params(jax.random.PRNGKey(0), cfg,
                                   n_latent_frames=2)
        pose = jnp.asarray((rng.randn(72) * 0.2).astype(np.float32))
        betas = jnp.asarray((rng.randn(10) * 0.3).astype(np.float32))
        fd = prepare_frame(model, betas, pose,
                           jnp.asarray([0.1, 0.0, 0.2], jnp.float32))
        gen = generate_sdf(params, cfg, fd.rots, fd.Jtrs,
                           params['latent'][0])
        sdf_fn = make_sdf_fn(gen, stop_grad=False)

        n = 256
        cam = jnp.asarray([0.0, 0.3, -2.5])
        tgt = rng.randint(0, 460, n)
        dirs = fd.smpl.verts_posed[tgt] - cam
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        cam_b = jnp.broadcast_to(cam, dirs.shape)
        near, far, hit = ray_aabb(fd.bounds_min, fd.bounds_max, cam_b, dirs)

        tcfg = RayTracerConfig(sphere_tracing_iters=20)
        ref = _march_xla(tcfg, sdf_fn, fd.frame, fd.smpl, cam_b, dirs,
                         near, far)
        t, unf, div, x_norm, T16 = sphere_march_pallas(
            cam_b, dirs, near, far, fd.smpl.verts_posed,
            fd.smpl.skinning_weights,
            fd.frame.bone_transforms.reshape(24, 16),
            list(gen.weights), list(gen.biases), list(gen.freqs),
            list(gen.phases), fd.frame.coord_min, fd.frame.coord_max,
            fd.frame.center, fd.frame.trans, tile=128, n_iters=20,
            thresh=tcfg.root_finding_threshold,
            clamp_dist=tcfg.clamp_dist)

        agree_unf = (np.asarray(ref.unfinished) == np.asarray(unf)).mean()
        agree_div = (np.asarray(ref.diverged) == np.asarray(div)).mean()
        assert agree_unf > 0.98, agree_unf
        assert agree_div > 0.98, agree_div
        both = ~np.asarray(ref.unfinished) & ~np.asarray(unf) \
            & ~np.asarray(ref.diverged) & ~np.asarray(div)
        # random-init SIREN: only a minority of rays converge
        assert both.mean() > 0.1, both.mean()
        np.testing.assert_allclose(np.asarray(t)[both],
                                   np.asarray(ref.t)[both], atol=1e-3)
        np.testing.assert_allclose(np.asarray(x_norm)[both],
                                   np.asarray(ref.x_norm)[both], atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(T16).reshape(-1, 4, 4)[both],
            np.asarray(ref.T_fwd)[both], atol=5e-3)


class TestIsoKernel:
    def test_matches_search_iso_surface_depth(self, rng):
        """Fused 4D iso-surface Broyden vs the XLA solver."""
        from arah_tpu.core.rays import ray_aabb
        from arah_tpu.data.synthetic import synthetic_smpl
        from arah_tpu.model import init_model_params, prepare_frame
        from arah_tpu.render.ray_tracing import RayTracerConfig, _march_xla
        from arah_tpu.render.renderer import (generate_sdf, make_sdf_fn,
                                              make_skin_fn)
        from arah_tpu.solver.root_find import (iso_init_inv_jacobian,
                                               search_iso_surface_depth)
        from arah_tpu.core.body import unnormalize_canonical_points
        from arah_tpu.ops.pallas.iso_kernel import iso_refine_pallas
        from arah_tpu.ops.pallas.corr_kernel_t import skinning_dense_params
        from test_renderer import small_config

        cfg = small_config()
        model = synthetic_smpl(n_verts=460)
        params = init_model_params(jax.random.PRNGKey(0), cfg,
                                   n_latent_frames=2)
        pose = jnp.asarray((rng.randn(72) * 0.2).astype(np.float32))
        betas = jnp.asarray((rng.randn(10) * 0.3).astype(np.float32))
        fd = prepare_frame(model, betas, pose,
                           jnp.asarray([0.1, 0.0, 0.2], jnp.float32))
        gen = generate_sdf(params, cfg, fd.rots, fd.Jtrs,
                           params['latent'][0])
        sdf_fn = make_sdf_fn(gen)
        skin_fn = make_skin_fn(params, cfg)

        n = 256
        cam = jnp.asarray([0.0, 0.3, -2.5])
        tgt = rng.randint(0, 460, n)
        dirs = fd.smpl.verts_posed[tgt] - cam
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        cam_b = jnp.broadcast_to(cam, dirs.shape)
        near, far, hit = ray_aabb(fd.bounds_min, fd.bounds_max, cam_b, dirs)

        tcfg = RayTracerConfig(sphere_tracing_iters=12, iso_max_steps=20)
        c = _march_xla(tcfg, sdf_fn, fd.frame, fd.smpl, cam_b, dirs,
                       near, far)
        x_hat = unnormalize_canonical_points(
            c.x_norm, fd.frame.coord_min, fd.frame.coord_max,
            fd.frame.center)
        valid = ~c.diverged

        ref = search_iso_surface_depth(
            sdf_fn, skin_fn, fd.frame, cam_b, dirs, valid, x_hat, c.t,
            c.T_fwd, max_steps=20)

        J_inv0 = iso_init_inv_jacobian(sdf_fn, skin_fn, fd.frame, dirs,
                                       x_hat)
        u0 = jnp.concatenate([x_hat, c.t[:, None]], axis=-1)
        wts, bs = skinning_dense_params(params['skinning'], cfg.skinning)
        u, T16, ok, _ = iso_refine_pallas(
            cam_b, dirs, u0, c.T_fwd.reshape(n, 16),
            J_inv0.reshape(n, 16), valid, list(wts), list(bs),
            fd.frame.bone_transforms.reshape(24, 16),
            list(gen.weights), list(gen.biases), list(gen.freqs),
            list(gen.phases), fd.frame.coord_min, fd.frame.coord_max,
            fd.frame.center, fd.frame.trans, tile=128, max_steps=20,
            softmax_scale=cfg.skinning.softmax_scale)

        v_ref = np.asarray(ref.converged)
        v_ker = np.asarray(ok)
        agree = (v_ref == v_ker).mean()
        # marginal rays flip convergence with float ordering (the init
        # Jacobian formulation alone moves ~1-2/256)
        assert agree > 0.94, agree
        both = v_ref & v_ker
        assert both.mean() > 0.1, both.mean()
        # the 4D problem has multiple valid roots along a ray (front/back
        # surface); a few rays may converge to a different-but-valid root
        # under different float ordering, so (a) the bulk must match the
        # XLA root exactly and (b) EVERY kernel-valid ray must satisfy the
        # XLA residual g(u) ~ 0.
        dx = np.abs(np.asarray(u[:, :3]) - np.asarray(ref.x_hat))
        match = (dx.max(-1) < 1e-3)[both]
        assert match.mean() > 0.9, match.mean()
        from arah_tpu.core.body import (normalize_canonical_points,
                                        sdf_to_metric)
        from arah_tpu.solver.root_find import forward_skinning
        x_k = u[:, :3]
        z_k = u[:, 3]
        xb_k, T_k = forward_skinning(skin_fn, fd.frame, x_k)
        err_corr = xb_k - (cam_b + z_k[:, None] * dirs - fd.frame.trans)
        x_norm_k = normalize_canonical_points(
            x_k, fd.frame.coord_min, fd.frame.coord_max, fd.frame.center)
        err_sdf = sdf_to_metric(sdf_fn(x_norm_k), fd.frame.coord_min,
                                fd.frame.coord_max)
        gnorm = np.linalg.norm(
            np.concatenate([np.asarray(err_sdf)[:, None],
                            np.asarray(err_corr)], axis=-1), axis=-1)
        assert gnorm[v_ker].max() < 5e-5, gnorm[v_ker].max()
        np.testing.assert_allclose(
            np.asarray(T16).reshape(n, 4, 4)[v_ker],
            np.asarray(T_k)[v_ker], atol=5e-3)
        # masked-out rays frozen at init
        off = ~np.asarray(valid)
        if off.any():
            np.testing.assert_allclose(np.asarray(u[:, :3])[off],
                                       np.asarray(x_hat)[off], atol=1e-6)


class TestRenderDispatch:
    def test_full_render_with_kernels_interpret(self, rng, monkeypatch):
        """Drive the REAL dispatch plumbing (renderer -> trace_and_sample
        -> kernels) on CPU via ARAH_FORCE_PALLAS=1 (kernels run in
        interpret mode) and compare against the XLA path."""
        from arah_tpu.model import init_model_params, prepare_frame
        from arah_tpu.core.rays import ray_aabb
        from arah_tpu.data.synthetic import synthetic_smpl
        from arah_tpu.render.renderer import RenderInputs, render
        from test_renderer import small_config

        cfg = small_config()
        # small tiles so the 32-ray scene divides them
        cfg = cfg._replace(tracer=cfg.tracer._replace(
            pallas_march_tile=16, pallas_corr_tile=128, pallas_iso_tile=16,
            use_pallas_iso=True))
        model = synthetic_smpl(n_verts=460)
        params = init_model_params(jax.random.PRNGKey(0), cfg,
                                   n_latent_frames=2)
        pose = jnp.asarray((rng.randn(72) * 0.2).astype(np.float32))
        betas = jnp.asarray((rng.randn(10) * 0.3).astype(np.float32))
        fd = prepare_frame(model, betas, pose,
                           jnp.asarray([0.1, 0.0, 0.2], jnp.float32))
        n = 32
        cam = jnp.asarray([0.0, 0.3, -2.5])
        tgt = rng.randint(0, 460, n)
        dirs = fd.smpl.verts_posed[tgt] - cam
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        near, far, _ = ray_aabb(fd.bounds_min, fd.bounds_max,
                                jnp.broadcast_to(cam, dirs.shape), dirs)
        latent = params['latent'][0]
        inp = RenderInputs(
            cam_loc=cam, ray_dirs=dirs, near=near, far=far,
            frame=fd.frame, smpl=fd.smpl, rots=fd.rots, Jtrs=fd.Jtrs,
            rots_full=fd.rots_full, Jtrs_posed=fd.Jtrs_posed,
            pose_cond_extra={'latent_code': latent[None]},
            geo_latent=latent)
        key = jax.random.PRNGKey(5)

        out_xla = render(params, cfg, inp, key, training=False)
        monkeypatch.setenv('ARAH_FORCE_PALLAS', '1')
        out_ker = render(params, cfg, inp, key, training=False)

        m_x = np.asarray(out_xla['network_body_mask'])
        m_k = np.asarray(out_ker['network_body_mask'])
        assert (m_x == m_k).mean() > 0.9
        both = m_x & m_k
        if both.any():
            d = np.abs(np.asarray(out_xla['rgb_values'])[both]
                       - np.asarray(out_ker['rgb_values'])[both])
            assert np.median(d) < 1e-3, np.median(d)


class TestShadeKernel:
    """Fused eval-shading kernel (ops/pallas/shade_kernel.py): SDF value,
    features and analytic d(sdf)/dx vs the XLA vmap(grad) path."""

    def _check(self, gen, x, tile):
        from arah_tpu.ops.pallas.shade_kernel import siren_shade_pallas

        def sdf_feat(p):
            out, feat = siren_apply(gen, p[None], return_features=True)
            return out[0, 0], (out[0], feat[0])

        grads, (out_ref, feat_ref) = jax.vmap(
            jax.grad(sdf_feat, has_aux=True))(x)
        out, feat, grad = siren_shade_pallas(gen, x, tile=tile)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(grads),
                                   atol=1e-4)

    def test_film_flagship(self, rng):
        cfg = HypernetConfig()
        params = init_hypernet(jax.random.PRNGKey(0), cfg)
        cond = hypernet_cond(
            params, cfg,
            jnp.asarray(rng.randn(1, 24, 9).astype(np.float32)),
            jnp.asarray(rng.randn(1, 24, 3).astype(np.float32)))[0]
        gen = hypernet_generate(
            params, cfg, cond,
            jnp.asarray(rng.randn(128).astype(np.float32)))
        # in-domain points (normalized canonical cube); padding exercised
        # by the non-tile-multiple count
        x = jnp.asarray(rng.uniform(-1, 1, (700, 3)).astype(np.float32))
        self._check(gen, x, tile=256)

    def test_no_film(self, rng):
        cfg = HypernetConfig(use_film=False, hidden_features=128,
                             num_hidden_layers=3)
        params = init_hypernet(jax.random.PRNGKey(1), cfg)
        cond = hypernet_cond(
            params, cfg,
            jnp.asarray(rng.randn(1, 24, 9).astype(np.float32)),
            jnp.asarray(rng.randn(1, 24, 3).astype(np.float32)))[0]
        gen = hypernet_generate(params, cfg, cond, None)
        x = jnp.asarray(rng.uniform(-1, 1, (512, 3)).astype(np.float32))
        self._check(gen, x, tile=256)


class TestShadeGradKernel:
    """Fused fwd+bwd shading kernel (ops/pallas/shade_grad_kernel.py):
    the custom_vjp (sdf, features, normal) primitive vs the XLA
    reverse-over-forward training path, values AND parameter/point
    gradients (random-cotangent scalarization)."""

    def _gen(self, cfg, seed, rng):
        params = init_hypernet(jax.random.PRNGKey(seed), cfg)
        cond = hypernet_cond(
            params, cfg,
            jnp.asarray(rng.randn(1, 24, 9).astype(np.float32)),
            jnp.asarray(rng.randn(1, 24, 3).astype(np.float32)))[0]
        latent = jnp.asarray(rng.randn(128).astype(np.float32)) \
            if cfg.use_film else None
        return hypernet_generate(params, cfg, cond, latent)

    def _check(self, gen, x, rng, tile, tile_bwd, xla_twin=False):
        from arah_tpu.ops.pallas.shade_grad_kernel import (
            siren_shade_grad, siren_shade_grad_xla)

        def xla_path(g, p):
            def sdf_feat(q):
                out, feat = siren_apply(g, q[None], return_features=True)
                return out[0, 0], (out[0], feat[0])
            grads, (out, feat) = jax.vmap(
                jax.jacfwd(sdf_feat, has_aux=True))(p)
            return out, feat, grads

        if xla_twin:
            ker_path = lambda g, p: siren_shade_grad_xla(g, p)
        else:
            ker_path = lambda g, p: siren_shade_grad(
                g, p, tile=tile, tile_bwd=tile_bwd)

        # ---- forward parity
        o1, f1, g1 = xla_path(gen, x)
        o2, f2, g2 = ker_path(gen, x)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   atol=1e-4)

        # ---- VJP parity: d/d(gen, x) of a random-cotangent scalarization
        co = jnp.asarray(rng.randn(*o1.shape).astype(np.float32))
        cf = jnp.asarray(rng.randn(*f1.shape).astype(np.float32))
        cn = jnp.asarray(rng.randn(*g1.shape).astype(np.float32))

        def loss(fn):
            def inner(g, p):
                o, f, n = fn(g, p)   # one fused-op call per evaluation
                return (jnp.sum(o * co) + jnp.sum(f * cf)
                        + jnp.sum(n * cn))
            return inner

        gref = jax.grad(loss(xla_path), argnums=(0, 1))(gen, x)
        gker = jax.grad(loss(ker_path), argnums=(0, 1))(gen, x)
        for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gker)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            assert np.abs(a - b).max() / scale < 1e-4, (a.shape,)

    def test_film_flagship_arch(self, rng):
        cfg = HypernetConfig(hidden_features=64, num_hidden_layers=3)
        gen = self._gen(cfg, 0, rng)
        # non-tile-multiple count exercises padded-row zero-contribution
        x = jnp.asarray(rng.uniform(-1, 1, (200, 3)).astype(np.float32))
        self._check(gen, x, rng, tile=64, tile_bwd=32)

    def test_no_film(self, rng):
        cfg = HypernetConfig(use_film=False, hidden_features=64,
                             num_hidden_layers=2)
        gen = self._gen(cfg, 1, rng)
        x = jnp.asarray(rng.uniform(-1, 1, (130, 3)).astype(np.float32))
        self._check(gen, x, rng, tile=64, tile_bwd=64)

    def test_resid_bf16_film(self, rng):
        """bf16-stored residents (shade_resid_bf16): forward sdf/feat
        bit-identical to f32 residents (the primal chain stays f32), the
        normal and every gradient leaf within ~1% — the residents only
        round stored copies, not the chain math."""
        from arah_tpu.ops.pallas.shade_grad_kernel import siren_shade_grad
        cfg = HypernetConfig(hidden_features=64, num_hidden_layers=3)
        gen = self._gen(cfg, 4, rng)
        x = jnp.asarray(rng.uniform(-1, 1, (192, 3)).astype(np.float32))
        f32 = lambda g, p: siren_shade_grad(g, p, tile=64, tile_bwd=64,
                                            resid_bf16=False)
        b16 = lambda g, p: siren_shade_grad(g, p, tile=64, tile_bwd=64,
                                            resid_bf16=True)
        o1, f1, n1 = f32(gen, x)
        o2, f2, n2 = b16(gen, x)
        np.testing.assert_array_equal(np.asarray(o2), np.asarray(o1))
        np.testing.assert_array_equal(np.asarray(f2), np.asarray(f1))
        assert np.abs(np.asarray(n2) - np.asarray(n1)).max() \
            / max(np.abs(np.asarray(n1)).max(), 1e-3) < 2e-2

        co = jnp.asarray(rng.randn(*o1.shape).astype(np.float32))
        cf = jnp.asarray(rng.randn(*f1.shape).astype(np.float32))
        cn = jnp.asarray(rng.randn(*n1.shape).astype(np.float32))

        def loss(fn):
            def inner(g, p):
                o, f, n = fn(g, p)   # one fused-op call per evaluation
                return (jnp.sum(o * co) + jnp.sum(f * cf)
                        + jnp.sum(n * cn))
            return inner

        gref = jax.grad(loss(f32), argnums=(0, 1))(gen, x)
        gker = jax.grad(loss(b16), argnums=(0, 1))(gen, x)
        for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gker)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            assert np.abs(a - b).max() / scale < 2e-2, (a.shape,)

    def test_xla_twin_film(self, rng):
        """The pure-XLA hand-VJP twin (CPU training default) against the
        autodiff path — values and all gradients."""
        cfg = HypernetConfig(hidden_features=64, num_hidden_layers=3)
        gen = self._gen(cfg, 2, rng)
        x = jnp.asarray(rng.uniform(-1, 1, (200, 3)).astype(np.float32))
        self._check(gen, x, rng, tile=0, tile_bwd=0, xla_twin=True)

    def test_xla_twin_no_film(self, rng):
        cfg = HypernetConfig(use_film=False, hidden_features=64,
                             num_hidden_layers=2)
        gen = self._gen(cfg, 3, rng)
        x = jnp.asarray(rng.uniform(-1, 1, (130, 3)).astype(np.float32))
        self._check(gen, x, rng, tile=0, tile_bwd=0, xla_twin=True)

    def test_train_render_grads_via_dispatch(self, rng, monkeypatch):
        """Drive the REAL training dispatch (renderer -> shade_grad
        kernel, eikonal kernel path included) under ARAH_FORCE_PALLAS=1
        and compare full parameter gradients against the XLA path."""
        from arah_tpu.model import init_model_params, prepare_frame
        from arah_tpu.core.rays import ray_aabb
        from arah_tpu.data.synthetic import synthetic_smpl
        from arah_tpu.render.renderer import RenderInputs, render
        from test_renderer import small_config

        cfg = small_config()
        # isolate the shading kernel: tracer kernels off, so the only
        # FORCE_PALLAS-sensitive path is use_pallas_shade_grad
        cfg = cfg._replace(
            use_pallas_shade=False, use_pallas_shade_grad=True,
            pallas_shade_tile=32, pallas_shade_grad_tile=32,
            n_eik_points=64,
            tracer=cfg.tracer._replace(
                use_pallas_corr=False, use_pallas_march=False,
                use_pallas_iso=False))
        model = synthetic_smpl(n_verts=460)
        params = init_model_params(jax.random.PRNGKey(0), cfg,
                                   n_latent_frames=2)
        pose = jnp.asarray((rng.randn(72) * 0.2).astype(np.float32))
        betas = jnp.asarray((rng.randn(10) * 0.3).astype(np.float32))
        fd = prepare_frame(model, betas, pose,
                           jnp.asarray([0.1, 0.0, 0.2], jnp.float32))
        n = 32
        cam = jnp.asarray([0.0, 0.3, -2.5])
        tgt = rng.randint(0, 460, n)
        dirs = fd.smpl.verts_posed[tgt] - cam
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        near, far, _ = ray_aabb(fd.bounds_min, fd.bounds_max,
                                jnp.broadcast_to(cam, dirs.shape), dirs)
        latent = params['latent'][0]
        inp = RenderInputs(
            cam_loc=cam, ray_dirs=dirs, near=near, far=far,
            frame=fd.frame, smpl=fd.smpl, rots=fd.rots, Jtrs=fd.Jtrs,
            rots_full=fd.rots_full, Jtrs_posed=fd.Jtrs_posed,
            pose_cond_extra={'latent_code': latent[None]},
            geo_latent=latent,
            points_eik=jnp.asarray(
                rng.uniform(-1, 1, (64, 3)).astype(np.float32)))
        key = jax.random.PRNGKey(5)

        def scalar_loss(p):
            out = render(p, cfg, inp, key, training=True)
            return (jnp.sum(out['rgb_values']) + jnp.sum(out['weights_sum'])
                    + jnp.sum((jnp.linalg.norm(out['grad_theta'], axis=-1)
                               - 1.0) ** 2))

        # baseline: the plain autodiff path (ARAH_DISABLE_PALLAS also
        # bypasses the XLA hand-VJP twin, the CPU training default)
        monkeypatch.setenv('ARAH_DISABLE_PALLAS', '1')
        g_xla = jax.grad(scalar_loss)(params)
        monkeypatch.delenv('ARAH_DISABLE_PALLAS')
        monkeypatch.setenv('ARAH_FORCE_PALLAS', '1')
        g_ker = jax.grad(scalar_loss)(params)
        for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_ker)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1e-3)
            assert np.abs(a - b).max() / scale < 5e-4, (a.shape,)


class TestStandaloneJacKernel:
    def test_matches_forward_skinning_jac(self, rng):
        """skinning_jac_pallas (one-shot, no solver loop) must equal
        forward_skinning_jac at arbitrary points — it feeds the
        renderer's implicit-diff correction (idiff_standalone_jac).
        n=300 with tile 128 exercises the padding path."""
        from arah_tpu.nn.skinning import SkinningConfig, init_skinning
        from arah_tpu.render.ray_tracing import CanonicalFrame
        from arah_tpu.solver.root_find import forward_skinning_jac
        from arah_tpu.ops.pallas.corr_kernel_t import skinning_jac_pallas
        from arah_tpu.core.smpl import batch_rodrigues
        from arah_tpu.render.renderer import make_skin_fn

        cfg = SkinningConfig(d_hidden=64, n_layers=3)
        params = init_skinning(jax.random.PRNGKey(0), cfg)
        aa = (rng.randn(24, 3) * 0.15).astype(np.float32)
        R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
        tfs = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
        tfs[:, :3, :3] = R
        tfs[:, :3, 3] = (rng.randn(24, 3) * 0.05).astype(np.float32)
        frame = CanonicalFrame(
            bone_transforms=jnp.asarray(tfs), trans=jnp.zeros(3),
            coord_min=jnp.float32(-1.1), coord_max=jnp.float32(1.0),
            center=jnp.asarray(rng.randn(3).astype(np.float32) * 0.05))
        skin_fn = make_skin_fn({'skinning': params},
                               type('C', (), {'skinning': cfg}))
        n = 300
        x = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
        wts, bs = [], []
        for lyr in params['layers']:
            v = lyr['v']
            w = lyr['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
            wts.append(w)
            bs.append(lyr['b'])
        jac = skinning_jac_pallas(
            x, tuple(wts), tuple(bs),
            frame.bone_transforms.reshape(24, 16),
            frame.coord_min, frame.coord_max, frame.center, tile=128)
        J_ref = forward_skinning_jac(skin_fn, frame, x)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(J_ref),
                                   rtol=1e-4, atol=1e-5)
