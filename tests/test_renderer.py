"""End-to-end renderer integration tests on a synthetic body."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arah_tpu.core.rays import ray_aabb
from arah_tpu.data.synthetic import synthetic_smpl
from arah_tpu.model import init_model_params, prepare_frame
from arah_tpu.nn.color import ColorConfig
from arah_tpu.nn.hypernet import HypernetConfig
from arah_tpu.nn.skinning import SkinningConfig
from arah_tpu.render.ray_tracing import RayTracerConfig
from arah_tpu.render.renderer import ModelConfig, RenderInputs, render


def small_config(train_skinning=False):
    return ModelConfig(
        hypernet=HypernetConfig(hidden_features=64, num_hidden_layers=2,
                                hyper_hidden_ch=64, use_film=True),
        skinning=SkinningConfig(d_hidden=64, n_layers=2),
        # sdf feature width == hypernet hidden_features (64) + 128 latent
        color=ColorConfig(d_feature=64 + 128, d_hidden=64, n_layers=2,
                          skips=(), pose_encoder='latent'),
        tracer=RayTracerConfig(sphere_tracing_iters=8, n_steps=16,
                               near_surface_vol_samples=4,
                               far_surface_vol_samples=4, corr_max_steps=8,
                               iso_max_steps=8),
        cano_view_dirs=False,
        train_skinning_net=train_skinning,
        n_eik_points=64,
    )


def make_inputs(cfg, rng, n_rays=24, training=False):
    model = synthetic_smpl(n_verts=512)
    key = jax.random.PRNGKey(0)
    params = init_model_params(key, cfg, n_latent_frames=4)

    pose = jnp.asarray((rng.randn(72) * 0.2).astype(np.float32))
    betas = jnp.asarray((rng.randn(10) * 0.3).astype(np.float32))
    trans = jnp.asarray([0.1, 0.05, 0.2], jnp.float32)
    fd = prepare_frame(model, betas, pose, trans)

    # rays from a camera toward random posed vertices
    cam = jnp.asarray([0.0, 0.3, -2.5])
    tgt_idx = rng.randint(0, 512, n_rays)
    targets = fd.smpl.verts_posed[tgt_idx]
    dirs = targets - cam
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    near, far, hit = ray_aabb(fd.bounds_min, fd.bounds_max,
                              jnp.broadcast_to(cam, dirs.shape), dirs)

    latent = params['latent'][0]
    inp = RenderInputs(
        cam_loc=cam, ray_dirs=dirs, near=near, far=far,
        frame=fd.frame, smpl=fd.smpl,
        rots=fd.rots, Jtrs=fd.Jtrs, rots_full=fd.rots_full,
        Jtrs_posed=fd.Jtrs_posed,
        pose_cond_extra={'latent_code': latent[None]},
        geo_latent=latent,
        points_uniform=(jax.random.uniform(key, (64, 3)) - 0.5) * 2
        if training else None,
        points_skinning=jax.random.normal(key, (64, 3)) * 0.2
        if training else None,
        points_inside=jax.random.normal(key, (64, 3)) * 0.1
        if training else None,
    )
    return params, fd, inp, hit


class TestRenderEval:
    def test_shapes_and_finiteness(self, rng):
        cfg = small_config()
        params, fd, inp, hit = make_inputs(cfg, rng)
        out = jax.jit(
            lambda p, i: render(p, cfg, i, jax.random.PRNGKey(1),
                                training=False))(params, inp)
        n = inp.ray_dirs.shape[0]
        assert out['rgb_values'].shape == (n, 3)
        assert out['weights_sum'].shape == (n,)
        assert np.isfinite(np.asarray(out['rgb_values'])).all()
        assert np.isfinite(np.asarray(out['weights_sum'])).all()
        assert ((np.asarray(out['rgb_values']) >= 0)
                & (np.asarray(out['rgb_values']) <= 1)).all()

    def test_rays_hit_box(self, rng):
        cfg = small_config()
        _, _, inp, hit = make_inputs(cfg, rng)
        assert np.asarray(hit).all()

    def test_chunked_trace_matches_dense(self, rng):
        """trace_chunk (per-ray-chunk early-exit while_loop) must not
        change eval results vs the dense fori_loop path."""
        cfg = small_config()
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=96)
        cfg_chunked = cfg._replace(
            tracer=cfg.tracer._replace(trace_chunk=32))
        cfg_dense = cfg._replace(
            tracer=cfg.tracer._replace(trace_chunk=0))
        key = jax.random.PRNGKey(1)
        out_c = jax.jit(lambda p, i: render(p, cfg_chunked, i, key,
                                            training=False))(params, inp)
        out_d = jax.jit(lambda p, i: render(p, cfg_dense, i, key,
                                            training=False))(params, inp)
        for k in ('rgb_values', 'weights_sum', 'surface_depth',
                  'surface_converged'):
            np.testing.assert_allclose(np.asarray(out_c[k]),
                                       np.asarray(out_d[k]),
                                       rtol=1e-5, atol=1e-5, err_msg=k)


class TestRenderTrain:
    @pytest.mark.slow
    def test_chunked_corr_matches_dense_with_grads(self, rng):
        """Train-mode corr chunking (lax.map Broyden) must leave loss AND
        gradients unchanged vs the dense solve (the solver is
        stop-gradded; only fusion order may differ)."""
        cfg = small_config()
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=24, training=True)

        def loss_fn(p, c):
            out = render(p, c, inp, jax.random.PRNGKey(2), training=True)
            return jnp.sum(out['rgb_values']) + jnp.sum(out['weights_sum'])

        # 24 rays x 16 samples = 384 points; chunk 128 divides it
        cfg_c = cfg._replace(tracer=cfg.tracer._replace(corr_chunk=128))
        cfg_d = cfg._replace(tracer=cfg.tracer._replace(corr_chunk=0))
        lc, gc = jax.jit(jax.value_and_grad(loss_fn),
                         static_argnums=1)(params, cfg_c)
        ld, gd = jax.jit(jax.value_and_grad(loss_fn),
                         static_argnums=1)(params, cfg_d)
        np.testing.assert_allclose(float(lc), float(ld), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            gc, gd)


    @pytest.mark.parametrize('train_skinning', [False, True])
    def test_gradients_flow(self, rng, train_skinning):
        cfg = small_config(train_skinning=train_skinning)
        params, fd, inp, _ = make_inputs(cfg, rng, training=True)

        def loss_fn(p):
            out = render(p, cfg, inp, jax.random.PRNGKey(2), training=True)
            loss = jnp.sum(out['rgb_values']) + jnp.sum(out['weights_sum'])
            loss += jnp.sum(jnp.abs(
                jnp.linalg.norm(out['grad_theta'], axis=-1) - 1.0))
            loss += jnp.sum(out['off_surface_sdf'] ** 2)
            loss += jnp.sum(out['pred_weights'] ** 2)
            return loss

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves_with_path(grads)
        norms = {jax.tree_util.keystr(k): float(jnp.linalg.norm(v))
                 for k, v in flat}
        assert all(np.isfinite(v) for v in norms.values()), norms
        # color + deviation + hypernet always receive gradient
        assert any(v > 0 for k, v in norms.items() if "'color'" in k)
        assert any(v > 0 for k, v in norms.items() if "'deviation'" in k)
        assert any(v > 0 for k, v in norms.items() if "'hypernet'" in k)
        skin_norm = sum(v for k, v in norms.items() if "'skinning'" in k)
        # skinning net always gets gradient from pred_weights reg; with
        # train_skinning_net the implicit-diff path adds render gradients
        assert skin_norm > 0


class TestCorrWarmStart:
    def test_warm_start_matches_cold_init(self, rng):
        """Coarse-to-fine corr warm start (corr_coarse_stride=4) must
        agree with the per-sample KNN-init reference semantics: identical
        body mask, rgb to solver tolerance, and no net loss of converged
        samples (warm inits typically rescue a few points the KNN init
        fails on)."""
        cfg = small_config()
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=64)
        key = jax.random.PRNGKey(1)
        cfg_w = cfg._replace(tracer=cfg.tracer._replace(
            corr_coarse_stride=4))
        out0 = jax.jit(lambda p, i: render(p, cfg, i, key,
                                           training=False))(params, inp)
        outw = jax.jit(lambda p, i: render(p, cfg_w, i, key,
                                           training=False))(params, inp)
        np.testing.assert_array_equal(
            np.asarray(out0['network_body_mask']),
            np.asarray(outw['network_body_mask']))
        np.testing.assert_allclose(np.asarray(out0['rgb_values']),
                                   np.asarray(outw['rgb_values']),
                                   atol=1e-4)
        v0 = int(out0['n_samples_valid'])
        vw = int(outw['n_samples_valid'])
        assert vw >= v0 - max(2, v0 // 100), (v0, vw)


class TestIdiffLinearize:
    def test_linearize_matches_per_point_jacfwd(self, rng):
        """The batched-linearize implicit-diff Jacobian (renderer.py,
        idiff_linearize=True) equals vmap(jacfwd) ONLY because the
        forward-skinning map is strictly pointwise across the batch —
        pin values AND parameter gradients of the two branches equal so
        any future batch-coupled op in the skinning path fails loudly
        (ADVICE r3)."""
        cfg = small_config(train_skinning=True)
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=16, training=True)

        def loss_fn(p, c):
            out = render(p, c, inp, jax.random.PRNGKey(2), training=True)
            return (jnp.sum(out['rgb_values'] ** 2)
                    + jnp.sum(out['weights_sum']))

        cfg_lin = cfg._replace(idiff_linearize=True)
        cfg_jac = cfg._replace(idiff_linearize=False)
        ll, gl = jax.jit(jax.value_and_grad(loss_fn),
                         static_argnums=1)(params, cfg_lin)
        lj, gj = jax.jit(jax.value_and_grad(loss_fn),
                         static_argnums=1)(params, cfg_jac)
        np.testing.assert_allclose(float(ll), float(lj), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
            gl, gj)
        # the branch must actually exercise the correction: skinning-net
        # grads are nonzero under train_skinning_net
        skin_norm = sum(float(jnp.linalg.norm(v))
                        for v in jax.tree.leaves(gl['skinning']))
        assert skin_norm > 0


class TestIdiffKernelJac:
    def test_supplied_jac_matches_autodiff_path(self, rng):
        """shade_samples with a SUPPLIED exact Jacobian (the corr
        kernel's want_jac output on TPU) must produce the same loss AND
        parameter gradients as the autodiff (linearize) path — pins the
        metric->normalized s_u conversion and the primal-only XLA graph
        (renderer.py idiff_kernel_jac)."""
        import jax
        from arah_tpu.core.body import unnormalize_canonical_points
        from arah_tpu.render.ray_tracing import trace_and_sample
        from arah_tpu.render.renderer import (color_pose_feature,
                                              generate_sdf, make_sdf_fn,
                                              make_skin_fn, shade_samples)
        from arah_tpu.solver.root_find import forward_skinning_jac

        cfg = small_config(train_skinning=True)
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=16, training=True)
        gen = generate_sdf(params, cfg, inp.rots, inp.Jtrs, inp.geo_latent)
        cam_b = jnp.broadcast_to(inp.cam_loc, inp.ray_dirs.shape)
        trace = trace_and_sample(
            cfg.tracer, make_sdf_fn(gen, True), make_skin_fn(params, cfg,
                                                             True),
            inp.frame, inp.smpl, cam_b, inp.ray_dirs, inp.near, inp.far,
            jax.random.PRNGKey(3), eval_mode=False)
        trace = jax.lax.stop_gradient(trace)
        s = trace.samples
        n, S = s.z_vals.shape
        # the exact metric-space Jacobian the kernel would produce
        x_hat = unnormalize_canonical_points(
            s.points_norm.reshape(-1, 3), inp.frame.coord_min,
            inp.frame.coord_max, inp.frame.center)
        jac = forward_skinning_jac(make_skin_fn(params, cfg, True),
                                   inp.frame, x_hat).reshape(n, S, 3, 3)
        pose_cond = dict(inp.pose_cond_extra)
        pose_cond.update({'rots_full': inp.rots_full,
                          'Jtrs_posed': inp.Jtrs_posed})

        def loss_fn(p, use_jac):
            pf = color_pose_feature(p['color'], cfg.color, pose_cond)
            rgb, ws, _ = shade_samples(
                p, cfg, generate_sdf(p, cfg, inp.rots, inp.Jtrs,
                                     inp.geo_latent),
                inp.frame, s.points_norm, s.z_vals, s.transforms,
                s.converge_mask, inp.ray_dirs, inp.ray_dirs, pf,
                training=True, jac=jac if use_jac else None)
            return jnp.sum(rgb ** 2) + jnp.sum(ws)

        l_j, g_j = jax.jit(jax.value_and_grad(loss_fn),
                           static_argnums=1)(params, True)
        l_a, g_a = jax.jit(jax.value_and_grad(loss_fn),
                           static_argnums=1)(params, False)
        np.testing.assert_allclose(float(l_j), float(l_a), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
            g_j, g_a)


class TestIsoTrainModeMask:
    def test_train_mode_refines_all_rays_eval_skips_diverged(self, rng):
        """Pin the iso-refinement active mask to the reference's
        semantics: `~diverge_mask if eval_mode else ones`
        (`/root/reference/im2mesh/metaavatar_render/renderer/
        ray_tracing.py:249` — 'For non-divergent (during testing, to
        save computation) or all (during training) rays'). A random-init
        SIREN diverges many rays, so the two masks must actually differ.
        """
        import arah_tpu.render.ray_tracing as rt
        from arah_tpu.render.renderer import (generate_sdf, make_sdf_fn,
                                              make_skin_fn)

        cfg = small_config()
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=32)
        # force half the rays to diverge: an artificially short far bound
        # makes the march walk past it (diverged = t >= far), exactly the
        # reference's diverge_mask trigger
        far = np.array(inp.far)
        far[16:] = np.asarray(inp.near)[16:] + 0.05
        inp = inp._replace(far=jnp.asarray(far))
        gen = generate_sdf(params, cfg, fd.rots, fd.Jtrs,
                           params['latent'][0])
        sdf_fn = make_sdf_fn(gen)
        skin_fn = make_skin_fn(params, cfg)

        captured = {}
        orig = rt.search_iso_surface_depth

        def spy(sdf_fn, skin_fn, frame, cam_loc, ray_dirs, valid, *a, **k):
            captured['valid'] = np.asarray(valid)
            return orig(sdf_fn, skin_fn, frame, cam_loc, ray_dirs,
                        valid, *a, **k)

        cam_b = jnp.broadcast_to(inp.cam_loc, inp.ray_dirs.shape)
        rt.search_iso_surface_depth = spy
        try:
            rt.trace_and_sample(cfg.tracer, sdf_fn, skin_fn, inp.frame,
                                inp.smpl, cam_b, inp.ray_dirs, inp.near,
                                inp.far, jax.random.PRNGKey(3),
                                eval_mode=False)
            train_valid = captured['valid']
            rt.trace_and_sample(cfg.tracer, sdf_fn, skin_fn, inp.frame,
                                inp.smpl, cam_b, inp.ray_dirs, inp.near,
                                inp.far, jax.random.PRNGKey(3),
                                eval_mode=True)
            eval_valid = captured['valid']
        finally:
            rt.search_iso_surface_depth = orig

        assert train_valid.all(), \
            'training must refine ALL rays incl. diverged (reference ' \
            'ray_tracing.py:249)'
        assert not eval_valid.all(), \
            'eval must skip diverged rays (and this scene must have some)'


class TestBf16Shading:
    def test_bf16_close_to_f32_and_grads_finite(self, rng):
        """bf16-matmul/f32-accum shading must stay visually indistinguish-
        able from f32 (rgb atol ~1e-2) and keep training gradients finite.
        Solvers run f32 in both, so sample sets are identical."""
        cfg = small_config(train_skinning=True)
        cfg_bf16 = cfg._replace(bf16_shading=True)
        params, fd, inp, hit = make_inputs(cfg, rng, training=True)
        key = jax.random.PRNGKey(7)

        out32 = jax.jit(lambda p: render(p, cfg, inp, key, training=False))(
            params)
        out16 = jax.jit(
            lambda p: render(p, cfg_bf16, inp, key, training=False))(params)
        np.testing.assert_array_equal(
            np.asarray(out32['network_body_mask']),
            np.asarray(out16['network_body_mask']))
        d = np.abs(np.asarray(out32['rgb_values'])
                   - np.asarray(out16['rgb_values']))
        # the 30x-gain sine MLP is chaotic: a single boundary ray can
        # amplify bf16 rounding to ~2e-2 (and whether it does shifts with
        # the XLA:CPU reduction order, which other tests' torch imports
        # perturb), so bound the bulk error and the worst ray loosely
        assert np.median(d) < 1e-3, np.median(d)
        # a couple of boundary rays at ~0.05 lift the 72-value mean
        assert d.mean() < 5e-3, d.mean()
        assert d.max() < 0.1, d.max()

        def loss_fn(p):
            out = render(p, cfg_bf16, inp, key, training=True)
            return (jnp.mean(out['rgb_values'] ** 2)
                    + jnp.mean((jnp.linalg.norm(out['grad_theta'], axis=-1)
                                - 1.0) ** 2))
        grads = jax.jit(jax.grad(loss_fn))(params)
        for leaf in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()


class TestShadePack:
    """ModelConfig.shade_pack: the implicit-diff correction + shading +
    color stages run on the left-packed valid subset. Per-point math is
    row-independent, so when the static budget holds every valid sample
    (n_samples_overflow == 0) results must match the dense path; when it
    does not, the drop-tail contract degrades gracefully with exact
    telemetry (the resolve-cap pattern)."""

    def _outs(self, cfg, params, inp, training=False):
        key = jax.random.PRNGKey(1)
        return jax.jit(lambda p, i: render(p, cfg, i, key,
                                           training=training))(params, inp)

    def test_eval_packed_matches_dense(self, rng):
        cfg = small_config()
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=48)
        out_p = self._outs(cfg._replace(shade_pack=True,
                                        shade_pack_align=64), params, inp)
        out_d = self._outs(cfg._replace(shade_pack=False), params, inp)
        assert int(out_p['n_samples_overflow']) == 0
        assert int(out_p['n_samples_shaded']) \
            <= int(out_d['n_samples_dense'])
        for k in ('rgb_values', 'weights_sum'):
            np.testing.assert_allclose(np.asarray(out_p[k]),
                                       np.asarray(out_d[k]),
                                       rtol=1e-6, atol=1e-6, err_msg=k)

    def test_train_values_and_grads_match(self, rng):
        """Training mode with the implicit-diff skinning correction on
        the packed subset: loss and every param gradient leaf match the
        dense path (the pack gather's backward is a scatter-add)."""
        cfg = small_config(train_skinning=True)
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=16,
                                         training=True)
        key = jax.random.PRNGKey(1)

        def loss(p, c):
            out = render(p, c, inp, key, training=True)
            return (jnp.sum(out['rgb_values'])
                    + jnp.sum(out['weights_sum'])
                    + jnp.sum(out['grad_theta'] ** 2))

        cp = cfg._replace(shade_pack=True, shade_pack_align=64)
        cd = cfg._replace(shade_pack=False)
        lp, gp = jax.value_and_grad(loss)(params, cp)
        ld, gd = jax.value_and_grad(loss)(params, cd)
        np.testing.assert_allclose(float(lp), float(ld), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gd)):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-4)
            assert np.abs(a - b).max() / scale < 1e-5, (a.shape,)

    def test_overflow_graceful(self, rng):
        """A deliberately tiny budget: overflow telemetry is exact and
        the dropped-tail render stays finite and bounded."""
        cfg = small_config()
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=48)
        out_d = self._outs(cfg._replace(shade_pack=False), params, inp)
        tiny = cfg._replace(shade_pack=True, shade_pack_frac=0.05,
                            shade_pack_align=64)
        out_t = self._outs(tiny, params, inp)
        n_valid = int(out_d['n_samples_valid'])
        K = int(out_t['n_samples_shaded'])
        assert int(out_t['n_samples_overflow']) == max(n_valid - K, 0)
        rgb = np.asarray(out_t['rgb_values'])
        assert np.isfinite(rgb).all()
        assert ((rgb >= 0) & (rgb <= 1)).all()
        ws = np.asarray(out_t['weights_sum'])
        assert np.isfinite(ws).all() and (ws <= 1 + 1e-6).all()


class TestIdiffStandaloneJac:
    def test_standalone_kernel_matches_linearize(self, rng, monkeypatch):
        """cfg.idiff_standalone_jac: the one-shot Pallas Jacobian path
        (interpret mode via ARAH_FORCE_PALLAS) must produce the same
        loss AND parameter gradients as the linearize path."""
        import jax
        from arah_tpu.render.ray_tracing import trace_and_sample
        from arah_tpu.render.renderer import (color_pose_feature,
                                              generate_sdf, make_sdf_fn,
                                              make_skin_fn, shade_samples)

        cfg = small_config(train_skinning=True)
        params, fd, inp, _ = make_inputs(cfg, rng, n_rays=16, training=True)
        gen = generate_sdf(params, cfg, inp.rots, inp.Jtrs, inp.geo_latent)
        cam_b = jnp.broadcast_to(inp.cam_loc, inp.ray_dirs.shape)
        trace = trace_and_sample(
            cfg.tracer, make_sdf_fn(gen, True),
            make_skin_fn(params, cfg, True),
            inp.frame, inp.smpl, cam_b, inp.ray_dirs, inp.near, inp.far,
            jax.random.PRNGKey(3), eval_mode=False)
        trace = jax.lax.stop_gradient(trace)
        s = trace.samples
        pose_cond = dict(inp.pose_cond_extra)
        pose_cond.update({'rots_full': inp.rots_full,
                          'Jtrs_posed': inp.Jtrs_posed})
        monkeypatch.setenv('ARAH_FORCE_PALLAS', '1')

        def loss_fn(p, standalone):
            c = cfg._replace(idiff_standalone_jac=standalone)
            pf = color_pose_feature(p['color'], c.color, pose_cond)
            rgb, ws, _ = shade_samples(
                p, c, generate_sdf(p, c, inp.rots, inp.Jtrs,
                                   inp.geo_latent),
                inp.frame, s.points_norm, s.z_vals, s.transforms,
                s.converge_mask, inp.ray_dirs, inp.ray_dirs, pf,
                training=True)
            return jnp.sum(rgb ** 2) + jnp.sum(ws)

        l_k, g_k = jax.jit(jax.value_and_grad(loss_fn),
                           static_argnums=1)(params, True)
        l_a, g_a = jax.jit(jax.value_and_grad(loss_fn),
                           static_argnums=1)(params, False)
        np.testing.assert_allclose(float(l_k), float(l_a), rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
            g_k, g_a)
