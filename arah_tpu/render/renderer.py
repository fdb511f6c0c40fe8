"""The ARAH volume renderer: full forward pass tying together the
hypernetwork SDF, skinning network, ray tracer, color network and VolSDF
compositor.

TPU-first re-design of
`im2mesh/metaavatar_render/renderer/implicit_differentiable_renderer.py`
(`IDHRNetwork`) and the model root
(`im2mesh/metaavatar_render/models/__init__.py:137-201`):

  * the ray tracer runs fully under stop_gradient (reference: no_grad),
  * training gradients reach the skinning network through the
    implicit-differentiation correction
    `p <- p - J^-1 (fwd(p) - stop_grad(fwd(p)))`
    (`implicit_differentiable_renderer.py:315-334`),
  * samples stay in dense (n_rays, n_samples) blocks; the reference's
    variable-length scatter-packing is reproduced with a stable
    argsort-based left-pack (render/volsdf.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from arah_tpu.core.linalg import inv3x3, inv_affine

from arah_tpu.core.body import (normalize_canonical_points, sdf_to_metric,
                                unnormalize_canonical_points)
from arah_tpu.nn.color import ColorConfig, color_apply, color_pose_feature
from arah_tpu.nn.deviation import deviation_value
from arah_tpu.nn.hypernet import (HypernetConfig, hypernet_cond,
                                  hypernet_flat_params, hypernet_generate)
from arah_tpu.nn.siren import GeneratedMLP, siren_apply
from arah_tpu.nn.skinning import SkinningConfig, skinning_weights
from arah_tpu.render.ray_tracing import (CanonicalFrame, RayTracerConfig,
                                         SmplRef, trace_and_sample)
from arah_tpu.render.volsdf import composite_masked, volsdf_density
from arah_tpu.solver.root_find import forward_skinning


class ModelConfig(NamedTuple):
    hypernet: HypernetConfig = HypernetConfig()
    skinning: SkinningConfig = SkinningConfig()
    color: ColorConfig = ColorConfig()
    tracer: RayTracerConfig = RayTracerConfig()
    cano_view_dirs: bool = True
    train_skinning_net: bool = False
    render_last_pt: bool = False
    n_eik_points: int = 1024
    # bf16-matmul/f32-accum in the differentiable shading stage (SIREN
    # SDF+features+normals and the color MLP). Solvers, eikonal and the
    # other regularizers stay f32. See nn/layers.py:mm_t.
    bf16_shading: bool = False
    # eval-only fused SIREN shading kernel (ops/pallas/shade_kernel.py):
    # SDF + features + spatial normal in one VMEM pass instead of the
    # XLA vmap(grad) whose hidden activations round-trip HBM. Training
    # keeps the XLA path (the kernel has no parameter backward).
    use_pallas_shade: bool = True
    # 512: tile 1024 exceeds the 16 MB scoped-VMEM limit (26.9 MB on v5e
    # -- the six resident (tile, 256) sine-derivative factors dominate)
    pallas_shade_tile: int = 512
    # TRAINING-path fused shading kernel pair (ops/pallas/
    # shade_grad_kernel.py): the differentiable (sdf, features, normal)
    # primitive becomes a custom_vjp whose backward recomputes the SIREN
    # chain per tile in VMEM with hand-written cotangents — the
    # (n_points, 3, hidden) jacfwd tangent chain of the XLA path (60 of
    # 128 ms/step, PERF.md round 2b) never touches HBM.
    use_pallas_shade_grad: bool = True
    pallas_shade_grad_tile: int = 256   # sweep: 256 >= 128 > 64 (PERF.md)
    # store the shade kernels' VMEM residents (sine-derivative factors,
    # recomputed activations, reverse-chain terms) in bf16, halving
    # scoped VMEM so ~2x bigger point tiles fit the 16 MB limit. The
    # chain math and all cotangent products stay f32; only the *stored*
    # residents round (worst grad leaf ~0.5% on the flagship net,
    # tests/test_pallas.py::test_resid_bf16_film). MEASURED NEGATIVE on
    # v5e (round 4, interleaved 8192-ray A/B): train 0.99x at the same
    # 512/256 tiles (convert overhead, no VMEM payoff) and 0.97x with
    # the unlocked fwd tile 1024 — fewer grid steps pipeline worse, so
    # the VMEM headroom buys nothing. Default OFF; kept as a tested A/B
    # (bench_ablate 'resid<fwd>x<bwd>').
    shade_resid_bf16: bool = False
    # shade only the valid samples: the tracer's converge_mask is known
    # before shading, so the implicit-diff correction, the fused shade
    # pair and the color MLP can run on a left-packed (K,) subset
    # instead of every dense (ray, sample) slot (measured valid fraction
    # ~0.87 on the flagship bench scene — the reference boolean-indexes
    # the same set, `implicit_differentiable_renderer.py:284-296`). K is
    # the static budget ceil(frac * N) rounded up to shade_pack_align;
    # overflow drops the flat-order tail (density 0, like an unconverged
    # sample) with exact `n_samples_overflow` telemetry — the solver
    # resolve-cap contract (tests/test_renderer.py::TestShadePack).
    # MEASURED NEGATIVE on v5e (round 5, interleaved 8192-ray A/B):
    # 32.3k packed vs 45.5k dense rays/s (0.71x) — the jnp.nonzero
    # index build, the input gathers and the rgb/density scatters (plus
    # their backward scatter-adds) lower to ~70 ms of serialized
    # scatter/gather HLO on TPU, an order of magnitude more than the
    # ~13% of shading compute the pack saves. The reference's
    # boolean-index pack is the right trade on a GPU's native gathers;
    # dense slots are the right trade on the MXU. Default OFF; kept as
    # a value-pinned A/B (bench_ablate 'pack').
    shade_pack: bool = False
    shade_pack_frac: float = 0.95
    shade_pack_align: int = 512
    # implicit-diff correction Jacobian via ONE batched jax.linearize +
    # 3 tangent passes (plain (N,in)x(in,out) matmul chains) instead of
    # vmap(jacfwd(per-point)) (awkward (N,3,in) generalized dots on TPU;
    # same finding as solver/root_find.py:forward_skinning_jac). Values
    # and param-grads identical to f32 noise; False = old form (A/B).
    idiff_linearize: bool = True
    # take the implicit-diff Jacobian from the corr KERNEL instead
    # (ops/pallas/corr_kernel_t.py want_jac: three in-kernel jvp chains
    # at the converged roots, VMEM-resident) — the XLA graph then runs
    # only the differentiable PRIMAL skinning pass. Exact same J (the
    # Jacobian is stop-gradded either way; pinned by
    # TestIdiffKernelJac + test_want_jac_matches_exact_jacobian).
    # MEASURED NEGATIVE on v5e (round 4): 30.6k vs 35.4k rays/s at 8192
    # rays — the corr kernel is VPU-bound and the three tangent chains
    # (softplus/hier-softmax derivative algebra) triple its most
    # expensive non-overlapped work, costing far more than the three
    # plain-matmul XLA tangent passes they replace. Default OFF; kept
    # as a tested A/B (bench_ablate 'idiff_xla' vs default).
    idiff_kernel_jac: bool = False
    # STANDALONE one-shot Pallas Jacobian at the (packed) shading points
    # (corr_kernel_t.skinning_jac_pallas): the same exact J as the
    # linearize path, computed once in VMEM OUTSIDE the solver — the XLA
    # graph keeps only the differentiable primal skinning pass. Dodges
    # the idiff_kernel_jac per-iteration overlap problem (ROADMAP #4).
    # Requires a kernel-compatible skinning net (skinning_dense_params);
    # falls back to idiff_linearize otherwise. Equality pinned by
    # tests/test_renderer.py::TestIdiffStandaloneJac.
    idiff_standalone_jac: bool = True


def make_skin_fn(params, cfg: ModelConfig, stop_grad: bool = False):
    """Normalized canonical points (N, 3) -> (N, 24) skinning weights."""
    p = jax.lax.stop_gradient(params['skinning']) if stop_grad \
        else params['skinning']
    return lambda x: skinning_weights(p, cfg.skinning, x)


def make_sdf_fn(gen: GeneratedMLP, stop_grad: bool = False):
    """Normalized canonical points (N, 3) -> (N,) normalized SDF.

    Default: plain XLA `siren_apply` in both variants — the tracer's hot
    loops get their fused kernels via `RayTracerConfig.use_pallas_*`
    inside `trace_and_sample`, not here. Only under the A/B-only
    `ARAH_ENABLE_PALLAS=1` switch does the stop-gradient variant dispatch
    to the standalone point-eval kernel (measured slower end-to-end;
    see ops/fused.py docstring)."""
    g = jax.lax.stop_gradient(gen) if stop_grad else gen
    if stop_grad:
        from arah_tpu.ops.fused import make_fused_sdf_fn, pallas_enabled
        if pallas_enabled():
            return make_fused_sdf_fn(g)
    return lambda x: siren_apply(g, x)[..., 0]


def generate_sdf(params, cfg: ModelConfig, rots, Jtrs, geo_latent=None):
    """Per-frame hypernetwork pass -> generated SIREN weights.

    rots: (1, 24, 9); Jtrs: (1, 24, 3). Mirrors
    `models/__init__.py:176-179` + `siren_modules.py:280-316`.

    If the model uses the plain (non-hypernet) `single_bvp` decoder
    variant, its trainable SIREN weights are returned directly.
    """
    if 'sdf_plain' in params:
        from arah_tpu.nn.siren import plain_siren_as_generated
        return plain_siren_as_generated(params['sdf_plain'])
    cond = hypernet_cond(params['hypernet'], cfg.hypernet, rots, Jtrs)[0]
    latent = None
    if cfg.hypernet.use_film and geo_latent is not None:
        latent = geo_latent
    elif geo_latent is not None:
        cond = cond + geo_latent
    return hypernet_generate(params['hypernet'], cfg.hypernet, cond, latent)


class RenderInputs(NamedTuple):
    """Per-step device inputs for one frame (rays possibly sharded)."""
    cam_loc: jax.Array            # (3,)
    ray_dirs: jax.Array           # (N, 3)
    near: jax.Array               # (N,)
    far: jax.Array                # (N,)
    frame: CanonicalFrame
    smpl: SmplRef
    rots: jax.Array               # (1, 24, 9) local rots (root=I)
    Jtrs: jax.Array               # (1, 24, 3) normalized rest joints
    rots_full: jax.Array          # (1, 24, 9) incl. root
    Jtrs_posed: jax.Array         # (1, 24, 3)
    pose_cond_extra: dict         # latent_code/rot_noise/... (may be {})
    geo_latent: Any = None        # (128,) or None
    rots_noise: Any = None        # (1, 24, 9) hypernet input noise or None
    view_noise: Any = None        # (3, 3) rotation / (N, 3) additive / None
    points_uniform: Any = None    # (1024, 3) normalized, off-surface reg
    points_skinning: Any = None   # (1024, 3) metric cano, skinning reg
    points_inside: Any = None     # (1024, 3) normalized, inside reg
    points_eik: Any = None        # (n_eik, 3) override for the eikonal
    #                               sample (parity tests inject the exact
    #                               points the torch reference drew)


def shade_samples(params, cfg: ModelConfig, gen: GeneratedMLP,
                  frame: CanonicalFrame, points_norm, z_vals, transforms_fwd,
                  converge_mask, view_dirs, view_dirs_orig, pose_feature,
                  training: bool, ray_augm: bool = False, jac=None):
    """SDF + color + VolSDF compositing over dense (n_rays, S) samples.

    Mirrors `get_rbg_value_vol_sdf`
    (`implicit_differentiable_renderer.py:261-396`).
    """
    n_rays, S, _ = points_norm.shape
    flat_p = points_norm.reshape(-1, 3)
    flat_T = transforms_fwd.reshape(-1, 4, 4)
    vd = jnp.broadcast_to(view_dirs[:, None, :], (n_rays, S, 3)).reshape(-1, 3)
    vd_orig = jnp.broadcast_to(
        view_dirs_orig[:, None, :], (n_rays, S, 3)).reshape(-1, 3)

    if cfg.cano_view_dirs:
        T_bwd = jax.lax.stop_gradient(inv_affine(flat_T))
        in_vd = jnp.einsum('nab,nb->na', T_bwd[:, :3, :3], -vd)
        in_vd_orig = jnp.einsum('nab,nb->na', T_bwd[:, :3, :3], -vd_orig)
    else:
        in_vd, in_vd_orig = -vd, -vd_orig

    # --- valid-sample packing (see ModelConfig.shade_pack): everything
    # from the implicit-diff correction through the color MLP runs on
    # the left-packed valid subset; per-point math is row-independent,
    # so packed values are bit-identical to the dense path's.
    N_dense = n_rays * S
    align = max(int(cfg.shade_pack_align), 1)
    K = min(N_dense,
            -(-int(cfg.shade_pack_frac * N_dense) // align) * align)
    packed = bool(cfg.shade_pack)
    n_overflow = jnp.int32(0)
    if packed:
        mask_flat = converge_mask.reshape(-1)
        n_valid = jnp.sum(mask_flat.astype(jnp.int32))
        n_overflow = jnp.maximum(n_valid - K, 0)
        # first K valid flat indices (stable ray-major order); pad slots
        # get N_dense -> clamped garbage rows on gather, dropped on
        # scatter (`mode='drop'`)
        pack_idx = jnp.nonzero(mask_flat, size=K,
                               fill_value=N_dense)[0]
        gather_idx = jnp.minimum(pack_idx, N_dense - 1)
        take = lambda a: jnp.take(a, gather_idx, axis=0)  # noqa: E731
        flat_p = take(flat_p)
        in_vd = take(in_vd)
        in_vd_orig = take(in_vd_orig)
        if jac is not None:
            jac = take(jac.reshape(-1, 3, 3))
        if not cfg.cano_view_dirs:
            flat_T = take(flat_T)

    # Implicit-differentiation correction: values unchanged, but gradients
    # w.r.t. skinning-net params flow as -J^-1 df/dtheta.
    if training and cfg.train_skinning_net:
        skin_fn = make_skin_fn(params, cfg)

        def fwd_batched(p_norm):
            x_hat = unnormalize_canonical_points(
                p_norm, frame.coord_min, frame.coord_max, frame.center)
            x_bar, _ = forward_skinning(skin_fn, frame, x_hat)
            return x_bar

        jac_metric = jac
        import os as _os
        from arah_tpu.render.ray_tracing import _pallas_ok
        if (jac_metric is None and cfg.idiff_standalone_jac
                and _pallas_ok()):
            # standalone one-shot Pallas Jacobian at the (packed)
            # shading points (ModelConfig.idiff_standalone_jac): exact
            # J entirely in VMEM, no XLA tangent passes. Falls through
            # to the linearize path for kernel-incompatible skinning
            # nets. Inputs are stop-gradded: J is stop-gradded below
            # either way, so the kernel needs no VJP rule.
            from arah_tpu.ops.pallas.corr_kernel_t import (
                skinning_dense_params, skinning_jac_pallas)
            sd = skinning_dense_params(
                jax.lax.stop_gradient(params['skinning']), cfg.skinning)
            if sd is not None:
                x_hat_ng = jax.lax.stop_gradient(
                    unnormalize_canonical_points(
                        flat_p, frame.coord_min, frame.coord_max,
                        frame.center))
                jac_metric = skinning_jac_pallas(
                    x_hat_ng, sd[0], sd[1],
                    frame.bone_transforms.reshape(24, 16),
                    frame.coord_min, frame.coord_max, frame.center,
                    softmax_scale=cfg.skinning.softmax_scale)

        if jac_metric is not None:
            # exact metric-space Jacobian at the points (corr-kernel
            # want_jac or the standalone kernel above; stop-gradded).
            # fwd_batched = fwd_skin o unnormalize, and unnormalize has
            # the constant (per-axis) scale s_u = 1.1*(cmax-cmin)/2, so
            # J_norm columns are the metric columns scaled by s_u — the
            # XLA graph then needs only the differentiable PRIMAL pass.
            s_u = 1.1 * (frame.coord_max - frame.coord_min) / 2.0
            J = jac_metric.reshape(-1, 3, 3) * s_u
            f = fwd_batched(flat_p)
        elif cfg.idiff_linearize:
            # ONE batched linearize: the primal skinning pass runs once
            # (its param gradients flow through `f` below), and the
            # Jacobian comes from three batched tangent passes — plain
            # (N, in) x (in, out) matmul chains, where
            # vmap(jacfwd(per-point)) lowers to awkward (N, 3, in)
            # generalized dots on TPU (same finding as
            # solver/root_find.py:forward_skinning_jac).
            # PRECONDITION: fwd_batched must be strictly pointwise across
            # the batch axis (point k's output depends only on point k's
            # input) — then the batched tangent with e_k broadcast to
            # every row recovers column k of each per-point Jacobian.
            # Any future batch-coupled op in skinning_weights /
            # forward_skinning breaks this; tests/test_renderer.py pins
            # both branches equal (TestIdiffLinearize).
            f, f_lin = jax.linearize(fwd_batched, flat_p)
            eye3 = jnp.eye(3, dtype=flat_p.dtype)
            J = jnp.stack([f_lin(jnp.broadcast_to(eye3[k], flat_p.shape))
                           for k in range(3)], axis=-1)
        else:
            # per-point jacfwd form (has_aux shares the primal)
            def fwd_aux(p_norm):
                x_bar = fwd_batched(p_norm[None])[0]
                return x_bar, x_bar
            J, f = jax.vmap(jax.jacfwd(fwd_aux, has_aux=True))(flat_p)
        J_inv = inv3x3(jax.lax.stop_gradient(J))
        flat_p = flat_p - jnp.einsum(
            'nab,nb->na', J_inv, f - jax.lax.stop_gradient(f))

    # SDF, features and spatial normals in one differentiable pass.
    # Forward-mode for the 3-d input gradient: same values as reverse mode,
    # but the parameter-backward becomes reverse-over-forward, which the
    # TPU compiler handles far better than reverse-over-reverse.
    def sdf_feat(p):
        out, feat = siren_apply(gen, p[None], return_features=True,
                                bf16=cfg.bf16_shading)
        return out[0, 0], (out[0, 0], feat[0])

    import os as _os
    from arah_tpu.render.ray_tracing import _pallas_ok
    fused_grad = (training and cfg.use_pallas_shade_grad
                  and gen.weights[0].ndim == 2
                  and _os.environ.get('ARAH_DISABLE_PALLAS') != '1')
    if fused_grad and _pallas_ok():
        # fused fwd+bwd kernel pair: same values as the XLA jacfwd path
        # (dot products reassociated), with a hand-written Pallas VJP for
        # every SIREN leaf and the points (ops/pallas/shade_grad_kernel.py)
        from arah_tpu.ops.pallas.shade_grad_kernel import siren_shade_grad
        # fwd tile capped at 512 with f32 residents: inside the train step
        # the fwd kernel at tile 1024 exceeds the 16 MB scoped-VMEM limit
        # (25.9 MB, v5e); bf16 residents halve that, so the cap lifts
        out_sdf, feats, grads = siren_shade_grad(
            gen, flat_p,
            tile=min(cfg.pallas_shade_tile,
                     1024 if cfg.shade_resid_bf16 else 512),
            tile_bwd=cfg.pallas_shade_grad_tile, bf16=cfg.bf16_shading,
            resid_bf16=cfg.shade_resid_bf16)
        sdf_norm = out_sdf[:, 0]
    elif fused_grad:
        # non-TPU backends: the pure-XLA twin with the same hand-written
        # VJP — 5.1x faster than the jacfwd+transpose autodiff path on
        # CPU (no (N, 3, hidden) tangent chain; 13.4 -> 2.6 s at 32k
        # flagship points). ARAH_DISABLE_PALLAS=1 escapes to autodiff.
        from arah_tpu.ops.pallas.shade_grad_kernel import \
            siren_shade_grad_xla
        out_sdf, feats, grads = siren_shade_grad_xla(
            gen, flat_p, bf16=cfg.bf16_shading)
        sdf_norm = out_sdf[:, 0]
    elif not training and cfg.use_pallas_shade and _pallas_ok():
        # fused Pallas kernel: SDF + features + analytic input-gradient in
        # one VMEM-resident pass (ops/pallas/shade_kernel.py). Same dot
        # products as the XLA path, reassociated; eval-only (no parameter
        # backward through pallas_call).
        from arah_tpu.ops.pallas.shade_kernel import siren_shade_pallas
        out_sdf, feats, grads = siren_shade_pallas(
            gen, flat_p, tile=cfg.pallas_shade_tile, bf16=cfg.bf16_shading,
            resid_bf16=cfg.shade_resid_bf16)
        sdf_norm = out_sdf[:, 0]
    elif training or jax.default_backend() == 'cpu':
        # training must stay forward-mode (reverse-over-forward parameter
        # backward); on CPU we also keep it — the reverse-mode eval graph
        # intermittently deadlocks the XLA:CPU thread pool in long test
        # sessions (values are identical either way)
        grads, (sdf_norm, feats) = jax.vmap(
            jax.jacfwd(sdf_feat, has_aux=True))(flat_p)
    else:
        # eval has no outer autodiff, so plain reverse mode is safe and
        # computes the 3-d input gradient with ONE cotangent pass instead
        # of three forward tangents: +3.5% eval throughput on v5e
        grads, (sdf_norm, feats) = jax.vmap(
            jax.grad(sdf_feat, has_aux=True))(flat_p)
    normal = grads
    if not cfg.cano_view_dirs:
        normal = jnp.einsum('nab,nb->na', flat_T[:, :3, :3], normal)

    if training and ray_augm:
        normal_n = jax.lax.stop_gradient(
            normal / jnp.linalg.norm(normal, axis=-1, keepdims=True))
        nv_dots = jnp.sum(normal_n * in_vd, axis=-1)
        invalid = jnp.arccos(jnp.clip(nv_dots, -1.0, 1.0)) >= jnp.pi / 2.0
        in_vd = jnp.where(invalid[:, None], in_vd_orig, in_vd)

    if not training:
        normal = jax.lax.stop_gradient(normal)
        feats = jax.lax.stop_gradient(feats)
        sdf_norm = jax.lax.stop_gradient(sdf_norm)
        flat_p = jax.lax.stop_gradient(flat_p)

    sdf_metric_vals = sdf_to_metric(sdf_norm, frame.coord_min, frame.coord_max)
    rgb = color_apply(params['color'], cfg.color, flat_p, normal, in_vd,
                      feats, pose_feature, bf16=cfg.bf16_shading)

    beta = deviation_value(params['deviation'])
    density = volsdf_density(sdf_metric_vals, beta)

    if packed:
        # scatter the packed results back to the dense slots (pad rows
        # carry index N_dense and are dropped; overflow-dropped valid
        # slots keep density 0 = no contribution). The scatter's
        # backward is the gather of the compositing cotangents.
        rgb = jnp.zeros((N_dense, 3), rgb.dtype) \
            .at[pack_idx].set(rgb, mode='drop')
        density = jnp.zeros((N_dense,), density.dtype) \
            .at[pack_idx].set(density, mode='drop')
    rgb = rgb.reshape(n_rays, S, 3)
    density = density.reshape(n_rays, S)

    # masked compositing in sample order — value-equivalent to the
    # reference's scatter-pack (`implicit_differentiable_renderer.py:
    # 284-289,366-396`) via pack_left+composite, but gather-free (the
    # argsort + 3 take_along_axis and their backward scatters cost
    # ~5 ms/step on v5e; z_vals' valid subsequence is already ascending)
    out = composite_masked(rgb, density, z_vals, converge_mask,
                           cfg.tracer.n_steps,
                           render_last_pt=cfg.render_last_pt)
    aux = {'n_samples_shaded': jnp.int32(K if packed else N_dense),
           'n_samples_overflow': n_overflow}
    return out.rgb, out.weights_sum, aux


def render(params, cfg: ModelConfig, inp: RenderInputs, key,
           training: bool = False):
    """Full renderer forward for one frame's ray block.

    Returns a dict mirroring `IDHRNetwork.forward` outputs
    (`implicit_differentiable_renderer.py:234-257`) plus `sdf_params` from
    the hypernetwork (`models/__init__.py:200-201`).
    """
    k_trace, k_eik = jax.random.split(key)

    # --- per-frame hypernetwork pass (cheap; weights shared by all rays)
    rots = inp.rots
    if training and inp.rots_noise is not None:
        rots = rots + inp.rots_noise
    gen = generate_sdf(params, cfg, rots, inp.Jtrs, inp.geo_latent)

    sdf_fn_ng = make_sdf_fn(gen, stop_grad=True)
    skin_fn_ng = make_skin_fn(params, cfg, stop_grad=True)

    # collapsed skinning weights for the fused Pallas corr kernel (TPU);
    # None when the architecture isn't kernel-compatible
    skin_dense = None
    if cfg.tracer.use_pallas_corr or cfg.tracer.use_pallas_iso:
        from arah_tpu.ops.pallas.corr_kernel_t import skinning_dense_params
        sd = skinning_dense_params(
            jax.lax.stop_gradient(params['skinning']), cfg.skinning)
        if sd is not None:
            skin_dense = (sd[0], sd[1], cfg.skinning.softmax_scale)

    # --- ray tracing (no gradients, like the reference's no_grad block)
    sdf_gen_ng = jax.lax.stop_gradient(gen) \
        if (cfg.tracer.use_pallas_march or cfg.tracer.use_pallas_iso) \
        else None
    want_jac = (training and cfg.train_skinning_net
                and cfg.idiff_kernel_jac and skin_dense is not None)
    trace = trace_and_sample(
        cfg.tracer, sdf_fn_ng, skin_fn_ng, inp.frame, inp.smpl,
        jnp.broadcast_to(inp.cam_loc, inp.ray_dirs.shape), inp.ray_dirs,
        inp.near, inp.far, k_trace, eval_mode=not training,
        skin_dense=skin_dense, sdf_gen=sdf_gen_ng, want_jac=want_jac)
    trace = jax.lax.stop_gradient(trace)
    samples = trace.samples

    # --- view-direction augmentation (training only)
    ray_dirs = inp.ray_dirs
    ray_augm = False
    if training and inp.view_noise is not None:
        if inp.view_noise.ndim == 2 and inp.view_noise.shape == (3, 3):
            ray_dirs = ray_dirs @ inp.view_noise.T
            ray_augm = True
        else:
            ray_dirs = ray_dirs + inp.view_noise

    pose_cond = dict(inp.pose_cond_extra)
    pose_cond.update({'rots_full': inp.rots_full,
                      'Jtrs_posed': inp.Jtrs_posed})
    pose_feature = color_pose_feature(params['color'], cfg.color, pose_cond)

    rgb_values, weights_sum, shade_aux = shade_samples(
        params, cfg, gen, inp.frame, samples.points_norm, samples.z_vals,
        samples.transforms, samples.converge_mask, ray_dirs, inp.ray_dirs,
        pose_feature, training, ray_augm=ray_augm, jac=samples.jac)

    out = {
        'rgb_values': rgb_values,                      # (N, 3)
        'weights_sum': weights_sum,                    # (N,)
        'network_body_mask': jnp.any(samples.converge_mask, axis=-1),
        # shaded-work telemetry (no silent caps): with shade_pack the
        # shading stages run on the packed K-budget subset (shaded);
        # overflow counts valid samples dropped by the static budget —
        # 0 in every measured configuration, see ModelConfig.shade_pack.
        # The reference boolean-indexes the same valid set
        # (`implicit_differentiable_renderer.py:284-296`).
        'n_samples_valid': jnp.sum(samples.converge_mask),
        'n_samples_dense': jnp.int32(samples.converge_mask.size),
        'n_samples_shaded': shade_aux['n_samples_shaded'],
        'n_samples_overflow': shade_aux['n_samples_overflow'],
        'surface_depth': trace.surface.start_dis,      # (N,)
        'surface_converged': ~trace.surface.unconverged,
        'surface_points_norm': trace.surface.points_norm,
        'sdf_params': hypernet_flat_params(gen),
        'deviation': deviation_value(params['deviation']),
    }

    if training:
        sdf_fn = make_sdf_fn(gen)
        # eikonal points: uniform in [-1,1]^3
        if inp.points_eik is not None:
            eik = inp.points_eik
        else:
            eik = (jax.random.uniform(k_eik, (cfg.n_eik_points, 3))
                   - 0.5) * 2.0
        # forward-mode spatial gradient (see shade_samples note); on TPU
        # the fused shading VJP kernel computes it (and its parameter
        # backward) without materializing the tangent chain
        import os as _os
        from arah_tpu.render.ray_tracing import _pallas_ok
        fused_eik = (cfg.use_pallas_shade_grad
                     and gen.weights[0].ndim == 2
                     and _os.environ.get('ARAH_DISABLE_PALLAS') != '1')
        if fused_eik and _pallas_ok():
            from arah_tpu.ops.pallas.shade_grad_kernel import \
                siren_shade_grad
            # bf16=False: the eikonal regularizer stays f32 like every
            # other regularizer (the XLA path's sdf_fn is f32 too)
            grad_eik = siren_shade_grad(
                gen, eik, tile=min(cfg.pallas_shade_tile, 1024),
                tile_bwd=cfg.pallas_shade_grad_tile, bf16=False)[2]
        elif fused_eik:
            from arah_tpu.ops.pallas.shade_grad_kernel import \
                siren_shade_grad_xla
            grad_eik = siren_shade_grad_xla(gen, eik, bf16=False)[2]
        else:
            grad_eik = jax.vmap(
                jax.jacfwd(lambda p: sdf_fn(p[None])[0]))(eik)
        out['grad_theta'] = grad_eik
        if inp.points_uniform is not None:
            out['off_surface_sdf'] = sdf_fn(inp.points_uniform)
        if inp.points_inside is not None:
            out['inside_sdf'] = sdf_fn(inp.points_inside)
        if inp.points_skinning is not None:
            skin_fn = make_skin_fn(params, cfg)
            p_norm = normalize_canonical_points(
                inp.points_skinning, inp.frame.coord_min,
                inp.frame.coord_max, inp.frame.center)
            out['pred_weights'] = skin_fn(p_norm)
    return out
