"""Analytic per-step FLOPs accounting for the flagship train/eval step.

MFU needs a *model-FLOPs* numerator that XLA's HLO cost model cannot
provide here: the hot loops are `while` loops with data-dependent trip
counts (Broyden/sphere-trace early exit) and Pallas custom calls whose
interior FLOPs XLA does not see. This module counts the matmul FLOPs
(2*m*n*k) of every block of the step analytically from the actual layer
shapes, with the solver iteration counts as explicit parameters.

Conventions / scope:
  * matmul FLOPs only (MXU work). VPU elementwise work (sines, softplus,
    compositing, losses, Adam) is excluded — standard MFU practice.
  * solver loops are charged `iters x per-iteration FLOPs`; pass the
    configured caps for a provisioned-work upper bound (`*_iters=cap`)
    or measured effective counts for executed-work MFU (see PERF.md
    "Effective solver iterations" for the calibrated bench-scene
    values and their derivation).
  * backward passes are charged the usual 2x forward (dW + dx matmuls).

Hot-loop counterparts in the reference:
`im2mesh/metaavatar_render/renderer/ray_tracing.py:174-296,403-461`
(march + corr), `implicit_differentiable_renderer.py:261-396` (shading).
"""
from __future__ import annotations


def mlp_fwd_flops(shapes) -> int:
    """Forward matmul FLOPs per point for a chain of (out, in) weights."""
    return sum(2 * int(o) * int(i) for o, i in shapes)


def siren_shade_fwd_flops(shapes) -> int:
    """Fused shading forward (ops/pallas/shade_kernel.py): primal chain
    over all L layers + the reverse normal chain over the L-1 sine
    layers (seeded from the SDF row, so the final layer costs nothing)."""
    full = mlp_fwd_flops(shapes)
    sine = mlp_fwd_flops(shapes[:-1])
    return full + sine


def siren_shade_bwd_flops(shapes) -> int:
    """Fused shading backward (ops/pallas/shade_grad_kernel.py):
    recompute primal (L-1) + normal chain (L-1) + adjoint-of-reverse
    tangent chain (L-1) + its dW accumulation (L-1) + primal-backward
    dW (L) + h-cotangent chain (L) + output-layer terms (~1)."""
    sine = mlp_fwd_flops(shapes[:-1])
    full = mlp_fwd_flops(shapes)
    return 4 * sine + 2 * full + 2 * mlp_fwd_flops(shapes[-1:])


def train_step_flops(*, n_rays: int, n_samples: int, n_verts: int,
                     siren_shapes, skin_shapes, color_shapes,
                     hypernet_params: int,
                     corr_iters: float, march_iters: float,
                     iso_iters: float,
                     n_eik: int = 1024, n_reg: int = 1024 * 3,
                     train_skinning_net: bool = True,
                     shade_frac: float = 1.0,
                     idiff_standalone: bool = False) -> dict:
    """Matmul-FLOPs breakdown of one flagship training step.

    siren_shapes/skin_shapes/color_shapes: [(out, in), ...] of the actual
    generated-SIREN / skinning-MLP / color-MLP weights.
    hypernet_params: total hypernetwork parameter count.
    shade_frac: fraction of dense (ray, sample) slots actually shaded
    (ModelConfig.shade_pack budget; scales the shading/color/implicit-
    diff blocks — the tracer still runs on every dense slot).
    idiff_standalone: the implicit-diff Jacobian comes from the one-shot
    kernel (primal + 3 tangent sweeps, no backward) instead of the XLA
    linearize whose tangent passes sit inside the differentiated graph.
    Returns {'total': float, 'blocks': {name: flops}}.
    """
    N_dense = n_rays * n_samples
    N = int(round(N_dense * shade_frac))
    skin = mlp_fwd_flops(skin_shapes)
    siren = mlp_fwd_flops(siren_shapes)
    color = mlp_fwd_flops(color_shapes)
    knn = 2 * 4 * n_verts          # [p|1] x [-2v ; |v|^2] per point
    lbs = 2 * 24 * 16              # weights x bone transforms per point

    blocks = {
        # differentiable shading: fused fwd + bwd kernels at N points
        'shade_fwd': N * siren_shade_fwd_flops(siren_shapes),
        'shade_bwd': N * siren_shade_bwd_flops(siren_shapes),
        # color MLP fwd + 2x bwd at N points
        'color': 3 * N * color,
        # canonical-correspondence Broyden: KNN+skinning init, then
        # (skinning fwd + LBS blend) per iteration per DENSE sample
        # point (the tracer runs before packing)
        'corr_init': N_dense * (knn + skin + lbs),
        'corr_loop': int(N_dense * corr_iters * (skin + lbs)),
        # sphere-trace march: KNN + skinning + LBS + SIREN per iteration
        # per ray (the march runs on ray heads, not samples)
        'march_loop': int(n_rays * march_iters * (knn + skin + lbs + siren)),
        # iso refinement: skinning + SIREN per iteration per ray, plus the
        # joint-linearize init Jacobian (1 primal + 3 tangent passes)
        'iso_init': n_rays * 4 * (skin + lbs + siren),
        'iso_loop': int(n_rays * iso_iters * (skin + lbs + siren)),
        # eikonal regularizer: fused shade fwd+bwd at n_eik points
        'eikonal': n_eik * (siren_shade_fwd_flops(siren_shapes)
                            + siren_shade_bwd_flops(siren_shapes)),
        # off-surface / inside / skinning regularizer points: SIREN or
        # skinning fwd + 2x bwd
        'reg_points': 3 * n_reg * (siren + skin),
        # per-frame hypernetwork fwd + 2x bwd (one pass per step)
        'hypernet': 3 * 2 * hypernet_params,
    }
    if train_skinning_net and idiff_standalone:
        # one-shot Jacobian kernel (primal + 3 tangent sweeps, no
        # backward) + the differentiable primal pass (fwd + 2x bwd)
        blocks['implicit_diff'] = N * 7 * (skin + lbs)
    elif train_skinning_net:
        # implicit-diff correction: jacfwd of forward_skinning at N
        # points (primal + 3 tangents) + the value pass, fwd and bwd
        blocks['implicit_diff'] = 3 * N * 5 * (skin + lbs)
    blocks = {k: float(v) for k, v in blocks.items()}
    return {'total': sum(blocks.values()), 'blocks': blocks}


def model_shapes(params, gen, color_key: str = 'color'):
    """Extract [(out, in), ...] weight shapes from live pytrees.

    gen: a GeneratedMLP (use `generate_sdf` once); params: the model
    param dict (skinning/color 'layers' with weight-norm or dense
    leaves).
    """
    w_of = lambda l: l['v'] if 'v' in l else l['w']
    siren_shapes = [tuple(w.shape) for w in gen.weights]
    skin_shapes = [tuple(w_of(l).shape)
                   for l in params['skinning']['layers']]
    color_shapes = [tuple(w_of(l).shape)
                    for l in params[color_key]['layers']]
    hyper = 0
    if 'hypernet' in params:
        import jax
        hyper = sum(x.size for x in jax.tree.leaves(params['hypernet']))
    return siren_shapes, skin_shapes, color_shapes, hyper
