"""Like-for-like CPU training-step benchmark: reference torch vs arah_tpu.

The reference repo publishes no throughput numbers (BASELINE.md), and no
CUDA GPU exists in this environment, so the honest baseline is a
*same-host, same-workload* comparison: both frameworks run one full
training step (forward + all-loss backward) of the FLAGSHIP ZJU model
(256x5 FiLM hypernet / 128x4 skinning / 256x5 color, 50-iter solvers,
64-step sampler, reference `configs/arah-zju/ZJUMOCAP-313_4gpus.yaml`)
on identical converted weights, an identical 6890-vertex synthetic body,
the same ray count and the same regularization-point counts, on this
host's CPU.

Writes BENCH_BASELINE.json with both rays/s numbers and their ratio;
bench.py reports that ratio as `vs_baseline` (framework-vs-framework at
equal hardware — NOT a TPU-vs-A100 claim, see the "method" field).

Run: python bench_baseline.py   [env: BB_RAYS=512 BB_ITERS=2]
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')   # like-for-like: CPU only

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'tests'))
sys.path.insert(0, os.path.dirname(__file__) or '.')

N_RAYS = int(os.environ.get('BB_RAYS', 512))
ITERS = int(os.environ.get('BB_ITERS', 2))
N_VERTS = 6890                      # real SMPL vertex count
# reference flagship loss weights (ZJUMOCAP-313_4gpus.yaml:54-56 +
# default.yaml:62-69; mask_weight 0 in the flagship config)
W = dict(rgb=30.0, perceptual=0.0, eikonal=50.0, mask=0.0,
         off_surface=100.0, inside=10.0, params=100.0, skinning=10.0)


def shared_inputs(scene, rng):
    n = N_RAYS
    return dict(
        pts_uniform=((rng.rand(1, 1024, 3) - 0.5) * 2.0).astype(np.float32),
        pts_inside=((rng.rand(64, 3) - 0.5) * 0.2).astype(np.float32),
        pts_skinning=(scene['msv'][rng.randint(0, len(scene['msv']), 128)]
                      + rng.randn(128, 3).astype(np.float32) * 0.01
                      ).astype(np.float32)[None],
        sw_gt=rng.rand(1, 128, 24).astype(np.float32),
        rgb_gt=rng.rand(1, n, 3).astype(np.float32),
        body_mask=(rng.rand(1, n) > 0.4).astype(np.float32))


def bench_torch(scene, shared, modules):
    import types

    import torch

    if 'lpips' not in sys.modules:     # unused at perceptual_weight=0
        stub = types.ModuleType('lpips')
        stub.LPIPS = object
        sys.modules['lpips'] = stub
    import importlib
    loss_mod = importlib.import_module(
        'im2mesh.metaavatar_render.renderer.loss')

    torch.set_num_threads(os.cpu_count() or 4)
    sdf_decoder, skinning_model, color, deviation, idhr = modules
    idhr.train()
    idhr.train_skinning_net = True
    # flagship tracer (BodyRayTracing defaults == ZJU flagship:
    # 50 sphere-trace iters, 64 steps, 16+1+16 surface samples)
    import im2mesh.metaavatar_render.renderer.ray_tracing as rt_mod
    idhr.ray_tracer = rt_mod.BodyRayTracing(
        root_finding_threshold=1e-5, n_steps=64,
        near_surface_vol_samples=16, far_surface_vol_samples=16,
        sample_bg_pts=0)

    # shaded-point instrumentation: the reference boolean-indexes the
    # converged sample set before shading (get_rbg_value_vol_sdf,
    # `implicit_differentiable_renderer.py:284-296`); count what it
    # actually shades per step
    shade_counts = {'valid': 0, 'candidate': 0, 'calls': 0}
    orig_shade = idhr.get_rbg_value_vol_sdf

    def counting_shade(*a, **k):
        cm = a[4] if len(a) > 4 else k['converge_mask']
        shade_counts['valid'] += int(cm.sum())
        shade_counts['candidate'] += int(cm.numel())
        shade_counts['calls'] += 1
        return orig_shade(*a, **k)

    idhr.get_rbg_value_vol_sdf = counting_shade

    criteria = loss_mod.IDHRLoss(
        rgb_weight=W['rgb'], perceptual_weight=W['perceptual'],
        eikonal_weight=W['eikonal'], mask_weight=W['mask'],
        off_surface_weight=W['off_surface'], inside_weight=W['inside'],
        params_weight=W['params'], skinning_weight=W['skinning'],
        rgb_loss_type='l1')

    s, sh = scene, shared
    tt = lambda x: torch.tensor(np.asarray(x), dtype=torch.float32)
    inputs_const = {
        'ray_dirs': tt(s['dirs'])[None],
        'cam_loc': tt(s['cam'])[None],
        'pose': torch.eye(4)[None],
        'body_mask': tt(sh['body_mask']),
        'body_bounds_intersections': tt(np.stack(
            [s['near'], s['far']], -1))[None],
        'loc': torch.zeros(1, 1, 3),
        'sc_factor': torch.ones(1, 1, 1),
        'smpl_verts': tt(s['verts_world'])[None],
        'skinning_weights': tt(s['sw'])[None],
        'vol_feat': torch.empty(1, 0),
        'bone_transforms': tt(s['bone_transforms'])[None],
        'trans': tt(s['trans'])[None, None],
        'coord_min': torch.tensor([float(s['cmin'])]),
        'coord_max': torch.tensor([float(s['cmax'])]),
        'center': tt(s['center'])[None, None],
        'minimal_shape': tt(s['msv'])[None],
        'points_uniform': tt(sh['pts_uniform']),
        'points_inside': tt(sh['pts_inside']),
        'points_skinning': tt(sh['pts_skinning']),
        'pose_cond': {'rots_full': tt(s['rots_full'])[None],
                      'Jtrs_posed': tt(s['Jtr_posed'])[None],
                      'latent_code': tt(s['latent'])},
    }
    gt = {'rgb': tt(sh['rgb_gt']), 'sampled_weights': tt(sh['sw_gt'])}
    mods = [sdf_decoder, skinning_model, color, deviation]

    def step():
        for m in mods:
            m.zero_grad(set_to_none=True)
        dec_out = sdf_decoder({
            'coords': torch.zeros(1, 1, 3),
            'rots': tt(s['rots_local'])[None],
            'Jtrs': tt(s['Jtr_norm'])[None],
            'latent': tt(s['latent'])})
        inputs = dict(inputs_const)
        inputs['sdf_network'] = dec_out['decoder']
        out = idhr(inputs)
        out['sdf_params'] = dec_out['params']
        losses = criteria(out, gt)
        losses['loss'].backward()
        return float(losses['loss'])

    loss0 = step()                      # warmup
    shade_counts.update(valid=0, candidate=0, calls=0)

    def timed_step():
        t0 = time.perf_counter()
        step()
        return time.perf_counter() - t0

    def counts():
        n = max(shade_counts['calls'], 1.0)
        return {k: v / n for k, v in shade_counts.items()
                if k != 'calls'} | {'calls': 1.0}
    return timed_step, loss0, counts


def bench_ours(scene, shared, params):
    import jax.numpy as jnp

    from test_pixel_parity import model_config
    from arah_tpu.render.ray_tracing import (CanonicalFrame,
                                             RayTracerConfig, SmplRef)
    from arah_tpu.render.renderer import RenderInputs, render
    from arah_tpu.train.loss import LossWeights, compute_loss

    s, sh = scene, shared
    # corr_chunk 1024 is the CPU-tuned solver chunk (16384 on TPU); the
    # reference likewise picks chunk sizes per device (low_vram flag).
    # BB_SPLIT=k enables the straggler-resolve splits (value-identical
    # two-phase solves, ray_tracing._corr_solve_split and friends) —
    # they bound every chunk/loop at k iterations, which helps the CPU
    # backend exactly like the TPU kernels.
    split = int(os.environ.get('BB_SPLIT', 0))
    cfg = model_config('flagship')._replace(
        train_skinning_net=True,
        tracer=RayTracerConfig(
            corr_chunk=int(os.environ.get('BB_CORR_CHUNK', 1024)),
            corr_phase1_steps=split, march_phase1_steps=split,
            iso_phase1_steps=split))

    frame = CanonicalFrame(
        bone_transforms=jnp.asarray(s['bone_transforms']),
        trans=jnp.asarray(s['trans']),
        coord_min=jnp.asarray(s['cmin']),
        coord_max=jnp.asarray(s['cmax']),
        center=jnp.asarray(s['center']))
    smpl_ref = SmplRef(verts_posed=jnp.asarray(s['verts_world']),
                       skinning_weights=jnp.asarray(s['sw']))
    inp = RenderInputs(
        cam_loc=jnp.asarray(s['cam']),
        ray_dirs=jnp.asarray(s['dirs']),
        near=jnp.asarray(s['near']), far=jnp.asarray(s['far']),
        frame=frame, smpl=smpl_ref,
        rots=jnp.asarray(s['rots_local'])[None],
        Jtrs=jnp.asarray(s['Jtr_norm'])[None],
        rots_full=jnp.asarray(s['rots_full'])[None],
        Jtrs_posed=jnp.asarray(s['Jtr_posed'])[None],
        pose_cond_extra={'latent_code': jnp.asarray(s['latent'])},
        geo_latent=jnp.asarray(s['latent'][0]),
        points_uniform=jnp.asarray(sh['pts_uniform'].reshape(-1, 3)),
        points_inside=jnp.asarray(sh['pts_inside']),
        points_skinning=jnp.asarray(sh['pts_skinning'][0]))
    lw = LossWeights(rgb=W['rgb'], perceptual=W['perceptual'],
                     eikonal=W['eikonal'], mask=W['mask'],
                     off_surface=W['off_surface'], inside=W['inside'],
                     params=W['params'], skinning=W['skinning'],
                     rgb_loss_type='l1', n_ray_loss=N_RAYS)
    gt = {'rgb': jnp.asarray(sh['rgb_gt'][0]),
          'body_mask': jnp.asarray(sh['body_mask'][0].astype(np.int32)),
          'sampled_weights': jnp.asarray(sh['sw_gt'][0])}

    def loss_fn(p, key):
        out = render(p, cfg, inp, key, training=True)
        return compute_loss(out, gt, lw)['loss'], out['n_samples_valid']

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    key = jax.random.PRNGKey(1)
    (loss0, n_valid), grads = grad_fn(params, key)
    jax.block_until_ready(grads)        # warmup (incl. compile)
    it = iter(range(1 << 20))

    def timed_step():
        t0 = time.perf_counter()
        (_, nv), grads = grad_fn(params, jax.random.fold_in(key, next(it)))
        jax.block_until_ready(grads)
        return time.perf_counter() - t0

    counts = {'valid': float(n_valid),
              'dense': float(N_RAYS * cfg.tracer.n_steps)}
    return timed_step, float(loss0), lambda: counts


def main():
    from test_pixel_parity import (build_reference_modules, build_scene,
                                   convert_params)
    scene = build_scene(n_verts=N_VERTS, n_rays=N_RAYS)
    rng = np.random.RandomState(7)
    shared = shared_inputs(scene, rng)
    shared['sw_gt'] /= shared['sw_gt'].sum(-1, keepdims=True)

    modules = build_reference_modules('flagship')
    sdf_decoder, skinning_model, color, deviation, _ = modules
    params = convert_params(sdf_decoder, skinning_model, color, deviation,
                            'flagship')

    # interleave the timed steps (ref, ours, ref, ours, ...): same-host
    # CPU throughput drifts across minutes (other tenants), so paired
    # alternation is the only drift-fair protocol; medians per side
    ours_step, ours_loss, ours_counts_fn = bench_ours(
        scene, shared, params)
    ref_step, ref_loss, ref_counts_fn = bench_torch(scene, shared, modules)
    # both sides take several steps to reach steady state (torch's
    # allocator/thread pools warm across STEPS, not just the first call:
    # round-3 ref pair seconds declined 90 -> 17 s monotonically) — burn
    # two untimed steps per side so timed pairs measure steady state
    for _ in range(2):
        ref_step()
        ours_step()
    ours_ts, ref_ts, pair_ratios = [], [], []
    for k in range(ITERS):
        # alternate order within pairs: host throughput trends on a
        # minutes scale (measured 2x within one run), so a fixed order
        # biases whichever side runs second
        if k % 2 == 0:
            ref_ts.append(ref_step())
            ours_ts.append(ours_step())
        else:
            ours_ts.append(ours_step())
            ref_ts.append(ref_step())
        pair_ratios.append(ref_ts[-1] / ours_ts[-1])
        print(f'pair {k}: ref {ref_ts[-1]:.1f}s ours {ours_ts[-1]:.1f}s '
              f'ratio {pair_ratios[-1]:.3f}', flush=True)
    ours_dt = float(np.median(ours_ts))
    ref_dt = float(np.median(ref_ts))
    ours_rps, ref_rps = N_RAYS / ours_dt, N_RAYS / ref_dt
    ours_counts, ref_counts = ours_counts_fn(), ref_counts_fn()
    print(f'arah_tpu (XLA:CPU): {ours_rps:.1f} rays/s '
          f'({ours_dt:.2f} s/step, loss {ours_loss:.3e}, '
          f'shaded {ours_counts})', flush=True)
    print(f'reference (torch CPU): {ref_rps:.1f} rays/s '
          f'({ref_dt:.2f} s/step, loss {ref_loss:.3e}, '
          f'shaded {ref_counts})', flush=True)

    ours_dense = ours_counts['dense']
    ref_shaded = max(ref_counts['valid'], 1.0)
    out = {
        'method': ('same-host CPU, identical flagship nets/weights/scene '
                   '(6890-vert body), identical ray+reg-point counts, one '
                   'full train step fwd+bwd; ratio = arah_tpu / reference'),
        'hardware': f'CPU x{os.cpu_count()}',
        'n_rays': N_RAYS,
        'iters': ITERS,
        'protocol': 'interleaved pairs, median per side',
        'ref_torch_cpu_rays_s': round(ref_rps, 2),
        'ref_torch_cpu_s_per_step': round(ref_dt, 3),
        'arah_tpu_cpu_rays_s': round(ours_rps, 2),
        'arah_tpu_cpu_s_per_step': round(ours_dt, 3),
        'cpu_like_for_like_ratio': round(
            float(np.median(pair_ratios)), 3),
        'pair_ratios': [round(r, 3) for r in pair_ratios],
        'ref_pair_seconds': [round(t, 1) for t in ref_ts],
        'ours_pair_seconds': [round(t, 1) for t in ours_ts],
        # shaded-work accounting: the dense design shades every
        # (ray, sample) slot; the reference boolean-indexes the converged
        # set. Normalizing each side's step time by the points it
        # actually pushes through the SIREN+color stage gives the
        # per-shaded-point throughput ratio.
        'arah_shaded_points_per_step_dense': ours_dense,
        'arah_valid_points_per_step': ours_counts['valid'],
        'ref_shaded_points_per_step': ref_shaded,
        'dense_vs_adaptive_point_ratio': round(ours_dense / ref_shaded, 3),
        'per_shaded_point_throughput_ratio': round(
            (ours_dense / ours_dt) / (ref_shaded / ref_dt), 3),
        'arah_loss': float(ours_loss),
        'ref_loss': float(ref_loss),
        # the flagship synthetic-init scene drives the off-surface
        # exp(-100*sdf) term past f32 range on BOTH frameworks (train/
        # loss.py:161 == reference loss.py:104-106) — identical +inf on
        # both sides is a values-match, not a mismatch
        'loss_rel_err': (0.0 if ours_loss == ref_loss else
                         float(abs(ours_loss - ref_loss)
                               / max(abs(ref_loss), 1e-12))),
        'loss_values_match': bool(
            ours_loss == ref_loss
            or abs(ours_loss - ref_loss)
            <= 1e-5 * max(abs(ref_loss), 1e-12)),
        'notes': ('The reference publishes no GPU throughput numbers and '
                  'no CUDA device exists here, so the A100 target in '
                  'BASELINE.json is unmeasurable; this same-host CPU ratio '
                  'is the only like-for-like framework comparison '
                  'available. arah_tpu shades dense fixed-shape (N,64) '
                  'sample blocks (a TPU/MXU-oriented design), while the '
                  'reference boolean-indexes the adaptive active set — '
                  'the dense/adaptive point counts above quantify that '
                  'trade; the per-shaded-point ratio is the '
                  'work-normalized framework comparison. On TPU the dense '
                  'design is what makes the MXU usable (PERF.md, '
                  'BENCH_r*.json). Protocol (round 4): two untimed '
                  'steady-state warmup steps per side — round 3 timed '
                  'torch mid-warmup (pair seconds declining 90->17 s), '
                  'flattering the ratio; stage attribution lives in '
                  'BENCH_CPU_ATTRIB.json (the tracer is ~3 of ~28 s; the '
                  'residual gap is XLA:CPU-vs-MKL gemm efficiency in the '
                  'shading/backward block).'),
    }
    with open(os.path.join(os.path.dirname(__file__) or '.',
                           'BENCH_BASELINE.json'), 'w') as f:
        json.dump(out, f, indent=2)
        f.write('\n')
    print(json.dumps(out))


if __name__ == '__main__':
    main()
