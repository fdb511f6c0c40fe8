"""Benchmark: rays/s/chip of the flagship (ZJU full-size) model on
synthetic assets. Prints ONE JSON line {"metric","value","unit",
"vs_baseline"}.

Two phases:
  1. eval-render throughput (fwd, chunked full-frame rendering path) —
     compiles in ~20 s, always reported on failure of phase 2;
  2. training-step throughput (fwd+bwd+optimizer) — attempted in a
     subprocess under BENCH_TRAIN_TIMEOUT (default 1200 s) because the
     axon remote-compile of the big backward graph can be slow; when it
     completes, its number is reported (the BASELINE.json headline
     metric).

The reference publishes no throughput numbers (BASELINE.md); vs_baseline
compares against `baseline_rays_s` in BENCH_BASELINE.json when present
(to be filled with a measured A100 reference run), else 0.0.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np



def apply_env_overrides(cfg):
    """Ablation knobs shared by the train and eval benches."""
    if os.environ.get('BENCH_BF16') in ('0', '1'):
        cfg = cfg._replace(bf16_shading=os.environ['BENCH_BF16'] == '1')
    if os.environ.get('BENCH_NO_PALLAS_CORR') == '1':
        cfg = cfg._replace(
            tracer=cfg.tracer._replace(use_pallas_corr=False))
    if os.environ.get('BENCH_CORR_TILE'):
        cfg = cfg._replace(tracer=cfg.tracer._replace(
            pallas_corr_tile=int(os.environ['BENCH_CORR_TILE'])))
    if os.environ.get('BENCH_ISO_TILE'):
        cfg = cfg._replace(tracer=cfg.tracer._replace(
            pallas_iso_tile=int(os.environ['BENCH_ISO_TILE'])))
    if os.environ.get('BENCH_PALLAS_ISO') in ('0', '1'):
        cfg = cfg._replace(tracer=cfg.tracer._replace(
            use_pallas_iso=os.environ['BENCH_PALLAS_ISO'] == '1'))
    if os.environ.get('BENCH_XLA_ONLY') == '1':
        cfg = cfg._replace(tracer=cfg.tracer._replace(
            use_pallas_corr=False, use_pallas_march=False,
            use_pallas_iso=False))
    return cfg


def device_peaks():
    """(peak_matmul_flops_per_s, peak_hbm_bytes_per_s) for the local chip.

    Public per-chip specs; bf16 MXU peak is the MFU convention (the step
    mixes bf16 and f32-HIGHEST matmuls, so this is the conservative
    denominator — f32 passes can never exceed it).
    """
    import jax
    kind = jax.devices()[0].device_kind.lower()
    table = [
        ('v5 lite', (197e12, 819e9)),   # v5e
        ('v5e', (197e12, 819e9)),
        ('v5p', (459e12, 2765e9)),
        ('v5', (459e12, 2765e9)),
        ('v6 lite', (918e12, 1640e9)),  # Trillium
        ('v6e', (918e12, 1640e9)),
        ('v4', (275e12, 1228e9)),
        ('v3', (123e12, 900e9)),
    ]
    for key, peaks in table:
        if key in kind:
            return peaks
    return (0.0, 0.0)   # unknown chip: report mfu 0 rather than a lie


TRAIN_SNIPPET = r'''
import json, os, time, sys
sys.path.insert(0, os.getcwd())
import numpy as np
import jax, jax.numpy as jnp
from arah_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _flagship_config, _build_scene
from arah_tpu.data.batch import synthetic_train_batch
from arah_tpu.parallel.train_step import TrainState, make_train_step
from arah_tpu.train.loss import LossWeights
from arah_tpu.train.optim import OptimConfig, make_optimizer

# 8192 = the knee of the per-chip batch-size curve (bench_batch.py,
# PERF.md round 4: 2048->25.2k, 8192->28.4k, 16384->28.8k rays/s;
# +12% over 2048 from amortizing Adam/hypernet/dispatch overheads,
# 16384 adds +1.4% at 2x the step latency). Reference loss semantics
# fix rays-per-IMAGE, not per-step, so denominators are unchanged.
n_rays = int(os.environ.get('BENCH_RAYS', 8192))
iters = int(os.environ.get('BENCH_ITERS', 5))
rounds = int(os.environ.get('BENCH_ROUNDS', 5))
cfg = _flagship_config()
from bench import apply_env_overrides, device_peaks
cfg = apply_env_overrides(cfg)
params, fd, _ = _build_scene(cfg, n_rays=16)
batch = synthetic_train_batch(jax.random.PRNGKey(1), fd, n_blocks=1,
                              n_rays=n_rays, n_reg=1024)
loss_w = LossWeights(n_ray_loss=n_rays)
optimizer, _ = make_optimizer(OptimConfig(train_skinning_net=True), params)
state = TrainState(params, jax.jit(optimizer.init)(params), jnp.int32(0))
step = make_train_step(cfg, loss_w, optimizer)
key = jax.random.PRNGKey(2)

# ---- analytic per-step FLOPs (arah_tpu/utils/flops.py). XLA's HLO cost
# model cannot count this step (data-dependent while trip counts, Pallas
# custom calls), so we bound MFU: `flops_deterministic` counts only the
# blocks with static work (shading fwd+bwd, color, inits, eikonal,
# regularizers, hypernet, implicit diff) -> a hard LOWER bound on
# executed FLOPs; `flops_at_caps` charges every solver loop its
# configured max iterations -> an upper bound.
from arah_tpu.utils.flops import model_shapes, train_step_flops
from arah_tpu.render.renderer import generate_sdf
gen0 = generate_sdf(params, cfg, fd.rots, fd.Jtrs, params['latent'][0])
siren_s, skin_s, color_s, hyper_p = model_shapes(params, gen0)
common = dict(n_rays=n_rays, n_samples=cfg.tracer.n_steps, n_verts=6890,
              siren_shapes=siren_s, skin_shapes=skin_s,
              color_shapes=color_s, hypernet_params=hyper_p,
              train_skinning_net=True,
              shade_frac=cfg.shade_pack_frac if cfg.shade_pack else 1.0,
              idiff_standalone=(cfg.idiff_standalone_jac
                                and jax.default_backend() == 'tpu'))
f_lo = train_step_flops(corr_iters=0, march_iters=0, iso_iters=0,
                        **common)
f_hi = train_step_flops(corr_iters=cfg.tracer.corr_max_steps,
                        march_iters=cfg.tracer.sphere_tracing_iters,
                        iso_iters=cfg.tracer.iso_max_steps, **common)
# measured-work MFU: calibrated effective solver iteration counts
# (bench_iters.py: per-point first-convergence iterations aggregated
# with the kernels' tile-max cost semantics on this bench scene)
f_eff = eff = None
eff_path = os.path.join(os.getcwd(), 'EFFECTIVE_ITERS.json')
if os.path.exists(eff_path):
    with open(eff_path) as f:
        eff = json.load(f)
    f_eff = train_step_flops(corr_iters=eff['corr'],
                             march_iters=eff['march'],
                             iso_iters=eff['iso'], **common)

# HBM bytes from XLA's model (custom-call operands/results included;
# while-loop bodies counted once -> lower bound)
hbm_bytes = None
try:
    cost = step.lower(state, batch, key).compile().cost_analysis()
    if cost:
        hbm_bytes = float(cost.get('bytes accessed', 0.0)) or None
except Exception as e:
    print('cost_analysis unavailable:', e, file=sys.stderr)

state, losses = step(state, batch, key)
float(losses['loss'])
# median over BENCH_ROUNDS timed rounds (the axon-tunnelled TPU's
# wall-clock drifts; a single window is not a measurement — PERF.md).
# Round-5 finding: the timing barrier is a HOST FETCH of the last
# round's loss, NOT block_until_ready — under the axon tunnel
# block_until_ready can return before remote execution finishes (a
# 279 s backlog was observed draining behind "complete" dispatches);
# the device executes in-order, so fetching the last scalar waits for
# the whole timed block.
per_round = []
i = 0
for r in range(rounds):
    t0 = time.perf_counter()
    for _ in range(iters):
        state, losses = step(state, batch, jax.random.fold_in(key, i))
        i += 1
    float(losses['loss'])
    per_round.append((time.perf_counter() - t0) / iters)
if min(per_round) < n_rays / 5e5:
    print('BENCH ERROR: impossible step time measured — execution '
          'barrier broken', file=sys.stderr)
    sys.exit(4)
dt = float(np.median(per_round))
peak_flops, peak_hbm = device_peaks()
out = {'rays_per_s': n_rays / dt, 'step_ms': dt * 1e3,
       'rays_per_step': n_rays,
       'rounds_rays_per_s': [round(n_rays / d, 1) for d in per_round],
       'flops_per_step_deterministic': f_lo['total'],
       'flops_per_step_at_solver_caps': f_hi['total']}
if peak_flops:
    out['mfu'] = f_lo['total'] / dt / peak_flops
    out['mfu_at_solver_caps'] = f_hi['total'] / dt / peak_flops
    if f_eff is not None:
        out['mfu_effective'] = f_eff['total'] / dt / peak_flops
        out['flops_per_step_effective'] = f_eff['total']
        out['solver_iters_effective'] = {k: eff[k]
                                         for k in ('march', 'iso', 'corr')}
if hbm_bytes:
    out['hbm_bytes_per_step'] = hbm_bytes
    if peak_hbm:
        out['hbm_util'] = hbm_bytes / dt / peak_hbm
print('BENCH_TRAIN_RESULT ' + json.dumps(out))
'''


def eval_bench():
    import jax
    import jax.numpy as jnp
    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config, _build_scene
    from arah_tpu.render.renderer import render

    n_rays = int(os.environ.get('BENCH_EVAL_RAYS', 8192))
    iters = int(os.environ.get('BENCH_ITERS', 5))
    cfg = _flagship_config()
    cfg = apply_env_overrides(cfg)
    params, fd, inp = _build_scene(cfg, n_rays=n_rays)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def run(params, inp):
        out = render(params, cfg, inp, key, training=False)
        return out['rgb_values'], out['weights_sum']

    import numpy as _np

    out = run(params, inp)
    _np.asarray(out[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(params, inp)
    # host fetch as barrier (see TRAIN_SNIPPET note); identical-dispatch
    # replay is irrelevant here only because timing uses the fetch
    _np.asarray(out[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    return n_rays / dt


def main():
    result = None

    # fail fast + attributably if the device backend is down (the axon
    # TPU tunnel can go UNAVAILABLE; jax init then hangs indefinitely)
    probe_timeout = float(os.environ.get('BENCH_PROBE_TIMEOUT', 180))
    if probe_timeout > 0:
        try:
            proc = subprocess.run(
                [sys.executable, '-c',
                 'import jax; jax.devices(); print("ok")'],
                capture_output=True, text=True, timeout=probe_timeout)
            ok = 'ok' in proc.stdout
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print('BENCH ERROR: device backend unavailable '
                  '(jax.devices() probe failed/hung) — no measurement '
                  'taken', file=sys.stderr)
            sys.exit(3)

    train_timeout = float(os.environ.get('BENCH_TRAIN_TIMEOUT', 1800))
    extra = {}
    if train_timeout > 0:
        try:
            proc = subprocess.run(
                [sys.executable, '-c', TRAIN_SNIPPET],
                capture_output=True, text=True, timeout=train_timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            for line in proc.stdout.splitlines():
                if line.startswith('BENCH_TRAIN_RESULT '):
                    payload = json.loads(line.split(' ', 1)[1])
                    result = ('train_rays_per_s_per_chip_fwd_bwd',
                              payload.pop('rays_per_s'))
                    extra = payload
        except subprocess.TimeoutExpired:
            pass

    if result is None:
        rays_s = eval_bench()
        result = ('eval_rays_per_s_per_chip', rays_s)

    metric, value = result
    # vs_baseline: the same-host like-for-like framework ratio measured by
    # bench_baseline.py (arah_tpu / reference-torch, identical flagship
    # train step on this host's CPU — the reference publishes no GPU
    # numbers and no CUDA device exists here; see BENCH_BASELINE.json
    # "method"/"notes").
    vs, method = 0.0, 'unmeasured'
    here = os.path.dirname(os.path.abspath(__file__))
    bpath = os.path.join(here, 'BENCH_BASELINE.json')
    if os.path.exists(bpath):
        with open(bpath) as f:
            bb = json.load(f)
        vs = float(bb.get('cpu_like_for_like_ratio', 0.0))
        method = ('same-host CPU like-for-like TRAIN-step ratio '
                  '(BENCH_BASELINE.json; fixed measurement, not '
                  'rescaled by this run)')

    out = {
        'metric': metric,
        'value': round(value, 2),
        'unit': 'rays/s',
        'vs_baseline': round(vs, 3),
        'vs_baseline_method': method,
        'measurement': 'median of %s rounds x %s iters, one process'
                       % (os.environ.get('BENCH_ROUNDS', 5),
                          os.environ.get('BENCH_ITERS', 5)),
    }
    for k in ('mfu', 'mfu_effective', 'mfu_at_solver_caps', 'hbm_util'):
        if k in extra:
            out[k] = round(extra[k], 4)
    for k in ('flops_per_step_deterministic', 'flops_per_step_effective',
              'flops_per_step_at_solver_caps', 'solver_iters_effective',
              'hbm_bytes_per_step', 'step_ms', 'rounds_rays_per_s',
              'rays_per_step'):
        if k in extra:
            out[k] = extra[k]
    print(json.dumps(out))


if __name__ == '__main__':
    main()
