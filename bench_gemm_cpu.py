#!/usr/bin/env python
"""Isolated-gemm CPU attribution (VERDICT r4 #4).

BENCH_CPU_ATTRIB pins the CPU like-for-like gap to the shading +
regularizers + backward + Adam block and *asserts* the residual is
XLA:CPU-vs-torch/MKL gemm efficiency. This script isolates that claim:
it times the exact dominant gemm shapes of the flagship shading block
(2048 rays x 64 samples; SIREN shade fwd/bwd + color MLP fwd/bwd +
weight-gradient contractions) under jitted XLA:CPU and under torch CPU
(MKL/oneDNN), f32 both sides, same thread budget, and writes the
per-shape and aggregate ratios into BENCH_GEMM_CPU.json — and, when
BENCH_BASELINE.json exists, embeds the summary there under
'isolated_gemm' so the like-for-like record carries its own attribution.

A ratio < 1 here is a CPU-backend library property (gemm codegen), not
a design defect the TPU target shares — the TPU path runs these same
contractions on the MXU at the measured mfu/hbm utilizations in
BENCH_r*.json.
"""
import json
import os
import time

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = 2048 * 64            # flagship bench points (2048 rays x 64 samples)
ITERS = int(os.environ.get('BB_ITERS', 4))

# (label, M, K, Nd, multiplicity) — multiplicity = uses per train step
# (fwd + backward-recompute + cotangent passes, PERF.md round-3 shading
# attribution; dW rows are the (K, M) x (M, Nd) tile contractions)
SHAPES = [
    ('siren_hidden (N,256)x(256,256)', N, 256, 256, 18),
    ('siren_in (N,3)x(3,256)', N, 3, 256, 3),
    ('color_l0 (N,417)x(417,256)', N, 417, 256, 3),
    ('color_skip (N,545)x(545,256)', N, 545, 256, 3),
    ('color_hidden (N,256)x(256,256)', N, 256, 256, 9),
    ('dW (256,N)x(N,256)', 256, N, 256, 12),
]


def t_best(f, *args):
    f(*args)                      # warm / compile
    best = float('inf')
    for _ in range(ITERS):
        t0 = time.perf_counter()
        f(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import torch
    torch.set_num_threads(os.cpu_count())
    rng = np.random.RandomState(0)
    rows = []
    for label, m, k, n, mult in SHAPES:
        a = rng.randn(m, k).astype(np.float32)
        b = rng.randn(k, n).astype(np.float32)
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        f_torch = lambda: torch.mm(ta, tb)
        ja, jb = jnp.asarray(a), jnp.asarray(b)
        f_x = jax.jit(lambda x, y: jnp.dot(x, y))
        f_xla = lambda: jax.block_until_ready(f_x(ja, jb))
        dt_t = t_best(lambda: f_torch())
        dt_x = t_best(lambda: f_xla())
        gflop = 2 * m * k * n / 1e9
        rows.append({
            'shape': label, 'gflop': round(gflop, 2),
            'uses_per_step': mult,
            'torch_ms': round(dt_t * 1e3, 2),
            'xla_ms': round(dt_x * 1e3, 2),
            'torch_gflops': round(gflop / dt_t, 1),
            'xla_gflops': round(gflop / dt_x, 1),
            'xla_over_torch': round(dt_t / dt_x, 3),
        })
        print(rows[-1], flush=True)

    # step-weighted aggregate: total gemm time per step on each side
    tot_t = sum(r['torch_ms'] * r['uses_per_step'] for r in rows)
    tot_x = sum(r['xla_ms'] * r['uses_per_step'] for r in rows)
    out = {
        'points': N, 'threads': os.cpu_count(),
        'per_shape': rows,
        'weighted_torch_ms_per_step': round(tot_t, 1),
        'weighted_xla_ms_per_step': round(tot_x, 1),
        'xla_over_torch_weighted': round(tot_t / tot_x, 3),
        'notes': ('xla_over_torch > 1 means XLA:CPU is FASTER. Shapes '
                  'and multiplicities approximate the flagship shading '
                  'block at 2048 rays; the ratio isolates gemm-library '
                  'efficiency from the like-for-like step ratio '
                  '(BENCH_BASELINE.json cpu_like_for_like_ratio).'),
    }
    with open('BENCH_GEMM_CPU.json', 'w') as f:
        json.dump(out, f, indent=1)
    if os.path.exists('BENCH_BASELINE.json'):
        with open('BENCH_BASELINE.json') as f:
            base = json.load(f)
        base['isolated_gemm'] = {
            'xla_over_torch_weighted': out['xla_over_torch_weighted'],
            'weighted_torch_ms_per_step': out[
                'weighted_torch_ms_per_step'],
            'weighted_xla_ms_per_step': out['weighted_xla_ms_per_step'],
            'source': 'bench_gemm_cpu.py (BENCH_GEMM_CPU.json)',
        }
        with open('BENCH_BASELINE.json', 'w') as f:
            json.dump(base, f, indent=1)
    print(json.dumps({'summary': out['xla_over_torch_weighted']}))


if __name__ == '__main__':
    main()
