#!/usr/bin/env python
"""VPU transcendental-cost microbench (round-6 roadmap evidence).

The round-5 profile shows the fused shade pair at ~56 ms/step while its
MXU work is ~1.5 ms and its HBM traffic ~1 GB — the hypothesis is that
Mosaic's sin/cos lowering dominates (2 transcendentals per element per
sine layer). This kernel isolates that: one Pallas pass over (N, 256)
computing (a) elementwise multiply-add only, (b) + sin, (c) + sin and
cos — the deltas price one transcendental on this chip and bound the
shade pair's light-speed. Timing uses the host-fetch barrier
(PERF.md round-5 "Measurement-integrity").

Usage: python bench_vpu_sin.py [--n 524288] [--iters 20]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_fn(mode: str, tile: int):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        # 5 "layers" like the flagship SIREN chain
        acc = jnp.zeros_like(x)
        for i in range(5):
            u = 1.3 * x + 0.1 * i
            if mode == 'mul':
                acc = acc + u * 0.5
            elif mode == 'sin':
                acc = acc + jnp.sin(30.0 * u)
            else:  # sincos
                acc = acc + jnp.sin(30.0 * u) + jnp.cos(30.0 * u)
            x = u
        o_ref[:] = acc

    @jax.jit
    def run(x):
        n = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
    return run


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=524288)
    p.add_argument('--iters', type=int, default=20)
    p.add_argument('--tile', type=int, default=1024)
    p.add_argument('--dtype', default='f32', choices=['f32', 'bf16'])
    args = p.parse_args()
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(args.n, 256).astype(np.float32))
    if args.dtype == 'bf16':
        x = x.astype(jnp.bfloat16)
    results = {}
    for mode in ('mul', 'sin', 'sincos'):
        f = make_fn(mode, args.tile)
        np.asarray(f(x)[:1, :1])               # compile + barrier
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = f(x)
        # device-side slice first: fetching the full array would
        # time the ~25 MB/s tunnel, not the kernel
        np.asarray(y[:1, :1])
        dt = (time.perf_counter() - t0) / args.iters
        results[mode] = dt * 1e3
        n_elem = 5 * args.n * 256
        print(f'{mode:7s} {dt*1e3:7.2f} ms  '
              f'({n_elem / dt / 1e9:.1f} Gelem/s)', flush=True)
    n_elem = 5 * args.n * 256
    sin_rate = n_elem / ((results['sin'] - results['mul']) / 1e3) / 1e9
    pair_rate = n_elem / ((results['sincos'] - results['mul']) / 1e3) \
        / 1e9
    print(f'~{sin_rate:.0f} G sin/s; ~{pair_rate:.0f} G (sin+cos '
          f'pairs)/s. Flagship shade pair: ~1.34 G sin+cos pairs in '
          f'the fwd kernel alone -> its transcendental floor is '
          f'~{1.34 / pair_rate * 1e3:.0f} ms of the measured kernel '
          f'time (PERF.md round-5 profile).')


if __name__ == '__main__':
    main()
