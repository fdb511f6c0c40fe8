#!/usr/bin/env python
"""Drift-robust ablation bench: measures configurations INTERLEAVED in one
process (A,B,A,B,...) and reports per-config medians, because the shared
axon TPU's wall-clock throughput drifts by >2x between processes minutes
apart (observed 11.5k-26.5k rays/s for the identical train step), making
sequential cross-process comparisons meaningless.
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--phase', default='train', choices=['train', 'eval'])
    p.add_argument('--rounds', type=int, default=6)
    p.add_argument('--iters', type=int, default=5)
    p.add_argument('--rays', type=int, default=2048)
    p.add_argument('--configs', default='default,xla_f32')
    args = p.parse_args()

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config, _build_scene

    def variant(name, cfg=None):
        if cfg is None:
            cfg = _flagship_config()
        if '+' in name:                       # composed: a+b+c
            for part in name.split('+'):
                cfg = variant(part, cfg)
            return cfg
        if name == 'default':
            return cfg
        if name == 'xla_f32':
            return cfg._replace(bf16_shading=False, tracer=cfg.tracer._replace(
                use_pallas_corr=False, use_pallas_march=False,
                use_pallas_iso=False))
        if name == 'xla_bf16':
            return cfg._replace(tracer=cfg.tracer._replace(
                use_pallas_corr=False, use_pallas_march=False,
                use_pallas_iso=False))
        if name == 'kernels_f32':
            return cfg._replace(bf16_shading=False)
        if name == 'iso_on':
            return cfg._replace(tracer=cfg.tracer._replace(
                use_pallas_iso=True))
        if name == 'no_shade':
            return cfg._replace(use_pallas_shade=False)
        if name == 'shade_512':
            return cfg._replace(pallas_shade_tile=512)
        if name == 'shade_2048':
            return cfg._replace(pallas_shade_tile=2048)
        if name == 'no_shade_grad':
            return cfg._replace(use_pallas_shade_grad=False)
        if name == 'idiff_jacfwd':
            return cfg._replace(idiff_linearize=False)
        if name == 'idiff_xla':               # disable kernel-J (r4 A/B)
            return cfg._replace(idiff_kernel_jac=False)
        if name == 'colorfold':
            return cfg._replace(color=cfg.color._replace(fold_input=True))
        if name == 'nocolorkernel':           # r5: fused color pair off
            return cfg._replace(color=cfg.color._replace(use_pallas=False))
        if name.startswith('colortile'):      # colortile<fwd>x<bwd>
            fwd, bwd = name[9:].split('x')
            return cfg._replace(color=cfg.color._replace(
                pallas_tile=int(fwd), pallas_tile_bwd=int(bwd)))
        if name == 'nopack':                  # r5: dense-slot shading
            return cfg._replace(shade_pack=False)
        if name == 'pack':                    # r5: packed shading (A/B)
            return cfg._replace(shade_pack=True)
        if name.startswith('packfrac'):       # packfrac<percent>
            return cfg._replace(shade_pack_frac=int(name[8:]) / 100.0)
        if name == 'nostandjac':              # r5: XLA linearize J path
            return cfg._replace(idiff_standalone_jac=False)
        if name == 'knnkernel':
            return cfg._replace(tracer=cfg.tracer._replace(
                use_pallas_knn=True))
        if name.startswith('corrtile'):
            return cfg._replace(tracer=cfg.tracer._replace(
                pallas_corr_tile=int(name[8:])))
        if name.startswith('isotile'):
            return cfg._replace(tracer=cfg.tracer._replace(
                pallas_iso_tile=int(name[7:])))
        if name.startswith('marchtile'):
            return cfg._replace(tracer=cfg.tracer._replace(
                pallas_march_tile=int(name[9:])))
        if name.startswith('warm'):           # warm<stride>
            return cfg._replace(tracer=cfg.tracer._replace(
                corr_coarse_stride=int(name[4:])))
        if name.startswith('split'):          # split<phase1_steps>
            return cfg._replace(tracer=cfg.tracer._replace(
                corr_phase1_steps=int(name[5:])))
        if name.startswith('msplit'):         # msplit<phase1_steps>
            return cfg._replace(tracer=cfg.tracer._replace(
                march_phase1_steps=int(name[6:])))
        if name.startswith('isplit'):         # isplit<phase1_steps>
            return cfg._replace(tracer=cfg.tracer._replace(
                iso_phase1_steps=int(name[6:])))
        if name == 'nosplit':                 # single-pass solvers (r3)
            return cfg._replace(tracer=cfg.tracer._replace(
                corr_phase1_steps=0, march_phase1_steps=0,
                iso_phase1_steps=0))
        if name == 'tuned8':                  # r5 honest-cap candidate:
            # corr phase1 8 with a cap sized to the measured straggler
            # survival at 8192 rays (x1.5 margin); march/iso stay at 16
            # (their survival decays too slowly for a lower cutoff at
            # honest caps) with the march cap raised past its measured
            # ~1272 actives-past-16
            return cfg._replace(tracer=cfg.tracer._replace(
                corr_phase1_steps=8, corr_resolve_cap=32768,
                march_phase1_steps=16, march_resolve_cap=2048,
                iso_phase1_steps=16, iso_resolve_cap=2048))
        if name == 'fixcaps':                 # default cutoffs, safe caps
            return cfg._replace(tracer=cfg.tracer._replace(
                march_resolve_cap=2048, iso_resolve_cap=2048))
        if name.startswith('allsplitbig'):    # allsplitbig<k>: 2x caps
            k = int(name[11:])
            return cfg._replace(tracer=cfg.tracer._replace(
                corr_phase1_steps=k, march_phase1_steps=k,
                iso_phase1_steps=k, corr_resolve_cap=8192,
                march_resolve_cap=1024, iso_resolve_cap=1024))
        if name.startswith('allsplit'):       # allsplit<k>: all three
            k = int(name[8:])
            return cfg._replace(tracer=cfg.tracer._replace(
                corr_phase1_steps=k, march_phase1_steps=k,
                iso_phase1_steps=k))
        if name.startswith('shade_grad_'):    # shade_grad_<bwd_tile>
            return cfg._replace(
                pallas_shade_grad_tile=int(name.rsplit('_', 1)[1]))
        if name.startswith('resid'):          # resid<fwd_tile>x<bwd_tile>
            fwd, bwd = name[5:].split('x')
            return cfg._replace(shade_resid_bf16=True,
                                pallas_shade_tile=int(fwd),
                                pallas_shade_grad_tile=int(bwd))
        raise ValueError(name)

    names = args.configs.split(',')
    fns = {}
    if args.phase == 'train':
        from arah_tpu.data.batch import synthetic_train_batch
        from arah_tpu.parallel.train_step import TrainState, make_train_step
        from arah_tpu.train.loss import LossWeights
        from arah_tpu.train.optim import OptimConfig, make_optimizer
        cfg0 = variant(names[0])
        params, fd, _ = _build_scene(cfg0, n_rays=16)
        batch = synthetic_train_batch(jax.random.PRNGKey(1), fd,
                                      n_blocks=1, n_rays=args.rays,
                                      n_reg=1024)
        loss_w = LossWeights(n_ray_loss=args.rays)
        optimizer, _ = make_optimizer(OptimConfig(train_skinning_net=True),
                                      params)
        state = TrainState(params, optimizer.init(params), jnp.int32(0))
        key = jax.random.PRNGKey(2)
        for name in names:
            # donate=False: every variant steps repeatedly from the SAME
            # state; donation would delete it after the first call.
            # The key is folded per call: the axon tunnel runtime can
            # replay identical dispatches (same executable + same input
            # buffers) without executing, which round 5 measured as a
            # physically impossible 1.7M rays/s.
            step = make_train_step(variant(name), loss_w, optimizer,
                                   donate=False)
            fns[name] = lambda i, step=step: step(
                state, batch, jax.random.fold_in(key, i))[1]['loss']
    else:
        from arah_tpu.render.renderer import render
        cfg0 = variant(names[0])
        params, fd, inp = _build_scene(cfg0, n_rays=args.rays)
        key = jax.random.PRNGKey(1)
        for name in names:
            cfg = variant(name)
            f = jax.jit(lambda p, i, k, cfg=cfg: render(
                p, cfg, i, jax.random.fold_in(key, k),
                training=False)['rgb_values'])
            fns[name] = lambda i, f=f: f(params, inp, i)

    def barrier(out):
        # HOST FETCH, not block_until_ready: under the axon tunnel
        # block_until_ready can return before remote execution finishes
        # (round-5 finding: a 279 s backlog drained behind "complete"
        # dispatches). The device executes in-order, so fetching any
        # element of the LAST result is a correct barrier for the whole
        # timed block.
        return np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    seq = 0
    for name in list(fns):
        t0 = time.perf_counter()
        barrier(fns[name](seq))
        seq += 1
        print(f'compiled {name} in {time.perf_counter() - t0:.0f}s',
              flush=True)

    times = {n: [] for n in names}
    for r in range(args.rounds):
        for name in names:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fns[name](seq)
                seq += 1
            barrier(out)
            dt = (time.perf_counter() - t0) / args.iters
            times[name].append(dt)
            rs = args.rays / dt
            flag = '  [IMPOSSIBLE — barrier broken?]' if rs > 5e5 else ''
            print(f'round {r} {name:12s} {rs:9.0f} rays/s{flag}',
                  flush=True)

    print('--- medians ---')
    base = None
    for name in names:
        med = float(np.median(times[name]))
        rays_s = args.rays / med
        if base is None:
            base = rays_s
        print(f'{name:12s} {rays_s:9.0f} rays/s   '
              f'({rays_s / base:.2f}x vs {names[0]})')


if __name__ == '__main__':
    main()
