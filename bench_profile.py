#!/usr/bin/env python
"""Op-level train-step attribution from a jax.profiler trace.

Captures a 3-step trace of the flagship training step on the local
device, parses the TensorBoard trace.json.gz, aggregates device-track
complete events by op, and buckets them into the named blocks used by
PERF.md's attribution table. Run with the same env toggles as bench.py
(BENCH_BF16, BENCH_XLA_ONLY, ...).

Usage: python bench_profile.py [--rays 2048] [--top 25]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys


BUCKETS = [
    # (bucket, regex over op name)
    ('color fwd kernel', r'color_fwd_pallas|_color_fwd_kernel'),
    ('color bwd kernel', r'color_bwd_pallas|_color_bwd_kernel'),
    ('skinning jac kernel', r'skinning_jac_pallas|_jac_kernel'),
    ('shade fwd kernel', r'shade_pallas|_shade_kernel'),
    ('shade bwd kernel', r'shade_bwd|_shade_bwd_kernel'),
    ('corr kernel', r'corr_search_pallas|corr_kernel'),
    ('march kernel', r'sphere_march|march_kernel'),
    ('iso solve', r'iso|search_iso'),
    ('shading autodiff', r'jvp\(|transpose\('),
    ('adam', r'adam|multi_transform|apply_updates'),
    ('copies/layout', r'^copy|copy\.|bitcast|transpose\.|all-to-all'),
    ('while loops (solvers)', r'while'),
    ('fusions', r'^fusion'),
]


def bucket_of(name: str) -> str:
    for b, pat in BUCKETS:
        if re.search(pat, name):
            return b
    return 'other'


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--rays', type=int, default=2048)
    p.add_argument('--steps', type=int, default=3)
    p.add_argument('--top', type=int, default=25)
    p.add_argument('--trace-dir', default='/tmp/arah_step_trace')
    args = p.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or '.')
    import jax
    import jax.numpy as jnp
    from arah_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from __graft_entry__ import _flagship_config, _build_scene
    from arah_tpu.data.batch import synthetic_train_batch
    from arah_tpu.parallel.train_step import TrainState, make_train_step
    from arah_tpu.train.loss import LossWeights
    from arah_tpu.train.optim import OptimConfig, make_optimizer
    from bench import apply_env_overrides

    cfg = apply_env_overrides(_flagship_config())
    params, fd, _ = _build_scene(cfg, n_rays=16)
    batch = synthetic_train_batch(jax.random.PRNGKey(1), fd, n_blocks=1,
                                  n_rays=args.rays, n_reg=1024)
    loss_w = LossWeights(n_ray_loss=args.rays)
    optimizer, _ = make_optimizer(OptimConfig(train_skinning_net=True),
                                  params)
    state = TrainState(params, jax.jit(optimizer.init)(params), jnp.int32(0))
    step = make_train_step(cfg, loss_w, optimizer)
    key = jax.random.PRNGKey(2)
    state, losses = step(state, batch, key)
    jax.block_until_ready(losses['loss'])

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    for i in range(args.steps):
        state, losses = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(losses['loss'])
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(
        args.trace_dir, 'plugins/profile/*/*.trace.json.gz'))
    if not paths:
        print('no trace written', file=sys.stderr)
        sys.exit(1)
    with gzip.open(sorted(paths)[-1], 'rt') as f:
        trace = json.load(f)

    events = trace['traceEvents']
    # device tracks: pid names containing TPU/device XLA op lanes
    pid_names = {e['pid']: e['args'].get('name', '')
                 for e in events if e.get('ph') == 'M'
                 and e.get('name') == 'process_name'}
    dev_pids = {pid for pid, n in pid_names.items()
                if 'TPU' in n or '/device' in n.lower()}
    # leaf-op lanes only: device tracks also carry CONTAINER rows
    # ("XLA Modules" module executions, "Steps" run rows like bare
    # digits) that nest the leaf ops — summing both double-counts the
    # whole step (observed: "jit_step_fn" + digit rows each ~= one
    # step). Keep threads explicitly named "XLA Ops*"; fall back to
    # everything minus obvious containers if the lane name is absent.
    tid_names = {(e['pid'], e['tid']): e['args'].get('name', '')
                 for e in events if e.get('ph') == 'M'
                 and e.get('name') == 'thread_name'}
    op_lanes = {k for k, n in tid_names.items() if 'XLA Ops' in n}
    per_op = collections.Counter()
    op_meta = {}
    for e in events:
        if e.get('ph') != 'X' or e.get('pid') not in dev_pids:
            continue
        name = e.get('name', '')
        key = (e.get('pid'), e.get('tid'))
        if op_lanes:
            if key not in op_lanes:
                continue
        elif name.isdigit() or name.startswith('jit_'):
            continue
        per_op[name] += e.get('dur', 0)
        a = e.get('args') or {}
        src = a.get('source_info') or a.get('source') or ''
        ln = a.get('long_name') or a.get('tf_op') or ''
        if name not in op_meta and (src or ln):
            op_meta[name] = f'{src} {str(ln)[:90]}'.strip()

    per_bucket = collections.Counter()
    for name, dur in per_op.items():
        per_bucket[bucket_of(name)] += dur
    total = sum(per_op.values())
    print(f'--- device time over {args.steps} steps: '
          f'{total / 1e3 / args.steps:.1f} ms/step ---')
    for b, dur in per_bucket.most_common():
        print(f'{b:28s} {dur / 1e3 / args.steps:8.2f} ms/step '
              f'({100 * dur / max(total, 1):4.1f}%)')
    print(f'--- top {args.top} ops ---')
    for name, dur in per_op.most_common(args.top):
        meta = op_meta.get(name, '')
        print(f'{dur / 1e3 / args.steps:8.2f} ms  {name[:60]}'
              f'{"  | " + meta[:120] if meta else ""}')


if __name__ == '__main__':
    main()
