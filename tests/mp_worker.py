"""Subprocess worker for the multi-process data-parallel test.

Launched by tests/test_multiprocess.py as N processes x 4 virtual CPU
devices (env: JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_
device_count=4). Every rank builds the IDENTICAL global scene/batch from
shared seeds, takes its rank's slice of the ray blocks, assembles the
global sharded batch with `make_global_batch`, and runs two sharded
training steps. The resulting replicated params must be identical on
every rank (cross-process gradient psum) and equal to a single-process
run over the same 8-device batch — the DDP grad-sync contract of the
reference (`/root/reference/train.py:124-133`).

Run with --nprocs 1 (no jax.distributed) for the single-process oracle.
"""
from __future__ import annotations

import argparse
import os
import sys


def fingerprint(tree):
    """Order-stable {path: (sum, abs-sum)} over a pytree of replicated
    global arrays (first addressable shard == full value for P())."""
    import jax
    import numpy as np
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = jax.tree_util.keystr(path)
        x = np.asarray(jax.device_get(leaf.addressable_data(0)),
                       dtype=np.float64)
        out[f'{name}.sum'] = x.sum()
        out[f'{name}.abs'] = np.abs(x).sum()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rank', type=int, default=0)
    ap.add_argument('--nprocs', type=int, default=1)
    ap.add_argument('--coordinator', default=None)
    ap.add_argument('--outdir', required=True)
    ap.add_argument('--flagship', action='store_true',
                    help='full flagship network sizes (tiny shapes)')
    ap.add_argument('--steps', type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    # the sandbox's axon TPU plugin overrides JAX_PLATFORMS; pin CPU the
    # same way tests/conftest.py does
    jax.config.update('jax_platforms', 'cpu')
    if args.nprocs > 1:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.nprocs,
                                   process_id=args.rank)
    assert jax.process_count() == args.nprocs
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_config
    from arah_tpu.data.batch import synthetic_train_batch
    from arah_tpu.data.synthetic import synthetic_smpl
    from arah_tpu.model import init_model_params, prepare_frame
    from arah_tpu.parallel.distributed import (global_mesh,
                                               make_global_batch,
                                               replicate_over_mesh)
    from arah_tpu.parallel.train_step import (N_PER_BLOCK_FIELDS,
                                              TrainState, make_train_step)
    from arah_tpu.train.loss import LossWeights
    from arah_tpu.train.optim import OptimConfig, make_optimizer

    cfg = _flagship_config(small=not args.flagship)
    rng = np.random.RandomState(0)
    model = synthetic_smpl(n_verts=256)
    params = init_model_params(jax.random.PRNGKey(0), cfg,
                               n_latent_frames=2)
    fd = prepare_frame(
        model, jnp.asarray(rng.randn(10).astype(np.float32) * 0.3),
        jnp.asarray((rng.randn(72) * 0.2).astype(np.float32)),
        jnp.zeros(3))

    n_rays = 32
    # the GLOBAL batch, identical on every rank (shared seed)
    batch = synthetic_train_batch(jax.random.PRNGKey(1), fd,
                                  n_blocks=n_global, n_rays=n_rays,
                                  n_reg=16)
    batch_np = jax.tree.map(lambda x: np.asarray(x), batch)
    # this rank's local ray blocks (contiguous slice, device order)
    lo = args.rank * n_local
    local = batch_np._replace(**{
        f: getattr(batch_np, f)[lo:lo + n_local]
        for f in batch_np._fields[:N_PER_BLOCK_FIELDS]})

    mesh = global_mesh()
    global_batch = make_global_batch(mesh, local)

    loss_w = LossWeights(n_ray_loss=n_rays)
    optimizer, _ = make_optimizer(OptimConfig(), params)
    state = TrainState(params, optimizer.init(params), jnp.int32(0))
    state = replicate_over_mesh(state, mesh)

    step_fn = make_train_step(cfg, loss_w, optimizer, mesh=mesh)
    losses = None
    for i in range(args.steps):
        state, losses = step_fn(state, global_batch,
                                jax.random.fold_in(jax.random.PRNGKey(2),
                                                   i))

    fp = fingerprint(state.params)
    fp['loss'] = float(np.asarray(
        jax.device_get(losses['loss'].addressable_data(0))))
    os.makedirs(args.outdir, exist_ok=True)
    np.savez(os.path.join(args.outdir, f'rank{args.rank}.npz'), **fp)
    print(f'rank {args.rank}/{args.nprocs} ok: loss={fp["loss"]:.6f}',
          flush=True)


if __name__ == '__main__':
    main()
