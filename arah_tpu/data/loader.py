"""Dataset -> device batch assembly and background prefetching.

The framework's replacement for torch DataLoader + the input-composition
half of the reference's `LightningModel.compose_inputs`
(`lightning_model.py:463-634`): per-frame items from all training views
are collated into a `TrainBatch` (ray blocks stacked on the leading dim),
the final bone transforms are composed as
`bone_transforms @ inv(bone_transforms_02v)`, and a thread-pool prefetcher
overlaps host-side item preparation with device steps.

Concurrency contract: everything that runs inside prefetch worker threads
is **numpy-only** — no JAX calls. XLA:CPU's runtime can deadlock when
`jnp.asarray`/dispatch runs on pool threads while the main thread executes
jitted programs (futex-wait hang observed in round 1), so collation builds
numpy `TrainBatch`es in workers and the single `batch_to_device` transfer
happens on the consumer thread.
"""
from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Sequence

import numpy as np

from arah_tpu.model import FrameData
from arah_tpu.parallel.train_step import TrainBatch
from arah_tpu.render.ray_tracing import CanonicalFrame, SmplRef
from arah_tpu.data.batch import identity_noise_np


def frame_from_item_np(item: dict) -> FrameData:
    """Frame-level (view-independent) state from one dataset item.

    Pure numpy (worker-thread safe); `batch_to_device`/`frame_from_item`
    convert to device arrays on the consumer thread."""
    bt = np.asarray(item['image.bone_transforms'])
    bt02v = np.asarray(item['image.bone_transforms_02v'])
    bone_transforms = (bt @ np.linalg.inv(bt02v)).astype(np.float32)
    verts = np.asarray(item['image.smpl_vertices'])

    def f32(key, shape=None):
        a = np.asarray(item[key], np.float32)
        return a.reshape(shape) if shape is not None else a

    frame = CanonicalFrame(
        bone_transforms=bone_transforms,
        trans=f32('image.trans', (3,)),
        coord_min=f32('image.coord_min'),
        coord_max=f32('image.coord_max'),
        center=f32('image.center', (3,)))
    smpl = SmplRef(verts_posed=verts.astype(np.float32),
                   skinning_weights=f32('image.skinning_weights'))
    margin = 0.0  # bounds already include the dataset box margin in rays
    return FrameData(
        frame=frame, smpl=smpl,
        verts_cano=f32('image.minimal_shape'),
        rots=f32('image.rots', (1, 24, 9)),
        rots_full=f32('image.rots_full', (1, 24, 9)),
        Jtrs=f32('image.Jtrs', (1, 24, 3)),
        Jtrs_posed=f32('image.Jtrs_posed', (1, 24, 3)),
        bounds_min=(verts.min(0) - margin).astype(np.float32),
        bounds_max=(verts.max(0) + margin).astype(np.float32))


def frame_from_item(item: dict) -> FrameData:
    """`frame_from_item_np` + device transfer (main-thread use)."""
    import jax
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, frame_from_item_np(item))


def batch_to_device(batch):
    """One-shot host->device transfer of a numpy batch pytree. Must be
    called from the consumer/main thread (see module docstring)."""
    import jax
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, batch)


def collate_train_batch_np(items: Sequence[dict],
                           noise: dict | None = None,
                           per_block_frame: bool = False) -> TrainBatch:
    """Stack per-view items into a numpy TrainBatch (worker-thread safe).

    per_block_frame=False (reference semantics): all items are views of
    the SAME frame; frame state comes from items[0] and is replicated.
    per_block_frame=True: each item may be a different frame — frame
    leaves and latent_idx are stacked per block (for
    `make_train_step(per_block_frame=True)`)."""
    B = len(items)

    def stack(key):
        return np.stack([np.asarray(it[key]) for it in items])

    if per_block_frame:
        fds = [frame_from_item_np(it) for it in items]
        # jax.tree.map on numpy leaves is pure Python tree surgery — no
        # device dispatch, so the worker-thread numpy-only contract holds
        import jax
        fd = jax.tree.map(lambda *xs: np.stack(xs), *fds)
        latent_idx = np.asarray(
            [int(it['inputs.data_idx']) for it in items], np.int32)
    else:
        fd = frame_from_item_np(items[0])
        latent_idx = np.int32(items[0]['inputs.data_idx'])
    bounds = stack('inputs.body_bounds_intersections')
    n = noise if noise is not None else identity_noise_np(B)
    pixels = stack('inputs')
    mask_raw = np.stack(
        [np.asarray(it['inputs.mask_erode']).astype(np.int32)
         for it in items])
    return TrainBatch(
        cam_loc=stack('image.cam_loc'),
        ray_dirs=stack('inputs.ray_dirs'),
        near=bounds[..., 0], far=bounds[..., 1],
        rgb_gt=pixels, body_mask=mask_raw,
        points_uniform=stack('image.points_uniform'),
        points_skinning=stack('image.points_skinning'),
        points_inside=stack('image.points_inside')
        if 'image.points_inside' in items[0] else
        np.zeros((B, 1, 3), np.float32),
        sampled_weights=stack('image.sampled_weights'),
        rots_noise=np.asarray(n['rots_noise']),
        view_noise=np.asarray(n['view_noise']),
        rot_noise=np.asarray(n['rot_noise']),
        trans_noise=np.asarray(n['trans_noise']),
        uv=stack('inputs.uv'),
        cam_idx=np.array([int(it['inputs.cam_idx']) for it in items],
                         np.int32),
        frame=fd,
        latent_idx=latent_idx)


def collate_train_batch(items: Sequence[dict],
                        noise: dict | None = None) -> TrainBatch:
    """Numpy collate + device transfer (single-threaded/main-thread use)."""
    return batch_to_device(collate_train_batch_np(items, noise))


class FrameBatchSampler:
    """Iterates frames; yields the item indices of all views of one frame
    (the reference's one-frame-per-step assumption,
    `ray_tracing.py:129-132`).

    Multi-process data parallelism: with `num_shards > 1` every process
    iterates the SAME frame order (shared seed) but trains on a disjoint
    view subset per frame (round-robin by rank), the SPMD analog of DDP's
    per-rank sampler — each process feeds its local devices, gradients
    meet in the cross-process `psum` (`/root/reference/train.py:124-133`).

    `block_multiple` pads each step's view list (cycling through the
    views) to the next multiple of the local device count: the dataset
    draws FRESH random rays on every `__getitem__` (stateful rng), so a
    repeated view index is an independent ray block — the exact analog of
    DDP showing one image to several GPUs with different ray samples.
    Without it a mesh larger than the camera count cannot shard the
    batch (e.g. 2-view scenes on 8 devices).
    """

    def __init__(self, dataset, shuffle=True, seed=0, shard_id: int = 0,
                 num_shards: int = 1, block_multiple: int = 1):
        self.dataset = dataset
        self.shuffle = shuffle
        self.block_multiple = max(1, block_multiple)
        self.rng = np.random.RandomState(seed)
        by_frame = {}
        for i, rec in enumerate(dataset.data):
            by_frame.setdefault(rec['frame_idx'], []).append(i)
        if num_shards > 1:
            # equal-size per-rank shards (required: every process must
            # contribute the same number of ray blocks to the global
            # sharded batch); wraps modulo the view count like torch's
            # DistributedSampler padding
            sharded = {}
            for f, idxs in by_frame.items():
                n_per = max(1, -(-len(idxs) // num_shards))
                sharded[f] = [idxs[(shard_id + k * num_shards) % len(idxs)]
                              for k in range(n_per)]
            by_frame = sharded
        self.frames = sorted(by_frame)
        self.by_frame = by_frame

    def __len__(self):
        return len(self.frames)

    def __iter__(self):
        order = list(self.frames)
        if self.shuffle:
            self.rng.shuffle(order)
        for f in order:
            idxs = self.by_frame[f]
            m = self.block_multiple
            if len(idxs) % m:
                n = -(-len(idxs) // m) * m
                idxs = [idxs[k % len(idxs)] for k in range(n)]
            yield idxs


class MultiFrameBatchSampler:
    """Independent (frame, view) draws per step — the per-block-frame
    mode's sampler (lifts the reference's one-frame-per-step restriction;
    see TrainBatch docstring).

    Each step yields `batch_size` item indices drawn uniformly WITHOUT
    replacement from a shuffled epoch permutation of all items (wrapping
    within the epoch if batch_size > remaining), so every (frame, view)
    item is visited ~once per epoch like the frame sampler. Multi-process:
    rank-disjoint strided slices of the same shared-seed permutation —
    each process contributes `batch_size` local blocks to the global
    sharded batch, all ranks step the same count per epoch."""

    def __init__(self, dataset, batch_size: int, shuffle=True, seed=0,
                 shard_id: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = max(1, batch_size)
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.shard_id = shard_id
        self.num_shards = max(1, num_shards)
        self.n_items = len(dataset.data)

    def __len__(self):
        local = len(range(self.shard_id, self.n_items, self.num_shards))
        return max(1, local // self.batch_size)

    def __iter__(self):
        order = np.arange(self.n_items)
        if self.shuffle:
            self.rng.shuffle(order)
        local = order[self.shard_id::self.num_shards]
        n_steps = len(self)
        for s in range(n_steps):
            idxs = [int(local[(s * self.batch_size + k) % len(local)])
                    for k in range(self.batch_size)]
            yield idxs


class Prefetcher:
    """Thread-pool prefetch of collated batches (cv2/numpy release the GIL
    for the heavy parts).

    `collate` MUST be numpy-only (no JAX) — it runs on pool threads. The
    optional `postprocess` (e.g. `batch_to_device`) runs on the consumer
    thread, keeping all JAX dispatch on one thread."""

    def __init__(self, dataset, sampler, collate, n_workers=4, depth=2,
                 postprocess=None):
        self.dataset = dataset
        self.sampler = sampler
        self.collate = collate
        self.postprocess = postprocess
        self.pool = ThreadPoolExecutor(n_workers)
        self.depth = depth

    def _make(self, idxs):
        # items loaded serially within a frame; parallelism comes from
        # `depth` frames in flight (nested pool.map from a pool task can
        # exhaust workers and deadlock when depth >= n_workers)
        items = [self.dataset[i] for i in idxs]
        return self.collate(items)

    def __iter__(self):
        pending = Queue()
        it = iter(self.sampler)
        done = threading.Event()

        def submit_all():
            for idxs in it:
                while pending.qsize() >= self.depth and not done.is_set():
                    done.wait(0.005)
                if done.is_set():
                    return
                pending.put(self.pool.submit(self._make, idxs))
            pending.put(None)

        t = threading.Thread(target=submit_all, daemon=True)
        t.start()
        try:
            while True:
                fut = pending.get()
                if fut is None:
                    break
                batch = fut.result()
                if self.postprocess is not None:
                    batch = self.postprocess(batch)
                yield batch
        finally:
            done.set()
            # Drain so no worker touches the dataset after the consumer
            # stops (early break / generator close): cancel queued work,
            # let in-flight items finish inside the pool.
            while not pending.empty():
                fut = pending.get_nowait()
                if fut is not None:
                    fut.cancel()
            t.join(timeout=5.0)

    def close(self):
        """Stop all workers; waits for in-flight items. Safe to call more
        than once."""
        self.pool.shutdown(wait=True, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
