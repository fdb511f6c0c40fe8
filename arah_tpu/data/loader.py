"""Dataset -> device batch assembly and background prefetching.

The framework's replacement for torch DataLoader + the input-composition
half of the reference's `LightningModel.compose_inputs`
(`lightning_model.py:463-634`): per-frame items from all training views
are collated into a `TrainBatch` (ray blocks stacked on the leading dim),
the final bone transforms are composed as
`bone_transforms @ inv(bone_transforms_02v)`, and a thread-pool prefetcher
overlaps host-side item preparation with device steps.
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
from arah_tpu.data.batch import identity_noise


def frame_from_item(item: dict) -> FrameData:
    """Frame-level (view-independent) state from one dataset item."""
    import jax.numpy as jnp
    bt = np.asarray(item['image.bone_transforms'])
    bt02v = np.asarray(item['image.bone_transforms_02v'])
    bone_transforms = bt @ np.linalg.inv(bt02v)
    verts = np.asarray(item['image.smpl_vertices'])
    frame = CanonicalFrame(
        bone_transforms=jnp.asarray(bone_transforms),
        trans=jnp.asarray(item['image.trans']).reshape(3),
        coord_min=jnp.asarray(item['image.coord_min']),
        coord_max=jnp.asarray(item['image.coord_max']),
        center=jnp.asarray(item['image.center']).reshape(3))
    smpl = SmplRef(verts_posed=jnp.asarray(verts),
                   skinning_weights=jnp.asarray(
                       item['image.skinning_weights']))
    margin = 0.0  # bounds already include the dataset box margin in rays
    return FrameData(
        frame=frame, smpl=smpl,
        verts_cano=jnp.asarray(item['image.minimal_shape']),
        rots=jnp.asarray(item['image.rots']).reshape(1, 24, 9),
        rots_full=jnp.asarray(item['image.rots_full']).reshape(1, 24, 9),
        Jtrs=jnp.asarray(item['image.Jtrs']).reshape(1, 24, 3),
        Jtrs_posed=jnp.asarray(item['image.Jtrs_posed']).reshape(1, 24, 3),
        bounds_min=jnp.asarray(verts.min(0) - margin),
        bounds_max=jnp.asarray(verts.max(0) + margin))


def collate_train_batch(items: Sequence[dict],
                        noise: dict | None = None) -> TrainBatch:
    """Stack per-view items (same frame) into a TrainBatch."""
    import jax.numpy as jnp
    B = len(items)

    def stack(key):
        return jnp.asarray(np.stack([np.asarray(it[key]) for it in items]))

    fd = frame_from_item(items[0])
    bounds = stack('inputs.body_bounds_intersections')
    n = noise if noise is not None else identity_noise(B)
    pixels = stack('inputs')
    mask_raw = jnp.asarray(np.stack(
        [np.asarray(it['inputs.mask_erode']).astype(np.int32)
         for it in items]))
    return TrainBatch(
        cam_loc=stack('image.cam_loc'),
        ray_dirs=stack('inputs.ray_dirs'),
        near=bounds[..., 0], far=bounds[..., 1],
        rgb_gt=pixels, body_mask=mask_raw,
        points_uniform=stack('image.points_uniform'),
        points_skinning=stack('image.points_skinning'),
        points_inside=stack('image.points_inside')
        if 'image.points_inside' in items[0] else
        jnp.zeros((B, 1, 3)),
        sampled_weights=stack('image.sampled_weights'),
        rots_noise=n['rots_noise'], view_noise=n['view_noise'],
        rot_noise=n['rot_noise'], trans_noise=n['trans_noise'],
        uv=stack('inputs.uv'),
        cam_idx=jnp.asarray(np.array(
            [int(it['inputs.cam_idx']) for it in items], np.int32)),
        frame=fd,
        latent_idx=jnp.int32(items[0]['inputs.data_idx']))


class FrameBatchSampler:
    """Iterates frames; yields the item indices of all views of one frame
    (the reference's one-frame-per-step assumption,
    `ray_tracing.py:129-132`)."""

    def __init__(self, dataset, shuffle=True, seed=0):
        self.dataset = dataset
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        by_frame = {}
        for i, rec in enumerate(dataset.data):
            by_frame.setdefault(rec['frame_idx'], []).append(i)
        self.frames = sorted(by_frame)
        self.by_frame = by_frame

    def __len__(self):
        return len(self.frames)

    def __iter__(self):
        order = list(self.frames)
        if self.shuffle:
            self.rng.shuffle(order)
        for f in order:
            yield self.by_frame[f]


class Prefetcher:
    """Thread-pool prefetch of collated batches (cv2/numpy release the GIL
    for the heavy parts)."""

    def __init__(self, dataset, sampler, collate, n_workers=4, depth=2):
        self.dataset = dataset
        self.sampler = sampler
        self.collate = collate
        self.pool = ThreadPoolExecutor(n_workers)
        self.depth = depth

    def _make(self, idxs):
        items = list(self.pool.map(self.dataset.__getitem__, idxs))
        return self.collate(items)

    def __iter__(self):
        pending = Queue()
        it = iter(self.sampler)
        done = threading.Event()

        def submit_all():
            for idxs in it:
                while pending.qsize() >= self.depth and not done.is_set():
                    threading.Event().wait(0.005)
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
                yield fut.result()
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
