"""Batch construction helpers shared by the data pipelines and tests."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from arah_tpu.core.rays import ray_aabb
from arah_tpu.model import FrameData
from arah_tpu.parallel.train_step import TrainBatch


def identity_noise(n_blocks: int):
    """No-op augmentation fields (zero additive noise, identity view rot)."""
    return dict(
        rots_noise=jnp.zeros((n_blocks, 24, 9)),
        view_noise=jnp.broadcast_to(jnp.eye(3), (n_blocks, 3, 3)),
        rot_noise=jnp.zeros((n_blocks, 1, 9)),
        trans_noise=jnp.zeros((n_blocks, 1, 3)),
    )


def sample_noise(key, n_blocks: int, pose_noise: bool, view_noise: bool,
                 nv_noise_type: str = 'rotation'):
    """Training-time pose/view augmentation, mirroring
    `models/__init__.py:157-174`: applied with probability 0.5 per step,
    std-0.1 gaussians on rotations, +/-45deg random view rotation."""
    from arah_tpu.core.body import rotation_z
    ks = jax.random.split(key, 5)
    apply = jax.random.uniform(ks[0]) <= 0.5
    out = identity_noise(n_blocks)
    if pose_noise:
        out['rots_noise'] = jnp.where(
            apply, jax.random.normal(ks[1], (n_blocks, 24, 9)) * 0.1, 0.0)
        out['rot_noise'] = jnp.where(
            apply, jax.random.normal(ks[2], (n_blocks, 1, 9)) * 0.1, 0.0)
        out['trans_noise'] = jnp.where(
            apply, jax.random.normal(ks[3], (n_blocks, 1, 3)) * 0.1, 0.0)
    if view_noise and nv_noise_type == 'rotation':
        # one random small rotation per block (host-side numpy in the real
        # pipeline; here a first-order approximation via random axis-angle)
        aa = jax.random.normal(ks[4], (n_blocks, 3)) * (45.0 * np.pi / 180)
        from arah_tpu.core.smpl import batch_rodrigues
        R = batch_rodrigues(aa)
        out['view_noise'] = jnp.where(apply, R, jnp.eye(3))
    elif view_noise:
        out['view_noise'] = jnp.where(
            apply, jnp.eye(3) + jax.random.normal(
                ks[4], (n_blocks, 3, 3)) * 0.0, jnp.eye(3))
    return out


def synthetic_train_batch(key, fd: FrameData, n_blocks: int = 2,
                          n_rays: int = 256, n_reg: int = 64,
                          latent_idx: int = 0) -> TrainBatch:
    """Random-but-valid training batch on a prepared frame (tests/bench)."""
    ks = jax.random.split(key, 8)
    V = fd.smpl.verts_posed.shape[0]
    cam_base = jnp.asarray([0.0, 0.3, -2.5])
    cam_off = jax.random.normal(ks[0], (n_blocks, 3)) * 0.3
    cam_loc = cam_base + cam_off

    tgt = jax.random.randint(ks[1], (n_blocks, n_rays), 0, V)
    targets = fd.smpl.verts_posed[tgt]                     # (B, R, 3)
    dirs = targets - cam_loc[:, None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    near, far, hit = ray_aabb(fd.bounds_min, fd.bounds_max,
                              jnp.broadcast_to(cam_loc[:, None, :],
                                               dirs.shape), dirs)
    rgb_gt = jax.random.uniform(ks[2], (n_blocks, n_rays, 3))
    body_mask = jnp.ones((n_blocks, n_rays), jnp.int32)

    pu = (jax.random.uniform(ks[3], (n_blocks, n_reg, 3)) - 0.5) * 2
    psk = jax.random.normal(ks[4], (n_blocks, n_reg, 3)) * 0.2
    pin = jax.random.normal(ks[5], (n_blocks, n_reg, 3)) * 0.1
    sw = jax.nn.softmax(jax.random.normal(ks[6], (n_blocks, n_reg, 24)),
                        axis=-1)

    return TrainBatch(
        cam_loc=cam_loc, ray_dirs=dirs, near=near, far=far,
        rgb_gt=rgb_gt, body_mask=body_mask,
        points_uniform=pu, points_skinning=psk, points_inside=pin,
        sampled_weights=sw, **identity_noise(n_blocks),
        uv=dirs, cam_idx=jnp.arange(n_blocks, dtype=jnp.int32),
        frame=fd, latent_idx=jnp.int32(latent_idx))
