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


def identity_noise_np(n_blocks: int, n_rays: int | None = None,
                      nv_noise_type: str = 'rotation'):
    """Host-side (numpy) no-op augmentation. For `nv_noise_type='gaussian'`
    the view-noise field is per-ray additive (B, R, 3) so its shape stays
    static across applied/identity steps (no recompiles)."""
    if nv_noise_type == 'gaussian':
        assert n_rays is not None, 'gaussian view noise needs n_rays'
        view = np.zeros((n_blocks, n_rays, 3), np.float32)
    else:
        view = np.broadcast_to(np.eye(3, dtype=np.float32),
                               (n_blocks, 3, 3)).copy()
    return dict(
        rots_noise=np.zeros((n_blocks, 24, 9), np.float32),
        view_noise=view,
        rot_noise=np.zeros((n_blocks, 1, 9), np.float32),
        trans_noise=np.zeros((n_blocks, 1, 3), np.float32),
    )


def augm_rots(rng: np.random.RandomState, roll_range: float = 45,
              pitch_range: float = 45, yaw_range: float = 45) -> np.ndarray:
    """Random view-rotation augmentation, reproducing the reference's
    clipped-Euler sampling exactly (`utils/utils.py:183-230`): roll/yaw ~
    clip(randn*range, +-2*range) degrees, pitch ~ rand()*range degrees
    (uniform — the reference uses `np.random.rand` for pitch), composed as
    Rx @ Ry @ Rz."""
    deg = np.pi / 180.0
    rx = min(2 * roll_range, max(-2 * roll_range,
                                 rng.randn() * roll_range))
    sn, cs = np.sin(deg * rx), np.cos(deg * rx)
    rot_x = np.eye(3)
    rot_x[1, 1] = cs; rot_x[1, 2] = -sn
    rot_x[2, 1] = sn; rot_x[2, 2] = cs

    ry = min(2 * pitch_range, max(-2 * pitch_range,
                                  rng.rand() * pitch_range))
    sn, cs = np.sin(deg * ry), np.cos(deg * ry)
    rot_y = np.eye(3)
    rot_y[0, 0] = cs; rot_y[0, 2] = sn
    rot_y[2, 0] = -sn; rot_y[2, 2] = cs

    rz = min(2 * yaw_range, max(-2 * yaw_range, rng.randn() * yaw_range))
    sn, cs = np.sin(deg * rz), np.cos(deg * rz)
    rot_z = np.eye(3)
    rot_z[0, 0] = cs; rot_z[0, 1] = -sn
    rot_z[1, 0] = sn; rot_z[1, 1] = cs
    return (rot_x @ rot_y @ rot_z).astype(np.float32)


def sample_noise(rng: np.random.RandomState, n_blocks: int,
                 pose_noise: bool, view_noise: bool,
                 nv_noise_type: str = 'rotation',
                 n_rays: int | None = None):
    """Training-time pose/view augmentation on host (numpy — safe to run
    in prefetch workers), mirroring `models/__init__.py:157-174`: applied
    with probability 0.5 per step; std-0.1 gaussians on rotation matrices
    and root pose; view noise either one shared clipped-Euler rotation
    ('rotation', `augm_rots(45,45,45)`) or additive per-ray N(0, 0.1)
    ('gaussian', ref `models/__init__.py:168`)."""
    out = identity_noise_np(n_blocks, n_rays, nv_noise_type)
    if rng.uniform() > 0.5:
        return out
    if pose_noise:
        out['rots_noise'] = rng.normal(
            0, 0.1, (n_blocks, 24, 9)).astype(np.float32)
        out['rot_noise'] = rng.normal(
            0, 0.1, (n_blocks, 1, 9)).astype(np.float32)
        out['trans_noise'] = rng.normal(
            0, 0.1, (n_blocks, 1, 3)).astype(np.float32)
    if view_noise:
        if nv_noise_type == 'gaussian':
            out['view_noise'] = rng.normal(
                0, 0.1, (n_blocks, n_rays, 3)).astype(np.float32)
        elif nv_noise_type == 'rotation':
            # ONE rotation shared by every block, as in the reference
            # (`models/__init__.py:170`: a single (1, 3, 3) broadcast)
            R = augm_rots(rng, 45, 45, 45)
            out['view_noise'] = np.broadcast_to(
                R, (n_blocks, 3, 3)).copy()
        else:
            raise ValueError(f'unknown nv_noise_type {nv_noise_type!r}')
    return out


def synthetic_train_batch(key, fd: FrameData, n_blocks: int = 2,
                          n_rays: int = 256, n_reg: int = 64,
                          latent_idx: int = 0,
                          fds: list | None = None) -> TrainBatch:
    """Random-but-valid training batch on a prepared frame (tests/bench).

    fds: optional list of n_blocks FrameData — builds a PER-BLOCK-FRAME
    batch (frame leaves stacked on the leading dim, per-block latent
    indices 0..B-1) for `make_train_step(per_block_frame=True)`."""
    ks = jax.random.split(key, 8)
    if fds is not None:
        assert len(fds) == n_blocks, (len(fds), n_blocks)
        fd = fds[0]
    V = fd.smpl.verts_posed.shape[0]
    cam_base = jnp.asarray([0.0, 0.3, -2.5])
    cam_off = jax.random.normal(ks[0], (n_blocks, 3)) * 0.3
    cam_loc = cam_base + cam_off

    tgt = jax.random.randint(ks[1], (n_blocks, n_rays), 0, V)
    if fds is not None:
        targets = jnp.stack([f.smpl.verts_posed[tgt[b]]
                             for b, f in enumerate(fds)])    # (B, R, 3)
        bmin = jnp.stack([f.bounds_min for f in fds])[:, None, :]
        bmax = jnp.stack([f.bounds_max for f in fds])[:, None, :]
    else:
        targets = fd.smpl.verts_posed[tgt]                   # (B, R, 3)
        bmin, bmax = fd.bounds_min, fd.bounds_max
    dirs = targets - cam_loc[:, None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    near, far, hit = ray_aabb(bmin, bmax,
                              jnp.broadcast_to(cam_loc[:, None, :],
                                               dirs.shape), dirs)
    rgb_gt = jax.random.uniform(ks[2], (n_blocks, n_rays, 3))
    body_mask = jnp.ones((n_blocks, n_rays), jnp.int32)

    pu = (jax.random.uniform(ks[3], (n_blocks, n_reg, 3)) - 0.5) * 2
    psk = jax.random.normal(ks[4], (n_blocks, n_reg, 3)) * 0.2
    pin = jax.random.normal(ks[5], (n_blocks, n_reg, 3)) * 0.1
    sw = jax.nn.softmax(jax.random.normal(ks[6], (n_blocks, n_reg, 24)),
                        axis=-1)

    if fds is not None:
        frame = jax.tree.map(lambda *xs: jnp.stack(xs), *fds)
        lat = jnp.arange(n_blocks, dtype=jnp.int32)
    else:
        frame, lat = fd, jnp.int32(latent_idx)
    return TrainBatch(
        cam_loc=cam_loc, ray_dirs=dirs, near=near, far=far,
        rgb_gt=rgb_gt, body_mask=body_mask,
        points_uniform=pu, points_skinning=psk, points_inside=pin,
        sampled_weights=sw, **identity_noise(n_blocks),
        uv=dirs, cam_idx=jnp.arange(n_blocks, dtype=jnp.int32),
        frame=frame, latent_idx=lat)
