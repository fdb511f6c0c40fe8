"""Camera rays and ray-box intersection (pure JAX, batched, static shapes).

Re-design of the reference's numpy ray helpers:
  * ray-AABB slab test — `im2mesh/utils/utils.py:56-73`
  * camera rays from K/R/T — `im2mesh/data/zju_mocap.py:330-433` and
    `lightning_model.py:21-34`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def get_camera_location(R: jax.Array, t: jax.Array) -> jax.Array:
    """World camera center from w2c extrinsics: -R^T t. (..., 3, 3),(...,3)."""
    return -jnp.einsum('...ji,...j->...i', R, t)


def get_camera_rays(R: jax.Array, homo_2d: jax.Array) -> jax.Array:
    """World ray dirs from w2c rotation and K^-1-lifted pixels.

    homo_2d: (..., N, 3) = pixels_homogeneous @ K^-T. Returns unit rays.
    """
    rays = jnp.einsum('...nj,...jk->...nk', homo_2d, R)
    return normalize(rays)


def pixels_to_rays(uv: jax.Array, K: jax.Array, R: jax.Array,
                   t: jax.Array):
    """(N, 2) integer/float pixel coords -> (cam_loc (3,), rays (N, 3))."""
    ones = jnp.ones_like(uv[..., :1])
    pix = jnp.concatenate([uv.astype(K.dtype), ones], axis=-1)
    homo = pix @ jnp.linalg.inv(K).T
    rays = get_camera_rays(R, homo)
    cam_loc = get_camera_location(R, t)
    return cam_loc, rays


def ray_aabb(bounds_min: jax.Array, bounds_max: jax.Array, ray_o: jax.Array,
             ray_d: jax.Array, eps: float = 1e-5):
    """Slab-test ray/AABB intersection.

    Args:
      bounds_min, bounds_max: (3,) box corners.
      ray_o: (..., 3) origins; ray_d: (..., 3) (not necessarily unit).

    Returns:
      (near, far, hit_mask) with near/far in units of |ray_d| (i.e. divided
      by the ray norm, matching reference `utils.py:56-73`).
    """
    norm_d = jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    viewdir = ray_d / norm_d
    # Clamp near-zero components exactly as the reference does.
    viewdir = jnp.where((viewdir < eps) & (viewdir > -1e-10), eps, viewdir)
    viewdir = jnp.where((viewdir > -eps) & (viewdir < 1e-10), -eps, viewdir)
    tmin = (bounds_min - ray_o) / viewdir
    tmax = (bounds_max - ray_o) / viewdir
    t1 = jnp.minimum(tmin, tmax)
    t2 = jnp.maximum(tmin, tmax)
    near = jnp.max(t1, axis=-1)
    far = jnp.min(t2, axis=-1)
    hit = near < far
    return near / norm_d[..., 0], far / norm_d[..., 0], hit


def stratified_z_vals(key: jax.Array, z_vals: jax.Array,
                      fix_idx: int | None = None) -> jax.Array:
    """Stratified perturbation of sorted per-ray depths.

    Matches `ray_tracing.py:298-311`: jitter each sample uniformly within
    its mid-point interval; `fix_idx` pins one sample (the surface point).
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    if fix_idx is not None:
        t_rand = t_rand.at[..., fix_idx].set(0.5)
    return lower + (upper - lower) * t_rand
