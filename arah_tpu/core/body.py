"""Canonical-space body math: LBS point skinning, hierarchical softmax,
Vitruvian 02v transforms and canonical coordinate normalization.

TPU-first re-design of scattered reference helpers:
  * point skinning        — `im2mesh/utils/root_finding_utils.py:13-33`
  * normalize/unnormalize — `im2mesh/utils/root_finding_utils.py:37-51`
  * hierarchical softmax  — `im2mesh/utils/utils.py:138-181`
  * 02v bone transforms   — `im2mesh/utils/utils.py:233-269` /
                            `lightning_model.py:37-99`
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from arah_tpu.core.linalg import inv_affine
import numpy as np


def skinning(x: jax.Array, w: jax.Array, tfs: jax.Array,
             inverse: bool = False):
    """Linear blend skinning of points.

    Args:
      x: (..., N, 3) points.
      w: (..., N, J) per-point skinning weights.
      tfs: (..., J, 4, 4) bone transforms.

    Returns:
      (skinned (..., N, 3), per-point transforms (..., N, 4, 4)).
    """
    # HIGHEST: these run inside the Broyden residual — bf16 default
    # precision adds ~1e-4 noise that stalls the 1e-5 convergence check
    w_tf = jnp.einsum('...pn,...nij->...pij', w, tfs,
                      precision=jax.lax.Precision.HIGHEST)
    tf = inv_affine(w_tf) if inverse else w_tf
    x_out = jnp.einsum('...pij,...pj->...pi', tf[..., :3, :3], x,
                       precision=jax.lax.Precision.HIGHEST) \
        + tf[..., :3, 3]
    return x_out, w_tf


def apply_transform(T: jax.Array, x: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) homogeneous transforms to (..., 3) points."""
    return jnp.einsum('...ij,...j->...i', T[..., :3, :3], x,
                      precision=jax.lax.Precision.HIGHEST) \
        + T[..., :3, 3]


def normalize_canonical_points(pts, coord_min, coord_max, center):
    """SMPL canonical metric space -> normalized [-1,1]^3 SDF space."""
    padding = (coord_max - coord_min) * 0.05
    pts = pts - center
    pts = (pts - coord_min + padding) / (coord_max - coord_min) / 1.1
    return (pts - 0.5) * 2.0


def unnormalize_canonical_points(pts, coord_min, coord_max, center):
    """Inverse of :func:`normalize_canonical_points`."""
    padding = (coord_max - coord_min) * 0.05
    return (pts / 2.0 + 0.5) * 1.1 * (coord_max - coord_min) \
        + coord_min - padding + center


def sdf_to_metric(sdf, coord_min, coord_max):
    """Normalized-SDF value -> metric (canonical-space) distance.

    Matches the `sdf / 2 * 1.1 * (coord_max - coord_min)` rescale used
    throughout the reference renderer.
    """
    return sdf / 2.0 * 1.1 * (coord_max - coord_min)


def hierarchical_softmax(x: jax.Array) -> jax.Array:
    """SNARF hierarchical softmax over the SMPL kinematic tree.

    Input (..., 25) raw logits (25th channel gates the upper-spine split),
    output (..., 24) probabilities. Mirrors `utils/utils.py:138-181`.
    """
    sig = jax.nn.sigmoid

    def sm3(a, b, c):
        return jax.nn.softmax(jnp.stack([a, b, c], axis=-1), axis=-1)

    c = [x[..., i] for i in range(25)]
    p = [None] * 24

    root_gate = sig(c[0])
    hips = sm3(c[1], c[2], c[3])  # (..., 3)
    p[1] = root_gate * hips[..., 0]
    p[2] = root_gate * hips[..., 1]
    p[3] = root_gate * hips[..., 2]
    p[0] = 1.0 - root_gate

    for child, parent in ((4, 1), (5, 2), (6, 3)):
        p[child] = p[parent] * sig(c[child])
        p[parent] = p[parent] * (1 - sig(c[child]))
    for child, parent in ((7, 4), (8, 5), (9, 6)):
        p[child] = p[parent] * sig(c[child])
        p[parent] = p[parent] * (1 - sig(c[child]))
    for child, parent in ((10, 7), (11, 8)):
        p[child] = p[parent] * sig(c[child])
        p[parent] = p[parent] * (1 - sig(c[child]))

    spine_gate = sig(c[24])
    spine = sm3(c[12], c[13], c[14])
    p[12] = p[9] * spine_gate * spine[..., 0]
    p[13] = p[9] * spine_gate * spine[..., 1]
    p[14] = p[9] * spine_gate * spine[..., 2]
    p[9] = p[9] * (1 - spine_gate)

    p[15] = p[12] * sig(c[15])
    p[12] = p[12] * (1 - sig(c[15]))
    for child, parent in ((16, 13), (17, 14), (18, 16), (19, 17),
                          (20, 18), (21, 19), (22, 20), (23, 21)):
        p[child] = p[parent] * sig(c[child])
        p[parent] = p[parent] * (1 - sig(c[child]))

    return jnp.stack(p, axis=-1)


def rotation_z(degrees: float) -> np.ndarray:
    """Rz rotation matrix (host-side numpy)."""
    th = np.deg2rad(degrees)
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]],
                    dtype=np.float64)


def get_02v_bone_transforms(Jtr) -> np.ndarray:
    """A-pose -> Vitruvian (star) pose leg-chain transforms, (24, 4, 4).

    Rotates the two leg chains by +/-45 degrees about z, accumulating
    translations down each chain. Host-side numpy (used by the data
    pipeline); a jnp twin is `get_02v_bone_transforms_jnp` for the
    train-SMPL path. Mirrors `utils/utils.py:233-269`.
    """
    Jtr = np.asarray(Jtr, dtype=np.float64)
    out = np.tile(np.eye(4), (24, 1, 1))
    for chain, rot in (([1, 4, 7, 10], rotation_z(45.0)),
                       ([2, 5, 8, 11], rotation_z(-45.0))):
        for i, j_idx in enumerate(chain):
            out[j_idx, :3, :3] = rot
            t = Jtr[j_idx].copy()
            if i > 0:
                parent = chain[i - 1]
                t = rot @ (t - Jtr[parent]) + out[parent, :3, 3]
            out[j_idx, :3, 3] = t
        out[chain, :3, 3] -= Jtr[chain] @ rot.T
    return out.astype(np.float32)


def get_02v_bone_transforms_jnp(Jtr: jax.Array) -> jax.Array:
    """Differentiable (24, 4, 4) 02v transforms for the SMPL-refinement path
    (reference `lightning_model.py:37-99`)."""
    rot45p = jnp.asarray(rotation_z(45.0), Jtr.dtype)
    rot45n = jnp.asarray(rotation_z(-45.0), Jtr.dtype)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=Jtr.dtype), (24, 4, 4))
    out = eye

    def fill_chain(out, chain, rot):
        ts = []
        for i, j_idx in enumerate(chain):
            t = Jtr[j_idx]
            if i > 0:
                t = rot @ (t - Jtr[chain[i - 1]]) + ts[i - 1]
            ts.append(t)
        ts = jnp.stack(ts) - Jtr[jnp.array(chain)] @ rot.T
        for i, j_idx in enumerate(chain):
            out = out.at[j_idx, :3, :3].set(rot)
            out = out.at[j_idx, :3, 3].set(ts[i])
        return out

    out = fill_chain(out, [1, 4, 7, 10], rot45p)
    out = fill_chain(out, [2, 5, 8, 11], rot45n)
    return out
