"""Differentiable SMPL linear blend skinning in pure JAX.

Functional re-design of the reference SMPL stack
(`/root/reference/human_body_prior/body_model/lbs.py:34-263` and
`body_model.py:9-198`): same math, but expressed as jit-friendly pure
functions over a `SmplModel` pytree, with the kinematic-chain composition
written as a `lax.scan`-free unrolled matmul chain (24 joints is static).

All functions operate on batched arrays (leading batch dim B).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# SMPL kinematic tree (parent of each of the 24 joints). Standard SMPL
# topology, same as reference `siren_modules.py:204-205`.
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21], dtype=np.int32)

NUM_JOINTS = 24


class SmplModel(NamedTuple):
    """Static SMPL template data (host-loaded, device-replicated).

    Mirrors the `body_models/misc/*.npz` assets the reference extracts from
    SMPL pickles (`extract_smpl_parameters.py:1-24`).
    """
    v_template: jax.Array   # (V, 3)
    shapedirs: jax.Array    # (V, 3, n_betas)
    posedirs: jax.Array     # (23*9, V*3)
    J_regressor: jax.Array  # (24, V)
    lbs_weights: jax.Array  # (V, 24)
    parents: jax.Array      # (24,) int32
    faces: jax.Array        # (F, 3) int32


def batch_rodrigues(aa: jax.Array) -> jax.Array:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3).

    Matches reference `lbs.py:166-193` including the `+1e-8` inside the norm.
    """
    angle = jnp.linalg.norm(aa + 1e-8, axis=1, keepdims=True)  # (N, 1)
    rot_dir = aa / angle
    cos = jnp.cos(angle)[:, None]   # (N, 1, 1)
    sin = jnp.sin(angle)[:, None]
    rx, ry, rz = jnp.split(rot_dir, 3, axis=1)
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)
    ident = jnp.eye(3, dtype=aa.dtype)[None]
    return ident + sin * K + (1.0 - cos) * (K @ K)


def transform_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3) -> homogeneous (..., 4, 4)."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, t[..., None]], axis=-1)          # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(rot_mats: jax.Array, joints: jax.Array,
                          parents: jax.Array):
    """Compose the kinematic chain.

    Args:
      rot_mats: (B, J, 3, 3) local joint rotations.
      joints: (B, J, 3) rest-pose joint locations.
      parents: (J,) parent indices (parents[0] == -1).

    Returns:
      posed_joints: (B, J, 3)
      rel_transforms: (B, J, 4, 4) — relative to rest pose (the "A" matrices).
      abs_transforms: (B, J, 4, 4) — absolute world transforms.

    Matches reference `lbs.py:208-263`. The python loop over 24 joints is
    static so XLA unrolls it into a fixed matmul chain.
    """
    parents = np.asarray(parents)
    rel_joints = joints - jnp.where(
        (parents >= 0)[None, :, None], joints[:, np.maximum(parents, 0)], 0.0)
    transforms_mat = transform_mat(rot_mats, rel_joints)  # (B, J, 4, 4)

    chain = [transforms_mat[:, 0]]
    for i in range(1, parents.shape[0]):
        chain.append(chain[int(parents[i])] @ transforms_mat[:, i])
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[:, :, :3, 3]

    # rel = abs - abs @ [0; J_rest] (column-only correction).
    joints_homo = jnp.concatenate(
        [joints, jnp.zeros_like(joints[..., :1])], axis=-1)  # (B, J, 4)
    init_bone = jnp.einsum('bjik,bjk->bji', transforms, joints_homo)
    correction = jnp.zeros_like(transforms).at[..., :, 3].set(init_bone)
    rel_transforms = transforms - correction
    return posed_joints, rel_transforms, transforms


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """(B, n_betas) x (V, 3, n_betas) -> (B, V, 3). Ref `lbs.py:142-163`."""
    return jnp.einsum('bl,mkl->bmk', betas, shape_disps)


def vertices2joints(J_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """(J, V) x (B, V, 3) -> (B, J, 3). Ref `lbs.py:122-139`."""
    return jnp.einsum('bik,ji->bjk', vertices, J_regressor)


class LbsOutput(NamedTuple):
    verts: jax.Array            # (B, V, 3) posed vertices (no global trans)
    joints_posed: jax.Array     # (B, J, 3)
    joints_rest: jax.Array      # (B, J, 3)
    rel_transforms: jax.Array   # (B, J, 4, 4) bone transforms "A"
    abs_transforms: jax.Array   # (B, J, 4, 4)
    v_posed: jax.Array          # (B, V, 3) shaped+pose-blend-shaped template


def lbs(model: SmplModel, betas: jax.Array, pose: jax.Array,
        apply_pose_blendshapes: bool = True) -> LbsOutput:
    """SMPL linear blend skinning. Ref `lbs.py:34-119`.

    Args:
      betas: (B, n_betas)
      pose: (B, 72) axis-angle, root first.
    """
    batch_size = betas.shape[0]
    v_shaped = model.v_template[None] + blend_shapes(betas, model.shapedirs)
    J = vertices2joints(model.J_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(
        batch_size, -1, 3, 3)

    if apply_pose_blendshapes:
        ident = jnp.eye(3, dtype=pose.dtype)
        pose_feature = (rot_mats[:, 1:] - ident).reshape(batch_size, -1)
        pose_offsets = (pose_feature @ model.posedirs).reshape(
            batch_size, -1, 3)
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    J_transformed, A, abs_A = batch_rigid_transform(rot_mats, J, model.parents)

    # Per-vertex transforms: (B, V, 24) @ (B, 24, 16) -> (B, V, 4, 4)
    W = jnp.broadcast_to(model.lbs_weights[None],
                         (batch_size,) + model.lbs_weights.shape)
    T = (W @ A.reshape(batch_size, NUM_JOINTS, 16)).reshape(
        batch_size, -1, 4, 4)
    verts = jnp.einsum('bvij,bvj->bvi', T[..., :3, :3], v_posed) \
        + T[..., :3, 3]
    return LbsOutput(verts, J_transformed, J, A, abs_A, v_posed)


def load_smpl_assets(misc_dir: str, gender: str = 'neutral') -> SmplModel:
    """Load the reference-format `body_models/misc/*.npz` assets.

    Layout per `extract_smpl_parameters.py:1-24`:
      v_templates.npz[gender] (V,3); shapedirs_all.npz[gender] (V,3,10);
      posedirs_all.npz[gender] (V,3,207) -> reshaped (207, V*3);
      J_regressors.npz[gender] (24,V); skinning_weights_all.npz[gender] (V,24);
      kintree_table.npy (2,24); faces.npz['faces'].
    """
    import os
    v_template = np.load(os.path.join(misc_dir, 'v_templates.npz'))[gender]
    shapedirs = np.load(os.path.join(misc_dir, 'shapedirs_all.npz'))[gender]
    posedirs = np.load(os.path.join(misc_dir, 'posedirs_all.npz'))[gender]
    posedirs = posedirs.reshape([posedirs.shape[0] * 3, -1]).T
    J_regressor = np.load(os.path.join(misc_dir, 'J_regressors.npz'))[gender]
    lbs_weights = np.load(
        os.path.join(misc_dir, 'skinning_weights_all.npz'))[gender]
    kintree = np.load(os.path.join(misc_dir, 'kintree_table.npy'))
    faces = np.load(os.path.join(misc_dir, 'faces.npz'))['faces']
    parents = kintree[0].astype(np.int32)
    parents[0] = -1
    return SmplModel(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        J_regressor=jnp.asarray(J_regressor, jnp.float32),
        lbs_weights=jnp.asarray(lbs_weights, jnp.float32),
        parents=jnp.asarray(parents),
        faces=jnp.asarray(faces.astype(np.int32)),
    )


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit-normalized quaternion (..., 4) in xyzw order -> (..., 3, 3)
    rotation matrices (kornia XYZW convention, used by the camera
    refinement path, reference `lightning_model.py:477`)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)
