"""LEAP-style hierarchical pose encoder.

Functional port of reference `siren_modules.py:196-244`
(`HierarchicalPoseEncoder`): a global 288->6 linear plus one tiny
(19->19->ReLU->6) MLP per joint, composed down the kinematic tree.
Output: (B, 144) = 24 joints x 6 features.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from arah_tpu.core.smpl import SMPL_PARENTS, NUM_JOINTS
from arah_tpu.nn.layers import init_linear, linear


def init_pose_encoder(key, num_joints: int = NUM_JOINTS):
    keys = jax.random.split(key, num_joints + 1)
    params = {
        'layer_0': init_linear(keys[0], 9 * num_joints + 3 * num_joints, 6),
        'layers': [
            {'fc1': init_linear(jax.random.fold_in(keys[j + 1], 0), 19, 19),
             'fc2': init_linear(jax.random.fold_in(keys[j + 1], 1), 19, 6)}
            for j in range(num_joints)
        ],
    }
    return params


def pose_encoder_apply(params, rots: jax.Array, Jtrs: jax.Array,
                       rel_joints: bool = False) -> jax.Array:
    """rots: (B, 24, 9) flattened local rotations; Jtrs: (B, 24, 3).

    The per-joint python loop is static (24 iterations) and unrolls into a
    fixed graph of tiny matmuls; XLA fuses them. Mirrors
    `siren_modules.py:217-244` exactly, including the rel_joints branch.
    """
    batch = rots.shape[0]
    parents = SMPL_PARENTS
    if rel_joints:
        # reference computes this under no_grad; result is a constant input
        Jtrs = jax.lax.stop_gradient(jnp.concatenate(
            [Jtrs[:, :1, :], Jtrs[:, 1:, :] - Jtrs[:, parents[1:], :]],
            axis=1))

    global_feat = jnp.concatenate(
        [rots.reshape(batch, -1), Jtrs.reshape(batch, -1)], axis=-1)
    global_feat = linear(params['layer_0'], global_feat)

    out = [None] * NUM_JOINTS
    for j in range(NUM_JOINTS):
        rot = rots[:, j, :]
        Jtr = Jtrs[:, j, :]
        parent = int(parents[j])
        if parent == -1:
            bone_l = jnp.linalg.norm(Jtr, axis=-1, keepdims=True)
            parent_feat = global_feat
        else:
            bone_l = jnp.linalg.norm(
                Jtr if rel_joints else Jtr - Jtrs[:, parent, :],
                axis=-1, keepdims=True)
            parent_feat = out[parent]
        in_feat = jnp.concatenate([rot, Jtr, bone_l, parent_feat], axis=-1)
        h = jax.nn.relu(linear(params['layers'][j]['fc1'], in_feat))
        out[j] = linear(params['layers'][j]['fc2'], h)

    return jnp.concatenate(out, axis=-1)
