"""Shared helper: SMPL parameters -> the per-frame npz record the datasets
consume (minimal_shape / bone_transforms / Jtr_posed / ...)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from arah_tpu.core.smpl import SmplModel, blend_shapes, lbs, vertices2joints


def frame_record(model: SmplModel, betas: np.ndarray, root_orient,
                 pose_body, pose_hand, trans) -> dict:
    """Compute one frame's npz fields (same contract as the reference
    preprocessing scripts, `preprocess_ZJU-MoCap.py:152-162`)."""
    betas = np.asarray(betas, np.float32).reshape(1, -1)
    pose = np.concatenate([np.asarray(root_orient, np.float32).reshape(3),
                           np.asarray(pose_body, np.float32).reshape(63),
                           np.asarray(pose_hand, np.float32).reshape(-1)])
    out = lbs(model, jnp.asarray(betas), jnp.asarray(pose)[None])
    v_shaped = np.asarray(
        model.v_template[None] + blend_shapes(jnp.asarray(betas),
                                              model.shapedirs))[0]
    trans = np.asarray(trans, np.float32).reshape(3)
    return dict(
        minimal_shape=v_shaped.astype(np.float32),
        betas=betas[0],
        Jtr_posed=np.asarray(out.joints_posed[0]) + trans,
        bone_transforms=np.asarray(out.rel_transforms[0]),
        trans=trans,
        root_orient=pose[:3], pose_body=pose[3:66], pose_hand=pose[66:])


def posed_vertices(model: SmplModel, record: dict) -> np.ndarray:
    """World-space posed verts from a frame record (for trans refits)."""
    pose = np.concatenate([record['root_orient'], record['pose_body'],
                           record['pose_hand']])
    out = lbs(model, jnp.asarray(record['betas'])[None],
              jnp.asarray(pose)[None])
    return np.asarray(out.verts[0]) + record['trans']
