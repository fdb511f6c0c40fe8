"""Model assembly: parameter init and per-frame input preparation.

The arah_tpu equivalent of the reference's model factory + input
composition (`im2mesh/metaavatar_render/config.py:147-302`,
`lightning_model.py:463-634`): builds the parameter pytree for all four
networks (+ optional latent codes / cameras / per-frame SMPL), and turns a
posed SMPL body into the `RenderInputs` the renderer consumes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from arah_tpu.core.linalg import inv_affine
import numpy as np

from arah_tpu.core.body import (get_02v_bone_transforms_jnp,
                                normalize_canonical_points)
from arah_tpu.core.smpl import (SmplModel, batch_rigid_transform,
                                batch_rodrigues, blend_shapes,
                                vertices2joints, NUM_JOINTS)
from arah_tpu.nn.color import ColorConfig, init_color
from arah_tpu.nn.deviation import init_deviation
from arah_tpu.nn.hypernet import init_hypernet
from arah_tpu.nn.skinning import init_skinning
from arah_tpu.render.ray_tracing import CanonicalFrame, SmplRef
from arah_tpu.render.renderer import ModelConfig


def init_model_params(key, cfg: ModelConfig, n_latent_frames: int = 0,
                      latent_dim: int = 128, n_cameras: int = 0,
                      deviation_init: float = 1e-3):
    """Build the full trainable parameter pytree.

    `latent` rows: one per training frame plus one fallback row used for
    novel sequences (reference `lightning_model.py:574-577` indexes
    `num_embeddings - 1` for out-of-distribution poses).
    """
    k = jax.random.split(key, 6)
    params = {
        'hypernet': init_hypernet(k[0], cfg.hypernet),
        'skinning': init_skinning(k[1], cfg.skinning),
        'color': init_color(k[2], cfg.color),
        'deviation': init_deviation(deviation_init),
    }
    if n_latent_frames > 0:
        params['latent'] = jax.random.normal(
            k[3], (n_latent_frames + 1, latent_dim)) * 1.0
    if n_cameras > 0:
        # quaternion (xyzw, identity) + translation per camera
        params['cam_rots'] = jnp.tile(
            jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n_cameras, 1))
        params['cam_trans'] = jnp.zeros((n_cameras, 3))
    return params


class FrameData(NamedTuple):
    """Everything derived from one frame's SMPL parameters."""
    frame: CanonicalFrame         # canonical <-> posed mapping state
    smpl: SmplRef                 # posed verts (world) + skinning weights
    verts_cano: jax.Array         # (V, 3) Vitruvian canonical verts
    rots: jax.Array               # (1, 24, 9) local rots, root = I
    rots_full: jax.Array          # (1, 24, 9) incl. root
    Jtrs: jax.Array               # (1, 24, 3) normalized rest joints
    Jtrs_posed: jax.Array         # (1, 24, 3) posed joints (world)
    bounds_min: jax.Array         # (3,) world AABB of posed body (+margin)
    bounds_max: jax.Array         # (3,)


def prepare_frame(model: SmplModel, betas: jax.Array, pose: jax.Array,
                  trans: jax.Array, box_margin: float = 0.05) -> FrameData:
    """SMPL params -> renderer frame inputs (fully differentiable).

    Dispatches to ONE jitted executable (joint topology static): on the
    axon-tunnelled TPU every EAGER jnp op is its own remote compile
    round-trip, and this function's ~100 small ops cost 400+ s of
    per-process startup eager (vs one persisted compile jitted).

    Mirrors the preprocessing done by the reference datasets
    (`data/zju_mocap.py:284-326,435-453`) and the train-SMPL branch of
    `compose_inputs` (`lightning_model.py:501-545`):

      1. shaped template (minimal shape) + rest joints,
      2. pose blend shapes, bone transforms A, posed verts (+trans),
      3. Vitruvian 02v canonicalization -> center / coord_min / coord_max,
      4. final bone transforms A @ inv(02v).

    Args: betas (10,), pose (72,) axis-angle, trans (3,).
    """
    parents_t = tuple(int(j) for j in np.asarray(model.parents))
    return _prepare_frame_jit(model, betas, pose, trans, box_margin,
                              parents_t)


@partial(jax.jit, static_argnames=('parents_t',))
def _prepare_frame_jit(model: SmplModel, betas, pose, trans, box_margin,
                       parents_t) -> FrameData:
    model = model._replace(parents=np.asarray(parents_t, np.int32))
    betas = betas[None]
    pose = pose[None]
    v_shaped = model.v_template[None] + blend_shapes(betas, model.shapedirs)
    Jtr = vertices2joints(model.J_regressor, v_shaped)          # (1, 24, 3)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(1, -1, 3, 3)
    ident = jnp.eye(3, dtype=pose.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(1, -1)
    pose_offsets = (pose_feature @ model.posedirs).reshape(1, -1, 3)
    minimal_shape = v_shaped + pose_offsets     # pose-blend-shaped template

    _, A, _ = batch_rigid_transform(rot_mats, Jtr, model.parents)

    W = model.lbs_weights
    T = (W @ A.reshape(1, NUM_JOINTS, 16)).reshape(1, -1, 4, 4)
    verts_posed = jnp.einsum('bvij,bvj->bvi', T[..., :3, :3],
                             minimal_shape) + T[..., :3, 3]
    verts_world = verts_posed[0] + trans
    Jtr_posed = jnp.einsum('bjik,bjk->bji', A[..., :3, :3], Jtr) \
        + A[..., :3, 3] + trans

    # Vitruvian canonicalization
    tf_02v = get_02v_bone_transforms_jnp(Jtr[0])                # (24, 4, 4)
    T02 = (W @ tf_02v.reshape(NUM_JOINTS, 16)).reshape(-1, 4, 4)
    verts_cano = jnp.einsum('vij,vj->vi', T02[:, :3, :3],
                            minimal_shape[0]) + T02[:, :3, 3]
    center = jnp.mean(verts_cano, axis=0)
    centered = verts_cano - center
    coord_max = jnp.max(centered)
    coord_min = jnp.min(centered)

    Jtr_norm = normalize_canonical_points(Jtr[0], coord_min, coord_max,
                                          center)

    bone_transforms = A[0] @ inv_affine(tf_02v)   # Vitruvian -> posed

    rots_full = rot_mats.reshape(1, NUM_JOINTS, 9)
    rots_local = jnp.concatenate(
        [jnp.broadcast_to(ident.reshape(1, 1, 9), (1, 1, 9)),
         rots_full[:, 1:]], axis=1)

    frame = CanonicalFrame(
        bone_transforms=bone_transforms, trans=trans,
        coord_min=coord_min, coord_max=coord_max, center=center)
    smpl_ref = SmplRef(verts_posed=verts_world,
                       skinning_weights=model.lbs_weights)
    return FrameData(
        frame=frame, smpl=smpl_ref, verts_cano=verts_cano,
        rots=rots_local, rots_full=rots_full,
        Jtrs=Jtr_norm[None], Jtrs_posed=Jtr_posed,
        bounds_min=jnp.min(verts_world, axis=0) - box_margin,
        bounds_max=jnp.max(verts_world, axis=0) + box_margin)
