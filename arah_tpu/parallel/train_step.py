"""Data-parallel training step: ray blocks sharded over the device mesh.

Re-design of the reference's trainer loop (PyTorch-Lightning DDP,
`lightning_model.py:140-158` + NCCL all-reduce) as a single jitted SPMD
program: `shard_map` over the `data` mesh axis, per-device vmapped render +
loss over local ray blocks, gradient `pmean` over the axis (XLA lowers it
to an ICI/DCN all-reduce overlapped with the backward pass by the latency
hiding scheduler), then a replicated optimizer update.

A "ray block" is one camera view's sampled ray batch (2048 rgb-loss rays
[+ patch rays]); with one block per device this is exactly the reference's
1-image-per-GPU DDP semantics, but blocks can also subdivide a view to
scale past the number of cameras.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from arah_tpu.model import FrameData
from arah_tpu.render.renderer import ModelConfig, RenderInputs, render
from arah_tpu.train.loss import LossWeights, compute_loss


class TrainBatch(NamedTuple):
    """One optimization step's data. Leading dim B = ray blocks (sharded);
    frame-level fields are replicated — except in per-block-frame mode
    (`make_train_step(per_block_frame=True)`), where `frame` leaves and
    `latent_idx` also carry a leading B dim and shard with the blocks.
    That mode lifts the reference's one-frame-per-step restriction
    (`ray_tracing.py:129-132` asserts SMPL params shared across the
    batch): each block may come from a different training frame, giving
    decorrelated gradients and frames-per-chip scaling (the per-frame
    hypernet pass already runs per block, so the extra cost is nil)."""
    # per-block (B, ...)
    cam_loc: Any          # (B, 3)
    ray_dirs: Any         # (B, R, 3)
    near: Any             # (B, R)
    far: Any              # (B, R)
    rgb_gt: Any           # (B, R, 3)
    body_mask: Any        # (B, R) int32 (0 bg, 1 fg, 100 boundary)
    points_uniform: Any   # (B, U, 3) normalized cano
    points_skinning: Any  # (B, S, 3) metric cano
    points_inside: Any    # (B, I, 3) normalized cano
    sampled_weights: Any  # (B, S, 24)
    rots_noise: Any       # (B, 24, 9) additive hypernet pose noise (0 = off)
    view_noise: Any       # (B, 3, 3) view rotation augment (I = off)
    rot_noise: Any        # (B, 1, 9) color-net root-rot noise (0 = off)
    trans_noise: Any      # (B, 1, 3) color-net root-trans noise (0 = off)
    uv: Any               # (B, R, 3) K^-1-lifted pixels (camera refinement)
    cam_idx: Any          # (B,) int32 camera index (camera refinement)
    # replicated frame-level state
    frame: FrameData
    latent_idx: Any       # () int32 frame index (latent + SMPL refinement)

N_PER_BLOCK_FIELDS = 16   # leading fields sharded over the mesh axis


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Any


def _refined_frame(params, smpl_model, frame_idx,
                   box_margin: float = 0.05) -> FrameData:
    """Recompute the frame from the *learnable* per-frame SMPL params —
    gradients flow into pose/shape exactly as in the reference's
    train-SMPL branch (`lightning_model.py:501-545`,
    `models/__init__.py:88-125,317-339`)."""
    from arah_tpu.model import prepare_frame
    sp = params['smpl_params']
    pose = jnp.concatenate([sp['root_orient'][frame_idx],
                            sp['pose_body'][frame_idx],
                            sp['pose_hand'][frame_idx]], axis=-1)
    return prepare_frame(smpl_model, params['betas'], pose,
                         sp['trans'][frame_idx], box_margin=box_margin)


def _refined_rays(params, batch: TrainBatch, b):
    """Recompute rays/cam from learnable extrinsics (quaternion + trans),
    mirroring `compose_inputs`'s train-cameras branch
    (`lightning_model.py:473-481`)."""
    from arah_tpu.core.smpl import quat_to_rot
    R = quat_to_rot(params['cam_rots'][batch.cam_idx[b]])
    t = params['cam_trans'][batch.cam_idx[b]]
    cam_loc = -R.T @ t
    rays = batch.uv[b] @ R
    rays = rays / (jnp.linalg.norm(rays, axis=-1, keepdims=True) + 1e-12)
    return cam_loc, rays


def _block_loss(params, cfg: ModelConfig, loss_w: LossWeights,
                batch: TrainBatch, latent, b, key,
                smpl_model=None, refine_smpl=False, refine_cameras=False,
                perceptual_fn=None, per_block_frame=False):
    """Render + loss for one ray block (index b into batch arrays)."""
    fd: FrameData = batch.frame
    latent_idx = batch.latent_idx
    if per_block_frame:
        fd = jax.tree.map(lambda a: a[b], fd)
        latent_idx = latent_idx[b]
    if refine_smpl and smpl_model is not None:
        fd = _refined_frame(params, smpl_model, latent_idx)
    cam_loc, ray_dirs = batch.cam_loc[b], batch.ray_dirs[b]
    if refine_cameras:
        cam_loc, ray_dirs = _refined_rays(params, batch, b)
    pose_cond_extra = {}
    if latent is not None:
        pose_cond_extra['latent_code'] = latent[None]
        pose_cond_extra['rot_noise'] = batch.rot_noise[b]
        pose_cond_extra['trans_noise'] = batch.trans_noise[b]
    inp = RenderInputs(
        cam_loc=cam_loc, ray_dirs=ray_dirs,
        near=batch.near[b], far=batch.far[b],
        frame=fd.frame, smpl=fd.smpl,
        rots=fd.rots, Jtrs=fd.Jtrs, rots_full=fd.rots_full,
        Jtrs_posed=fd.Jtrs_posed,
        pose_cond_extra=pose_cond_extra,
        geo_latent=latent,
        rots_noise=batch.rots_noise[b][None],
        view_noise=batch.view_noise[b],
        points_uniform=batch.points_uniform[b],
        points_skinning=batch.points_skinning[b],
        points_inside=batch.points_inside[b],
    )
    out = render(params, cfg, inp, key, training=True)
    gt = {'rgb': batch.rgb_gt[b], 'body_mask': batch.body_mask[b],
          'sampled_weights': batch.sampled_weights[b]}
    return compute_loss(out, gt, loss_w, perceptual_fn=perceptual_fn)


def make_train_step(cfg: ModelConfig, loss_w: LossWeights, optimizer,
                    mesh: Mesh | None = None, axis: str = 'data',
                    smpl_model=None, refine_smpl: bool = False,
                    refine_cameras: bool = False,
                    donate: bool = True,
                    per_block_frame: bool = False):
    """Build the jitted (optionally sharded) train step.

    Returns step(state, batch, key) -> (state, metrics). With a mesh, batch
    blocks must be sharded over `axis` and divisible by its size.
    donate=True (default) aliases the input TrainState's buffers into the
    outputs (the ~90 M-param Adam state would otherwise double-buffer
    ~1 GB of HBM); the passed-in state is DELETED after the call — pass
    donate=False to step repeatedly from one state (A/B harnesses).
    refine_smpl/refine_cameras enable the differentiable per-frame SMPL /
    camera-extrinsic paths (params['smpl_params']/'betas'/'cam_rots'/
    'cam_trans' must exist).
    per_block_frame=True: batch.frame leaves and latent_idx carry a
    leading B dim (one frame per ray block, sharded with the blocks) —
    see TrainBatch docstring. Build such batches with
    `collate_train_batch_np(..., per_block_frame=True)` /
    `synthetic_train_batch(..., fds=[...])`.
    """
    perceptual_fn = None
    if loss_w.perceptual > 0:
        # LPIPS patch loss (`loss.py:62-84`) — real VGG LPIPS when the
        # converted weights exist, else a differentiable MS-DSSIM proxy
        # (loud warning; see utils/lpips_jax.metric_key)
        from arah_tpu.utils.lpips_jax import make_perceptual_loss
        perceptual_fn = make_perceptual_loss()

    def loss_fn(params, batch: TrainBatch, key, n_local_blocks):
        def block_latent(b):
            if 'latent' not in params:
                return None
            idx = batch.latent_idx[b] if per_block_frame \
                else batch.latent_idx
            return params['latent'][idx]
        keys = jax.random.split(key, n_local_blocks)
        losses = [
            _block_loss(params, cfg, loss_w, batch, block_latent(b), b,
                        keys[b],
                        smpl_model=smpl_model, refine_smpl=refine_smpl,
                        refine_cameras=refine_cameras,
                        perceptual_fn=perceptual_fn,
                        per_block_frame=per_block_frame)
            for b in range(n_local_blocks)
        ]
        losses = jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs)), *losses)
        return losses['loss'], losses

    def local_step(params, opt_state, step, batch, key, n_local, in_mesh):
        if in_mesh:
            # decorrelate per-device randomness (eikonal samples, z jitter)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, key, n_local)
        if in_mesh:
            grads = jax.lax.pmean(grads, axis)
            losses = jax.lax.pmean(losses, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, step + 1, losses

    if mesh is None:
        @partial(jax.jit, donate_argnums=(0,) if donate else ())
        def step_fn(state: TrainState, batch: TrainBatch, key):
            n_blocks = batch.ray_dirs.shape[0]
            p, o, s, losses = local_step(
                state.params, state.opt_state, state.step, batch, key,
                n_blocks, in_mesh=False)
            return TrainState(p, o, s), losses
        return step_fn

    # pytree-prefix specs: per-block leaves sharded on `axis`; frame state
    # and latent index replicated — or sharded too in per-block-frame mode
    fspec = P(axis) if per_block_frame else P()
    block_spec = TrainBatch(*([P(axis)] * N_PER_BLOCK_FIELDS),
                            frame=fspec, latent_idx=fspec)

    def sharded(params, opt_state, step, batch, key):
        n_local = batch.ray_dirs.shape[0]
        return local_step(params, opt_state, step, batch, key, n_local,
                          in_mesh=True)

    sharded_step = shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P(), P(), block_spec, P()),
        out_specs=(P(), P(), P(), P()),
        # varying-manual-axes checking rejects the solver while_loop/scan
        # carries: their inits mix replicated frame state with per-device
        # ray state, which would need jax.lax.pcast(..., to='varying') at
        # every loop entry (verified: check_vma=True fails in
        # dryrun_multichip with exactly that suggestion). The collectives
        # here are a single grad/loss pmean, checked by
        # tests/test_multiprocess.py grad-sync.
        check_vma=False)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step_fn(state: TrainState, batch: TrainBatch, key):
        p, o, s, losses = sharded_step(
            state.params, state.opt_state, state.step, batch, key)
        return TrainState(p, o, s), losses

    return step_fn
