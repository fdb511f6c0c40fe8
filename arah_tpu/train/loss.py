"""Training losses for the ARAH renderer.

Functional port of `im2mesh/metaavatar_render/renderer/loss.py:6-191`
(`IDHRLoss`): weighted sum of RGB (first `n_ray_loss` rays), patch
perceptual, eikonal, mask, off-surface, inside, hypernet-params and
skinning-weight losses. All terms are computed densely with masks (no
boolean indexing), normalizing by the same denominators as the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    rgb: float = 30.0
    perceptual: float = 0.0
    eikonal: float = 50.0
    mask: float = 0.0
    off_surface: float = 100.0
    inside: float = 10.0
    params: float = 100.0
    skinning: float = 10.0
    rgb_loss_type: str = 'l1'       # l1 | mse | smoothed_l1
    n_ray_loss: int = 2048          # rays used for per-ray RGB loss
    patch_size: int = 48            # patch side for the perceptual loss


def safe_norm(x, axis=-1, eps=1e-12):
    """L2 norm with a zero-safe gradient (torch's norm backward returns 0 at
    0; naive jnp.linalg.norm gives NaN)."""
    sq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, eps))


def _rgb_residual(pred, gt, kind):
    if kind == 'l1':
        return jnp.abs(pred - gt)
    if kind == 'mse':
        return (pred - gt) ** 2
    if kind == 'smoothed_l1':
        beta = 0.1
        d = jnp.abs(pred - gt)
        return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    raise ValueError(kind)


def compute_loss(outputs: dict, ground_truth: dict, w: LossWeights,
                 perceptual_fn=None):
    """All-in-one loss. outputs/ground_truth use flat (N, ...) ray arrays.

    outputs keys (from render(..., training=True)):
      rgb_values (N,3), weights_sum (N,), network_body_mask (N,) bool,
      grad_theta (E,3), off_surface_sdf (U,), inside_sdf (I,),
      sdf_params [per-layer (P_i,)], pred_weights (S,24)
    ground_truth keys:
      rgb (N,3), body_mask (N,) int (fg=1, boundary=100, bg=0),
      sampled_weights (S,24)
    """
    n_loss = w.n_ray_loss
    rgb_pred = outputs['rgb_values'][:n_loss]
    rgb_gt = ground_truth['rgb'][:n_loss]
    body_mask = ground_truth['body_mask'][:n_loss]
    net_mask = outputs['network_body_mask'][:n_loss]
    denom = jnp.float32(n_loss)

    losses = {}

    # RGB loss (`loss.py:46-60`): boundary pixels (label 100) ignored when
    # patch sampling is in use (mask values > 1 present).
    has_boundary = jnp.max(ground_truth['body_mask']) > 1
    valid = net_mask & jnp.where(has_boundary, body_mask != 100, True)
    res = _rgb_residual(rgb_pred, rgb_gt, w.rgb_loss_type)
    losses['rgb_loss'] = jnp.sum(res * valid[:, None]) / denom

    # Perceptual loss on patch rays (rays n_loss..end), `loss.py:62-84`.
    if w.perceptual > 0 and perceptual_fn is not None:
        ps = w.patch_size
        pred_patch = outputs['rgb_values'][n_loss:].reshape(-1, ps, ps, 3)
        gt_patch = ground_truth['rgb'][n_loss:].reshape(-1, ps, ps, 3)
        losses['perceptual_loss'] = perceptual_fn(pred_patch, gt_patch)
    else:
        losses['perceptual_loss'] = jnp.float32(0.0)

    # Eikonal (`loss.py:86-92`)
    if 'grad_theta' in outputs:
        g = outputs['grad_theta']
        losses['eikonal_loss'] = jnp.sum(
            jnp.abs(safe_norm(g, axis=-1) - 1.0)) / denom
    else:
        losses['eikonal_loss'] = jnp.float32(0.0)

    # Mask loss (`loss.py:94-102`). Note the reference's
    # `torch.norm(x - gt, dim=-1).sum()` acts on a 1-D masked selection,
    # i.e. it is the L2 norm of the WHOLE residual vector, and `gt` is the
    # raw mask value (boundary label 100 included) cast to float.
    off_mask = outputs['network_body_mask'][:n_loss]
    diff = (outputs['weights_sum'][:n_loss]
            - body_mask.astype(jnp.float32)) * off_mask
    losses['mask_loss'] = safe_norm(diff) / denom

    # Off-surface (`loss.py:104-106`)
    if 'off_surface_sdf' in outputs:
        losses['off_surface_loss'] = jnp.sum(
            jnp.exp(-1e2 * outputs['off_surface_sdf'])) / denom
    else:
        losses['off_surface_loss'] = jnp.float32(0.0)

    # Inside (`loss.py:120-121`)
    if 'inside_sdf' in outputs:
        losses['inside_loss'] = jnp.sum(
            jax.nn.sigmoid(outputs['inside_sdf'] * 5e3)) / denom
    else:
        losses['inside_loss'] = jnp.float32(0.0)

    # Hypernet params L2 (`loss.py:108-112`)
    if 'sdf_params' in outputs:
        flat = jnp.concatenate(
            [p.reshape(-1) for p in outputs['sdf_params']])
        losses['sdf_params_loss'] = safe_norm(flat) / flat.shape[0]
    else:
        losses['sdf_params_loss'] = jnp.float32(0.0)

    # Skinning supervision (`loss.py:117-118`)
    if 'pred_weights' in outputs and 'sampled_weights' in ground_truth:
        losses['skinning_loss'] = jnp.mean(jnp.sum(jnp.abs(
            outputs['pred_weights'] - ground_truth['sampled_weights']),
            axis=-1))
    else:
        losses['skinning_loss'] = jnp.float32(0.0)

    total = (w.rgb * losses['rgb_loss']
             + w.perceptual * losses['perceptual_loss']
             + w.eikonal * losses['eikonal_loss']
             + w.mask * losses['mask_loss']
             + w.off_surface * losses['off_surface_loss']
             + w.inside * losses['inside_loss']
             + w.params * losses['sdf_params_loss']
             + w.skinning * losses['skinning_loss'])
    losses['loss'] = total
    return losses
