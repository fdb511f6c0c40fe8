"""Full-image evaluation / test-time rendering.

Re-design of the reference's validation/test steps
(`lightning_model.py:160-401`): render all box rays of a frame in
fixed-size padded chunks (one compiled program serves every chunk),
scatter back into the image via the box mask, derive a normal image
either from finite-difference depth (validation,
`lightning_model.py:184-205`) or by extracting + posing + rasterizing the
canonical mesh (test, `models/__init__.py:203-311`), then compute
PSNR/SSIM/LPIPS and write pngs / mp4.
"""
from __future__ import annotations

import os
from functools import partial

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from arah_tpu.data.loader import frame_from_item
from arah_tpu.render.renderer import ModelConfig, RenderInputs, render
from arah_tpu.utils import metrics as metrics_lib


@partial(jax.jit, static_argnames=('cfg',))
def _render_eval_chunk(params, cfg: ModelConfig, inp: RenderInputs, key):
    out = render(params, cfg, inp, key, training=False)
    return (out['rgb_values'], out['weights_sum'],
            out['surface_depth'], out['surface_converged'])


@partial(jax.jit, static_argnames=('cfg', 'mesh'))
def _render_eval_chunk_sharded(params, cfg: ModelConfig, inp: RenderInputs,
                               key, mesh):
    """Mesh-sharded eval chunk: rays split over the 'data' axis with
    shard_map (manual SPMD), so the Pallas tracer kernels run per-device
    — GSPMD sharding propagation has no partitioning rule for
    pallas_call. Everything but the per-ray arrays is replicated."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ray_spec = RenderInputs(
        cam_loc=P(), ray_dirs=P('data'), near=P('data'), far=P('data'),
        frame=P(), smpl=P(), rots=P(), Jtrs=P(), rots_full=P(),
        Jtrs_posed=P(), pose_cond_extra=P(), geo_latent=P(),
        rots_noise=P(), view_noise=P(), points_uniform=P(),
        points_skinning=P(), points_inside=P(), points_eik=P())

    def block(params, inp, key):
        out = render(params, cfg, inp, key, training=False)
        return (out['rgb_values'], out['weights_sum'],
                out['surface_depth'], out['surface_converged'])

    return shard_map(
        block, mesh=mesh,
        in_specs=(P(), ray_spec, P()),
        out_specs=(P('data'), P('data'), P('data'), P('data')),
        # same waiver as parallel/train_step.py: the solver loop carries
        # mix replicated frame state with per-device ray state
        check_vma=False)(params, inp, key)


# candidate chunk -> measured eval rays/s on v5e (PERF.md round-4 chunk
# sweep: 68.0k / 74.4k / 77.6k). Only the RATIOS matter: the auto-chunk
# minimizes estimated wall time ceil(n/c)*c / rate(c), so bigger chunks
# win on big frames while small fixture frames avoid 3-4x padding.
_AUTO_CHUNKS = ((8192, 68.0), (16384, 74.4), (32768, 77.6))


def pick_eval_chunk(n_rays: int) -> int:
    """Pad-aware auto-chunk (VERDICT r4 #7): choose the chunk from the
    frame's box-ray count by minimizing padded work weighted by the
    measured per-chunk throughput (32768 for full 512^2 frames ~260k
    box rays, 16384/8192 for fixture-sized frames). Candidates are
    fixed so compiled executables are reused across frames."""
    best, best_t = None, None
    for c, rate in _AUTO_CHUNKS:
        t = -(-n_rays // c) * c / rate
        if best_t is None or t < best_t:
            best, best_t = c, t
    return best


def render_frame_rays(params, cfg: ModelConfig, fd, item, latent,
                      chunk: int | None = None, key=None, mesh=None):
    """Render every sampled ray of an eval item; returns (rgb (N, 3),
    weights (N,), depth (N,), converged (N,)).

    chunk=None picks the pad-aware auto-chunk (`pick_eval_chunk`).

    With a `mesh`, each chunk's rays are sharded over the `data` axis
    (multi-chip eval; params/frame state replicated) — the arah_tpu
    equivalent of the reference's DDP validation all_gather
    (`lightning_model.py:250-283`), expressed as XLA SPMD."""
    if key is None:
        key = jax.random.PRNGKey(0)
    shard = rep = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(mesh, P('data'))
        rep = NamedSharding(mesh, P())
        # params/frame state may be committed to a single device (e.g.
        # restored from a checkpoint); replicate them over the mesh so
        # they are compatible with the sharded ray arrays
        params = jax.device_put(params, rep)
        fd = jax.device_put(fd, rep)
    rays = np.asarray(item['inputs.ray_dirs'])
    bounds = np.asarray(item['inputs.body_bounds_intersections'])
    n = rays.shape[0]
    if chunk is None:
        chunk = pick_eval_chunk(n)
        if mesh is not None:
            # sharded chunks must split evenly over the data axis
            chunk = max(chunk - chunk % mesh.size, mesh.size)

    pose_cond_extra = {}
    geo_latent = None
    if latent is not None:
        pose_cond_extra['latent_code'] = latent[None]
        geo_latent = latent
    cam_loc = jnp.asarray(item['image.cam_loc']).reshape(3)
    if rep is not None:
        # every non-ray leaf must be replicated over the mesh
        cam_loc, pose_cond_extra, geo_latent = jax.device_put(
            (cam_loc, pose_cond_extra, geo_latent), rep)

    def run_chunk(ray_d, near, far):
        # module-level jit (static cfg) so the compiled executable is
        # reused across frames and CLI invocations of the same config
        inp = RenderInputs(
            cam_loc=cam_loc,
            ray_dirs=ray_d, near=near, far=far,
            frame=fd.frame, smpl=fd.smpl, rots=fd.rots, Jtrs=fd.Jtrs,
            rots_full=fd.rots_full, Jtrs_posed=fd.Jtrs_posed,
            pose_cond_extra=pose_cond_extra, geo_latent=geo_latent)
        if mesh is not None:
            return _render_eval_chunk_sharded(params, cfg, inp, key, mesh)
        return _render_eval_chunk(params, cfg, inp, key)

    rgb = np.zeros((n, 3), np.float32)
    weights = np.zeros((n,), np.float32)
    depth = np.zeros((n,), np.float32)
    conv = np.zeros((n,), bool)
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        pad = chunk - (j - i)
        rd = np.pad(rays[i:j], ((0, pad), (0, 0)), mode='edge')
        nr = np.pad(bounds[i:j, 0], (0, pad), mode='edge')
        fr = np.pad(bounds[i:j, 1], (0, pad), mode='edge')
        rd_j, nr_j, fr_j = (jnp.asarray(rd), jnp.asarray(nr),
                            jnp.asarray(fr))
        if shard is not None:
            rd_j = jax.device_put(rd_j, shard)
            nr_j = jax.device_put(nr_j, shard)
            fr_j = jax.device_put(fr_j, shard)
        r, w, d, c = run_chunk(rd_j, nr_j, fr_j)
        rgb[i:j] = np.asarray(r)[:j - i]
        weights[i:j] = np.asarray(w)[:j - i]
        depth[i:j] = np.asarray(d)[:j - i]
        conv[i:j] = np.asarray(c)[:j - i]
    return rgb, weights, depth, conv


def scatter_image(values, image_mask, fill=0.0):
    """(N, C) ray values -> (H, W, C) image via the bool box mask."""
    H, W = image_mask.shape
    c = values.shape[-1] if values.ndim == 2 else 1
    img = np.full((H, W, c), fill, np.float32)
    img[image_mask] = values.reshape(-1, c)
    return img.squeeze(-1) if c == 1 else img


def normals_from_depth(points_cam, image_mask):
    """Finite-difference normal image from camera-space surface points
    (`lightning_model.py:184-205`)."""
    H, W = image_mask.shape
    pred_points = scatter_image(points_cam, image_mask)
    zs, xs, ys = (pred_points[..., 2], pred_points[..., 0],
                  pred_points[..., 1])
    with np.errstate(divide='ignore', invalid='ignore'):
        zy = (zs[1:, :] - zs[:-1, :]) / (ys[1:, :] - ys[:-1, :])
        zx = (zs[:, 1:] - zs[:, :-1]) / (xs[:, 1:] - xs[:, :-1])
    normals = np.zeros((H, W, 3), np.float32)
    normals[:-1, :, 1] = -zy
    normals[:, :-1, 0] = -zx
    normals[:, :, 2] = 1.0
    n = np.linalg.norm(normals, axis=-1, keepdims=True)
    with np.errstate(divide='ignore', invalid='ignore'):
        normals = normals / n
    normals[~np.isfinite(normals)] = -1
    return ((normals + 1) / 2).clip(0, 1)


def evaluate_frame(params, cfg: ModelConfig, item, latent=None,
                   chunk: int | None = None, lpips_fn=None, mesh=None):
    """Validation-style metrics for one eval item. Returns dict with
    psnr/ssim/lpips + rendered images. With `mesh`, ray chunks are
    sharded over its `data` axis (multi-chip eval)."""
    fd = frame_from_item(item)
    rgb, weights, depth, conv = render_frame_rays(
        params, cfg, fd, item, latent, chunk=chunk, mesh=mesh)
    image_mask = np.asarray(item['inputs.image_mask'])
    H = int(item['inputs.img_height'])
    W = int(item['inputs.img_width'])
    gt = np.asarray(item['inputs'])

    pred_img = scatter_image(rgb, image_mask)
    gt_img = scatter_image(gt, image_mask)

    # camera-space surface points for the normal image
    cam_loc = np.asarray(item['image.cam_loc']).reshape(3)
    rays = np.asarray(item['inputs.ray_dirs'])
    pts_world = cam_loc + depth[:, None] * rays
    R = np.asarray(item['image.R'])
    T = np.asarray(item['image.T']).reshape(3)
    pts_cam = pts_world @ R.T + T
    pts_cam[~conv] = 0
    normal_img = normals_from_depth(pts_cam, image_mask)

    from arah_tpu.utils.lpips_jax import metric_key
    out = {
        'psnr': metrics_lib.psnr(rgb, gt),
        'ssim': metrics_lib.ssim_metric(pred_img, gt_img, image_mask),
        # honest key: 'lpips' only with real calibrated VGG weights,
        # else 'lpips_proxy_msdssim' (never report the proxy as LPIPS)
        metric_key(): metrics_lib.lpips_metric(pred_img, gt_img,
                                               image_mask, lpips_fn),
        'rgb_pred': pred_img, 'rgb_gt': gt_img, 'normal_pred': normal_img,
    }
    return out


def _to_u8(img):
    return (np.clip(np.nan_to_num(img), 0, 1) * 255).astype(np.uint8)


def save_image(path, img):
    cv2.imwrite(path, cv2.cvtColor(_to_u8(img), cv2.COLOR_RGB2BGR))


def write_video(path, frames, fps: int = 20):
    """mp4 writer via cv2 (reference used imageio.mimwrite)."""
    if not frames:
        return
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'mp4v'), fps,
                         (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(_to_u8(f), cv2.COLOR_RGB2BGR))
    vw.release()
