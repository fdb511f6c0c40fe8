"""Canonical-mesh extraction + normal-map rendering for test-time
visualization.

Re-design of the reference's mesh branch
(`im2mesh/metaavatar_render/models/__init__.py:203-311`): marching-tets
mesh of the generated canonical SDF, forward-LBS skinning of the verts to
posed space, then native z-buffer rasterization of (a) the posed mesh
under the frame's camera and (b) the canonical mesh from front/back
viewpoints (pytorch3d's MeshRasterizer replaced by arahx.rasterize_mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from arah_tpu import native
from arah_tpu.core.body import unnormalize_canonical_points
from arah_tpu.nn.siren import siren_apply
from arah_tpu.nn.skinning import skinning_weights
from arah_tpu.render.renderer import (ModelConfig, generate_sdf,
                                      make_sdf_fn, make_skin_fn)
from arah_tpu.solver.root_find import forward_skinning
from arah_tpu.utils.meshing import extract_mesh


@jax.jit
def _sdf_grid_chunk(gen, pts):
    """Stable jit for grid evaluation (no per-frame retrace: the
    generated weights are arguments, not closure captures)."""
    return siren_apply(gen, pts)[..., 0]


from functools import partial as _partial


@_partial(jax.jit, static_argnames=('skin_cfg',))
def _fwd_skin_chunk(skin_params, skin_cfg, frame, pts):
    skin_fn = lambda x: skinning_weights(skin_params, skin_cfg, x)
    xb, _ = forward_skinning(skin_fn, frame, pts)
    return xb


def face_normals(verts, faces):
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return n


def _normal_image(face_buf, normals_rgb, bg=0.0):
    H, W = face_buf.shape
    img = np.full((H, W, 3), bg, np.float32)
    fg = face_buf >= 0
    img[fg] = normals_rgb[face_buf[fg]]
    return img


def render_normal_maps(params, cfg: ModelConfig, fd, item, latent,
                       resolution: int = 256, img_size: int = 512):
    """Returns (posed_normal, cano_front, cano_back) images in [0, 1]."""
    gen = generate_sdf(params, cfg, fd.rots, fd.Jtrs, latent)
    verts_n, faces = extract_mesh(
        lambda p: _sdf_grid_chunk(jax.lax.stop_gradient(gen), p),
        resolution)
    if len(verts_n) == 0:
        blank = np.zeros((img_size, img_size, 3), np.float32)
        return blank, blank, blank

    # canonical (metric) -> posed via the skinning network
    skin_params = jax.lax.stop_gradient(params['skinning'])
    verts_hat = unnormalize_canonical_points(
        jnp.asarray(verts_n), fd.frame.coord_min, fd.frame.coord_max,
        fd.frame.center)
    chunk = 100000
    posed = []
    for i in range(0, verts_hat.shape[0], chunk):
        xb = _fwd_skin_chunk(skin_params, cfg.skinning, fd.frame,
                             verts_hat[i:i + chunk])
        posed.append(np.asarray(xb))
    verts_posed = np.concatenate(posed, 0) + np.asarray(fd.frame.trans)

    # posed normal map under the frame camera (reference `:244-267`)
    K = np.asarray(item['image.K'])
    R = np.asarray(item['image.R'])
    T = np.asarray(item['image.T']).reshape(3)
    pc = verts_posed @ R.T + T
    depth = np.maximum(pc[:, 2], 1e-6)
    proj = pc[:, :2] / depth[:, None]
    proj = proj * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    H = int(item['inputs.img_height'])
    W = int(item['inputs.img_width'])
    face_buf, _, _ = native.rasterize_mesh(proj, depth, faces, H, W)
    fn_posed = face_normals(verts_posed, faces)
    # camera-frame normals, -1 background (reference `:259-265`)
    fn_cam = (-fn_posed) @ R.T
    posed_img = _normal_image(face_buf, (fn_cam + 1) / 2, bg=0.0)
    bg_mask = face_buf < 0
    posed_img[bg_mask] = 0.0

    # canonical front/back normal maps (reference `:269-311`)
    fn_cano = face_normals(verts_n, faces)

    def ortho_view(flip: bool):
        v = verts_n.copy()
        n = fn_cano.copy()
        if flip:
            v = v * np.array([-1, 1, -1], np.float32)
            n = n * np.array([-1, 1, -1], np.float32)
        scale = img_size / 2.4
        proj = np.stack([v[:, 0], -v[:, 1]], -1) * scale + img_size / 2
        depth = v[:, 2] + 10.0
        fb, _, _ = native.rasterize_mesh(proj, depth, faces, img_size,
                                         img_size)
        return _normal_image(fb, ((n * [1, 1, -1]) + 1) / 2, bg=0.0)

    return posed_img, ortho_view(False), ortho_view(True)
