"""Bench-scene bootstrap: give the synthetic avatar a REAL geometry.

The reference never renders from a random initialization — its SDF comes
from a pretrained MetaAvatar checkpoint and its skinning net from
pretrained SNARF weights (`configs/*: geometry_net / skinning_net2`,
loaded in `im2mesh/metaavatar_render/config.py`). A randomly-initialized
hypernet emits a near-constant positive field with |grad| << 1, so
sphere tracing converges on ZERO rays and every solver runs to its full
iteration budget: benchmarks on that scene measure a pathological
workload no trained model ever presents (no early exits, no surface
sampler, dense 64-sample volume rendering on every ray).

The synthetic body (`data/synthetic.py`) is a union of capsules, so its
exact signed distance is available in closed form. This module fits, at
bench-scene build time,

  * the generated SIREN (through the real hypernet + FiLM pipeline, by
    optimizing the `hypo_init` base weights the hyper heads emit
    residuals against — the same tensors a MetaAvatar checkpoint would
    fill) to the capsule-body SDF in Vitruvian canonical space, and
  * the skinning MLP to the same capsule-softmax weights the synthetic
    body's vertices carry,

so the bench scene has a coherent (sdf, skinning) pair: sphere tracing
converges on body rays, the 16+1+16 surface sampler and the solvers'
early exits engage, and throughput numbers reflect a trained model's
workload. ~1k Adam steps on 8k-point batches; a few seconds on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from arah_tpu.core.body import get_02v_bone_transforms_jnp
from arah_tpu.core.smpl import (NUM_JOINTS, SMPL_PARENTS, SmplModel,
                                blend_shapes, vertices2joints)
from arah_tpu.render.ray_tracing import (normalize_canonical_points,
                                         sdf_to_metric,
                                         unnormalize_canonical_points)


def capsule_segments_02v(model: SmplModel, betas: jax.Array):
    """(24, 3) a / (24, 3) b segment endpoints of the canonical (02v)
    capsule body, in the same metric space as `FrameData.verts_cano`."""
    v_shaped = model.v_template[None] + blend_shapes(
        betas.reshape(1, -1), model.shapedirs)
    Jtr = vertices2joints(model.J_regressor, v_shaped)[0]      # (24, 3)
    tf02 = get_02v_bone_transforms_jnp(Jtr)                    # (24, 4, 4)
    J02 = jnp.einsum('jab,jb->ja', tf02[:, :3, :3], Jtr) + tf02[:, :3, 3]
    parents = jnp.asarray(SMPL_PARENTS)
    a = jnp.where((parents >= 0)[:, None], J02[jnp.maximum(parents, 0)],
                  J02)
    return a, J02


def capsule_sdf_and_weights(x, seg_a, seg_b, radius: float = 0.055,
                            temp: float = 0.02):
    """Exact capsule-union SDF + capsule-softmax skinning weights.

    x: (N, 3) canonical metric points. Returns (sdf (N,), w (N, 24)).
    The weight formula mirrors `data/synthetic.py`'s vertex weights
    (softmax of -segment_distance / 0.02), so the fitted skinning net is
    consistent with the LBS weights the body actually poses with.
    """
    ab = seg_b - seg_a                                          # (24, 3)
    ap = x[:, None, :] - seg_a[None]                            # (N, 24, 3)
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-9)
    t = jnp.clip(jnp.sum(ap * ab[None], axis=-1) / denom, 0.0, 1.0)
    closest = seg_a[None] + t[..., None] * ab[None]
    d = jnp.linalg.norm(x[:, None, :] - closest, axis=-1)       # (N, 24)
    sdf = jnp.min(d, axis=-1) - radius
    w = jax.nn.softmax(-d / temp, axis=-1)
    return sdf, w


def pretrain_scene(params, cfg, model: SmplModel, betas, fd,
                   steps: int = 800, batch: int = 8192,
                   lr: float = 1e-4, seed: int = 11):
    """Fit hypo_init (generated SIREN) + skinning params to the capsule
    body. Returns the updated params dict (new hypernet/skinning leaves,
    everything else untouched)."""
    from arah_tpu.render.renderer import (generate_sdf, make_sdf_fn,
                                          make_skin_fn)

    seg_a, seg_b = capsule_segments_02v(model, betas)
    frame = fd.frame
    latent = params['latent'][0]

    train_leaves = {'hypo': params['hypernet']['hypo_init'],
                    'skin': params['skinning']}

    def with_leaves(leaves):
        p = dict(params)
        hn = dict(params['hypernet'])
        hn['hypo_init'] = leaves['hypo']
        p['hypernet'] = hn
        p['skinning'] = leaves['skin']
        return p

    def sample_points(key):
        k1, k2, k3 = jax.random.split(key, 3)
        n_surf = batch // 2
        idx = jax.random.randint(k1, (n_surf,), 0, fd.verts_cano.shape[0])
        noise = jax.random.normal(k2, (n_surf, 3)) * 0.04
        x_surf = fd.verts_cano[idx] + noise
        x_cube = unnormalize_canonical_points(
            jax.random.uniform(k3, (batch - n_surf, 3), minval=-1.0,
                               maxval=1.0),
            frame.coord_min, frame.coord_max, frame.center)
        return jnp.concatenate([x_surf, x_cube], axis=0)

    def loss_fn(leaves, key):
        p = with_leaves(leaves)
        x = sample_points(key)
        x_norm = normalize_canonical_points(
            x, frame.coord_min, frame.coord_max, frame.center)
        sdf_t, w_t = capsule_sdf_and_weights(x, seg_a, seg_b)

        gen = generate_sdf(p, cfg, fd.rots, fd.Jtrs, latent)
        sdf_fn = make_sdf_fn(gen)           # differentiable XLA path
        sdf_m = sdf_to_metric(sdf_fn(x_norm), frame.coord_min,
                              frame.coord_max)
        l_sdf = jnp.mean(jnp.abs(sdf_m - sdf_t))

        # eikonal on the near-surface half keeps the fitted field
        # 1-Lipschitz where the tracer walks (fwd-mode: see PERF.md)
        n_eik = 512
        g = jax.vmap(jax.jacfwd(
            lambda q: sdf_to_metric(sdf_fn(q[None]), frame.coord_min,
                                    frame.coord_max)[0] ))(x_norm[:n_eik])
        scale = 2.0 / (1.1 * (frame.coord_max - frame.coord_min))
        l_eik = jnp.mean((jnp.linalg.norm(g * scale, axis=-1) - 1.0) ** 2)

        w = make_skin_fn(p, cfg)(x_norm)
        l_skin = jnp.mean(jnp.sum((w - w_t) ** 2, axis=-1))
        return l_sdf + 0.01 * l_eik + 0.5 * l_skin

    opt = optax.adam(lr)

    @jax.jit
    def fit(leaves):
        state = opt.init(leaves)

        def step(carry, k):
            lv, st = carry
            loss, grads = jax.value_and_grad(loss_fn)(lv, k)
            upd, st = opt.update(grads, st)
            return (optax.apply_updates(lv, upd), st), loss

        keys = jax.random.split(jax.random.PRNGKey(seed), steps)
        (leaves, _), losses = jax.lax.scan(step, (leaves, state), keys)
        return leaves, losses

    leaves, losses = fit(train_leaves)
    return with_leaves(leaves), losses
