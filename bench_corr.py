#!/usr/bin/env python
"""Microbenchmark: canonical-correspondence Broyden search variants.

Isolates the hottest solver loop (59% of eval device time together with
the other whiles, PERF.md) at production scale (4096 rays x 64 samples =
262,144 points) and compares:
  - dense XLA solve (one global while_loop)
  - chunked XLA solve (lax.map over corr_chunk, current default)
  - Pallas fused kernel, (T, k) column layout (round 1)
  - Pallas fused kernel, (k, T) transposed layout (round 2)
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=262144)
    p.add_argument('--iters', type=int, default=5)
    p.add_argument('--variants', default='dense,chunked,pallas_t')
    p.add_argument('--tiles', default='512,2048')
    p.add_argument('--cvg', type=float, default=1e-5,
                   help='convergence threshold; 0 forces max_steps '
                        'iterations on every point (pure-speed A/B)')
    args = p.parse_args()

    from arah_tpu.nn.skinning import SkinningConfig, init_skinning
    from arah_tpu.render.ray_tracing import CanonicalFrame
    from arah_tpu.render.renderer import make_skin_fn
    from arah_tpu.solver.root_find import (forward_skinning,
                                           search_canonical_corr)
    from arah_tpu.core.smpl import batch_rodrigues
    from arah_tpu.core.body import normalize_canonical_points

    rng = np.random.RandomState(0)
    cfg = SkinningConfig(d_hidden=128, n_layers=4)
    params = init_skinning(jax.random.PRNGKey(0), cfg)

    aa = (rng.randn(24, 3) * 0.15).astype(np.float32)
    R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    tfs = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
    tfs[:, :3, :3] = R
    tfs[:, :3, 3] = (rng.randn(24, 3) * 0.05).astype(np.float32)
    frame = CanonicalFrame(
        bone_transforms=jnp.asarray(tfs), trans=jnp.zeros(3),
        coord_min=jnp.float32(-1.1), coord_max=jnp.float32(1.0),
        center=jnp.asarray(rng.randn(3).astype(np.float32) * 0.05))
    skin_fn = make_skin_fn({'skinning': params},
                           type('C', (), {'skinning': cfg}))

    n = args.n
    x_gt = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.3)
    x_bar, _ = forward_skinning(skin_fn, frame, x_gt)
    x0 = x_gt + 0.03 * jnp.asarray(rng.randn(n, 3).astype(np.float32))
    x0n = normalize_canonical_points(x0, frame.coord_min, frame.coord_max,
                                     frame.center)
    w0 = skin_fn(x0n)
    T0 = jnp.einsum('nj,jab->nab', w0, frame.bone_transforms)
    mask = jnp.asarray(rng.rand(n) > 0.1)
    jax.block_until_ready((x_bar, T0))

    wts_t, wts, bs = [], [], []
    for lyr in params['layers']:
        v = lyr['v']
        w = lyr['g'] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
        wts.append(w)
        wts_t.append(w.T)
        bs.append(lyr['b'])
    bones16 = frame.bone_transforms.reshape(24, 16)

    def timeit(name, fn):
        out = jax.block_until_ready(fn())     # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jax.block_until_ready(fn())
        dt = (time.perf_counter() - t0) / args.iters
        valid = out.valid if hasattr(out, 'valid') else out[-1]
        print(f'{name:28s} {dt * 1e3:8.1f} ms   '
              f'valid={float(jnp.mean(valid.astype(jnp.float32))):.3f}')
        return out

    variants = args.variants.split(',')
    results = {}
    if 'dense' in variants:
        f = jax.jit(lambda: search_canonical_corr(
            skin_fn, frame, x_bar, x0, T0, active_init=mask))
        results['dense'] = timeit('dense XLA', f)
    if 'chunked' in variants:
        chunk = 16384
        nc = n // chunk
        rs = lambda a: a.reshape((nc, chunk) + a.shape[1:])

        def chunked():
            corr = jax.lax.map(
                lambda t: search_canonical_corr(
                    skin_fn, frame, t[0], t[1], t[2], active_init=t[3]),
                (rs(x_bar), rs(x0), rs(T0), rs(mask)))
            return jax.tree.map(
                lambda a: a.reshape((n,) + a.shape[2:]), corr)
        results['chunked'] = timeit('chunked XLA (16384)', jax.jit(chunked))
    if 'pallas' in variants:
        from arah_tpu.ops.pallas.corr_kernel import corr_search_pallas
        for tile in [int(t) for t in args.tiles.split(',')]:
            f = lambda tile=tile: corr_search_pallas(
                x_bar, x0, T0.reshape(n, 16), mask, wts_t, bs, bones16,
                frame.coord_min, frame.coord_max, frame.center, tile=tile)
            results[f'pallas{tile}'] = timeit(f'pallas (T,k) tile={tile}', f)
    if any(v.startswith('pallas_t') and v != 'pallas_t_sorted'
           for v in variants):
        from arah_tpu.ops.pallas.corr_kernel_t import corr_search_pallas_t
        precisions = []
        if 'pallas_t_f32' in variants:
            precisions.append('f32')
        if 'pallas_t' in variants:
            precisions.append('split3')
        if 'pallas_t_bf16' in variants:
            precisions.append('bf16')
        for tile in [int(t) for t in args.tiles.split(',')]:
            for prec in precisions:
                f = lambda tile=tile, prec=prec: corr_search_pallas_t(
                    x_bar, x0, T0.reshape(n, 16), mask, wts, bs, bones16,
                    frame.coord_min, frame.coord_max, frame.center,
                    tile=tile, precision=prec, cvg_thresh=args.cvg)
                results[f'pallas_t{tile}_{prec}'] = timeit(
                    f'pallas (k,T) tile={tile} {prec}', f)

    if 'pallas_t_sorted' in variants:
        # difficulty-sorted tiling: permute points by initial residual
        # norm (masked points first) so per-tile early exit fires — the
        # solver is per-point, so results are identical up to the
        # permutation
        from arah_tpu.ops.pallas.corr_kernel_t import corr_search_pallas_t
        T0_16 = T0.reshape(n, 16)

        for tile in [int(t) for t in args.tiles.split(',')]:
            def sorted_solve(tile=tile):
                g0, _ = forward_skinning(skin_fn, frame, x0)
                key = jnp.linalg.norm(g0 - x_bar, axis=-1)
                key = jnp.where(mask, key, -1.0)
                perm = jnp.argsort(key)
                x_hat, T16, valid, _ = corr_search_pallas_t(
                    x_bar[perm], x0[perm], T0_16[perm], mask[perm],
                    wts, bs, bones16, frame.coord_min, frame.coord_max,
                    frame.center, tile=tile)
                inv = jnp.argsort(perm)
                return x_hat[inv], T16[inv], valid[inv]
            results[f'pallas_t_sorted{tile}'] = timeit(
                f'pallas (k,T) SORTED tile={tile}', jax.jit(sorted_solve))
        ref_p = results.get('pallas_t2048_f32') or results.get(
            'pallas_t2048_split3')
        if ref_p is not None:
            s = results[f'pallas_t_sorted{tile}']
            print('sorted == unsorted:',
                  bool(jnp.all(ref_p[0] == s[0])
                       & jnp.all(ref_p[2] == s[2])))

    # cross-check agreement of the last pallas_t vs the first XLA result
    ref = results.get('chunked') or results.get('dense')
    pt = [v for k, v in results.items()
          if k.startswith('pallas_t') and not k.endswith('_f32')] or \
         [v for k, v in results.items() if k.startswith('pallas_t')]
    if ref is not None and pt:
        v_ref = np.asarray(ref.valid)
        x_ref = np.asarray(ref.x_hat)
        x_hat, T16, valid = pt[-1]
        both = v_ref & np.asarray(valid)
        agree = (v_ref == np.asarray(valid)).mean()
        err = np.abs(np.asarray(x_hat)[both] - x_ref[both]).max()
        print(f'agreement={agree:.4f}  max|dx| on both-valid={err:.2e}')


if __name__ == '__main__':
    main()
