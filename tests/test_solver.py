"""Solver tests: batched Broyden vs the reference implementation, and the
root-finding searches on problems with known solutions."""
import numpy as np
import jax
import jax.numpy as jnp

from conftest import add_reference_path

add_reference_path()

import torch  # noqa: E402

from arah_tpu.core.body import (normalize_canonical_points,  # noqa: E402
                                unnormalize_canonical_points)
from arah_tpu.solver.broyden import broyden  # noqa: E402
from arah_tpu.solver.root_find import (CanonicalFrame,  # noqa: E402
                                       forward_skinning,
                                       forward_skinning_jac,
                                       search_canonical_corr,
                                       search_iso_surface_depth)


def _quadratic_problem(rng, n=64, d=3):
    """g(x) = A (x - x*) + 0.1 * (x - x*)^3 elementwise-cubed nonlinearity."""
    A = np.stack([np.eye(d) + 0.3 * rng.randn(d, d) for _ in range(n)])
    x_star = rng.randn(n, d).astype(np.float32)
    return A.astype(np.float32), x_star


class TestBroyden:
    def test_vs_reference(self, rng):
        from im2mesh.utils.broyden import broyden as ref_broyden
        n, d = 64, 3
        A, x_star = _quadratic_problem(rng, n, d)
        x0 = x_star + 0.5 * rng.randn(n, d).astype(np.float32)
        J_inv0 = np.linalg.inv(A).astype(np.float32)
        T0 = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))

        def g_jax(x):
            e = jnp.einsum('nij,nj->ni', A, x - x_star)
            e = e + 0.1 * (x - x_star) ** 3
            aux = jnp.broadcast_to(jnp.eye(4), (n, 4, 4)) * \
                jnp.linalg.norm(e, axis=-1)[:, None, None]
            return e, aux

        res = broyden(g_jax, jnp.asarray(x0), jnp.asarray(T0),
                      jnp.asarray(J_inv0))

        def g_torch(x, mask=None):
            xx = x.squeeze(-1)
            e = torch.einsum('nij,nj->ni', torch.tensor(A), xx -
                             torch.tensor(x_star))
            e = e + 0.1 * (xx - torch.tensor(x_star)) ** 3
            aux = torch.eye(4).expand(x.shape[0], 4, 4) * \
                torch.linalg.norm(e, dim=-1).view(-1, 1, 1)
            if mask is not None:
                return e[mask].unsqueeze(-1), aux[mask]
            return e.unsqueeze(-1), aux

        ref = ref_broyden(g_torch, torch.tensor(x0).unsqueeze(-1),
                          torch.tensor(T0), torch.tensor(J_inv0))
        np.testing.assert_allclose(np.asarray(res.x),
                                   ref['result'].squeeze(-1).numpy(),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(res.valid),
                                      ref['valid_ids'].numpy())
        np.testing.assert_allclose(np.asarray(res.diff), ref['diff'].numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.aux),
                                   ref['transforms'].numpy(), atol=1e-4)

    def test_converges_to_roots(self, rng):
        n, d = 128, 4
        A, x_star = _quadratic_problem(rng, n, d)

        def g(x):
            return jnp.einsum('nij,nj->ni', A, x - x_star), jnp.zeros((n, 1))

        x0 = x_star + 0.3 * rng.randn(n, d).astype(np.float32)
        res = broyden(g, jnp.asarray(x0), jnp.zeros((n, 1)),
                      jnp.asarray(np.linalg.inv(A).astype(np.float32)))
        assert np.asarray(res.valid).all()
        np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-3)

    def test_active_mask_freezes(self, rng):
        n, d = 16, 3
        A, x_star = _quadratic_problem(rng, n, d)

        def g(x):
            return jnp.einsum('nij,nj->ni', A, x - x_star), jnp.zeros((n, 1))

        x0 = (x_star + 0.3 * rng.randn(n, d)).astype(np.float32)
        active = np.zeros(n, bool)
        active[: n // 2] = True
        res = broyden(g, jnp.asarray(x0), jnp.zeros((n, 1)),
                      jnp.asarray(np.linalg.inv(A).astype(np.float32)),
                      active_init=jnp.asarray(active))
        out = np.asarray(res.x)
        np.testing.assert_allclose(out[n // 2:], x0[n // 2:])
        assert not np.asarray(res.valid)[n // 2:].any()
        np.testing.assert_allclose(out[: n // 2], x_star[: n // 2], atol=1e-3)

    def test_jit(self, rng):
        n, d = 32, 3
        A, x_star = _quadratic_problem(rng, n, d)

        @jax.jit
        def solve(x0):
            def g(x):
                return (jnp.einsum('nij,nj->ni', A, x - x_star),
                        jnp.zeros((n, 1)))
            return broyden(g, x0, jnp.zeros((n, 1)),
                           jnp.asarray(np.linalg.inv(A).astype(np.float32)))

        res = solve(jnp.asarray(x_star + 0.1 * rng.randn(n, d),
                                dtype=jnp.float32))
        assert np.asarray(res.valid).all()


def _rigid_frame_and_skin(rng):
    """A toy articulated setup: 24 bones with random small rigid transforms;
    the 'skinning net' blends them with smooth position-dependent weights."""
    from arah_tpu.core.smpl import batch_rodrigues
    n_j = 24
    aa = (rng.randn(n_j, 3) * 0.15).astype(np.float32)
    R = np.asarray(batch_rodrigues(jnp.asarray(aa)))
    t = (rng.randn(n_j, 3) * 0.05).astype(np.float32)
    tfs = np.tile(np.eye(4, dtype=np.float32), (n_j, 1, 1))
    tfs[:, :3, :3] = R
    tfs[:, :3, 3] = t
    anchors = rng.randn(n_j, 3).astype(np.float32)

    def skin_fn(x_norm):
        d = jnp.sum((x_norm[:, None, :] - anchors[None]) ** 2, axis=-1)
        return jax.nn.softmax(-2.0 * d, axis=-1)

    frame = CanonicalFrame(
        bone_transforms=jnp.asarray(tfs),
        trans=jnp.zeros(3),
        coord_min=jnp.float32(-1.2), coord_max=jnp.float32(1.1),
        center=jnp.zeros(3))
    return frame, skin_fn


class TestForwardSkinningJac:
    def test_matches_fd(self, rng):
        frame, skin_fn = _rigid_frame_and_skin(rng)
        x = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 0.3)
        J = forward_skinning_jac(skin_fn, frame, x)
        eps = 1e-3
        for k in range(3):
            dx = jnp.zeros(3).at[k].set(eps)
            f1, _ = forward_skinning(skin_fn, frame, x + dx)
            f0, _ = forward_skinning(skin_fn, frame, x - dx)
            fd = (f1 - f0) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J[..., k]),
                                       np.asarray(fd), atol=1e-3)


class TestCanonicalCorr:
    def test_recovers_canonical_points(self, rng):
        frame, skin_fn = _rigid_frame_and_skin(rng)
        x_hat_gt = jnp.asarray(rng.randn(64, 3).astype(np.float32) * 0.3)
        x_bar, T_gt = forward_skinning(skin_fn, frame, x_hat_gt)

        x0 = x_hat_gt + 0.05 * jnp.asarray(
            rng.randn(64, 3).astype(np.float32))
        w0 = skin_fn(normalize_canonical_points(
            x0, frame.coord_min, frame.coord_max, frame.center))
        T0 = jnp.einsum('nj,jab->nab', w0, frame.bone_transforms)

        res = search_canonical_corr(skin_fn, frame, x_bar, x0, T0)
        valid = np.asarray(res.valid)
        assert valid.mean() > 0.95
        err = np.abs(np.asarray(res.x_hat) - np.asarray(x_hat_gt))
        assert err[valid].max() < 1e-3


class TestIsoSurfaceDepth:
    def test_sphere_intersection(self, rng):
        """SDF = |x| - r (in normalized space), identity skinning: the root
        finder should land on the sphere along each ray."""
        n = 32
        # with cmin=-10/11, cmax=10/11, center=0 the normalize map is the
        # identity: ((x + a + 0.1a)/(2a)/1.1 - 0.5)*2 = x/(1.1a) = x
        frame = CanonicalFrame(
            bone_transforms=jnp.broadcast_to(jnp.eye(4), (24, 4, 4)),
            trans=jnp.zeros(3),
            coord_min=jnp.float32(-10 / 11.), coord_max=jnp.float32(10 / 11.),
            center=jnp.zeros(3))
        r = 0.5

        def sdf_fn(x_norm):
            return jnp.linalg.norm(x_norm, axis=-1) - r

        def skin_fn(x_norm):
            w = jnp.zeros((x_norm.shape[0], 24)).at[:, 0].set(1.0)
            return w

        cam = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -3.0]), (n, 3))
        dirs = np.zeros((n, 3), np.float32)
        dirs[:, 2] = 1.0
        dirs[:, 0] = rng.rand(n) * 0.1 - 0.05
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = jnp.asarray(dirs)

        z0 = jnp.full((n,), 2.2)
        x0 = cam + z0[:, None] * dirs
        T0 = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
        res = search_iso_surface_depth(
            sdf_fn, skin_fn, frame, cam, dirs, jnp.ones((n,), bool),
            x0, z0, T0)
        valid = np.asarray(res.converged)
        assert valid.mean() > 0.9
        # solution lies on the metric sphere: |normalize(x_hat)| == r
        x_norm = normalize_canonical_points(
            res.x_hat, frame.coord_min, frame.coord_max, frame.center)
        radii = np.linalg.norm(np.asarray(x_norm), axis=-1)
        np.testing.assert_allclose(radii[valid], r, atol=1e-3)
        # and the depth is consistent: cam + z*d == x_hat
        pts = np.asarray(cam + res.z_depth[:, None] * dirs)
        np.testing.assert_allclose(pts[valid], np.asarray(res.x_hat)[valid],
                                   atol=1e-3)
