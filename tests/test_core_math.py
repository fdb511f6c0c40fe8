"""Golden-value tests for core math vs the PyTorch reference formulas.

Where the reference module is importable without CUDA-only deps
(broyden, utils, human_body_prior.lbs), we compare directly against it;
otherwise we test invariants.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import add_reference_path

add_reference_path()

import torch  # noqa: E402  (cpu torch, used only as test oracle)

from arah_tpu.core import body, rays, smpl  # noqa: E402
from arah_tpu.core.embedder import positional_encoding  # noqa: E402
from arah_tpu.data.synthetic import synthetic_smpl  # noqa: E402


def to_t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


class TestRodrigues:
    def test_vs_reference(self, rng):
        from human_body_prior.body_model.lbs import batch_rodrigues
        aa = rng.randn(48, 3).astype(np.float32) * 2.0
        ours = np.asarray(smpl.batch_rodrigues(jnp.asarray(aa)))
        ref = batch_rodrigues(to_t(aa)).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_small_angles(self):
        aa = jnp.array([[1e-8, 0, 0], [0, 0, 0]], jnp.float32)
        R = smpl.batch_rodrigues(aa)
        assert np.all(np.isfinite(np.asarray(R)))
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-5)


class TestRigidTransform:
    def test_vs_reference(self, rng):
        from human_body_prior.body_model.lbs import batch_rigid_transform
        B = 2
        rot = np.asarray(smpl.batch_rodrigues(
            jnp.asarray(rng.randn(B * 24, 3).astype(np.float32) * 0.3))
        ).reshape(B, 24, 3, 3)
        joints = rng.randn(B, 24, 3).astype(np.float32)
        parents = smpl.SMPL_PARENTS.copy()
        posed_j, rel, absd = smpl.batch_rigid_transform(
            jnp.asarray(rot), jnp.asarray(joints), parents)
        tparents = torch.tensor(np.maximum(parents, 0), dtype=torch.int64)
        tparents[0] = -1
        r_posed, r_rel, r_abs = batch_rigid_transform(
            to_t(rot), to_t(joints), tparents)
        np.testing.assert_allclose(np.asarray(posed_j), r_posed.numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(rel), r_rel.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(absd), r_abs.numpy(), atol=1e-5)


class TestLBS:
    def test_vs_reference(self, rng):
        from human_body_prior.body_model.lbs import lbs as ref_lbs
        model = synthetic_smpl(n_verts=256)
        B = 2
        betas = rng.randn(B, 10).astype(np.float32) * 0.5
        pose = (rng.randn(B, 72) * 0.3).astype(np.float32)
        out = smpl.lbs(model, jnp.asarray(betas), jnp.asarray(pose))

        posedirs_t = to_t(model.posedirs)
        parents_t = torch.tensor(
            np.maximum(np.asarray(model.parents), 0), dtype=torch.int64)
        parents_t[0] = -1
        verts, J_transformed, J, A, abs_A, v_posed = ref_lbs(
            to_t(betas), to_t(pose), to_t(model.v_template).expand(B, -1, -1),
            None, to_t(model.shapedirs), posedirs_t,
            to_t(model.J_regressor), parents_t, to_t(model.lbs_weights))
        np.testing.assert_allclose(np.asarray(out.verts), verts.numpy(),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(out.joints_posed),
                                   J_transformed.numpy(), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out.rel_transforms), A.numpy(),
                                   atol=3e-5)


class TestHierarchicalSoftmax:
    def test_vs_reference(self, rng):
        from im2mesh.utils.utils import hierarchical_softmax as ref_hs
        x = rng.randn(2, 64, 25).astype(np.float32) * 3.0
        ours = np.asarray(body.hierarchical_softmax(jnp.asarray(x)))
        ref = ref_hs(to_t(x)).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_sums_to_one(self, rng):
        x = jnp.asarray(rng.randn(128, 25).astype(np.float32))
        w = body.hierarchical_softmax(x)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)


class TestVitruvian02v:
    def test_vs_reference(self, rng):
        from im2mesh.utils.utils import get_02v_bone_transforms as ref_02v
        from arah_tpu.data.synthetic import rest_joints
        Jtr = rest_joints()
        rot45p = np.asarray(body.rotation_z(45.0))
        rot45n = np.asarray(body.rotation_z(-45.0))
        ref = ref_02v(Jtr.astype(np.float64), rot45p, rot45n)
        ours = body.get_02v_bone_transforms(Jtr)
        np.testing.assert_allclose(ours, ref.astype(np.float32), atol=1e-6)

    def test_jnp_matches_numpy(self):
        from arah_tpu.data.synthetic import rest_joints
        Jtr = rest_joints()
        a = body.get_02v_bone_transforms(Jtr)
        b = np.asarray(body.get_02v_bone_transforms_jnp(jnp.asarray(Jtr)))
        np.testing.assert_allclose(a, b, atol=1e-5)


class TestCanonicalNormalize:
    def test_roundtrip(self, rng):
        pts = jnp.asarray(rng.randn(100, 3).astype(np.float32))
        cmin, cmax = jnp.float32(-0.9), jnp.float32(0.8)
        center = jnp.asarray(rng.randn(3).astype(np.float32) * 0.1)
        n = body.normalize_canonical_points(pts, cmin, cmax, center)
        back = body.unnormalize_canonical_points(n, cmin, cmax, center)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=1e-5)

    def test_vs_reference_formula(self, rng):
        pts = rng.randn(50, 3).astype(np.float32)
        cmin, cmax, center = -1.1, 0.95, rng.randn(3).astype(np.float32) * .1
        ours = np.asarray(body.normalize_canonical_points(
            jnp.asarray(pts), cmin, cmax, center))
        padding = (cmax - cmin) * 0.05
        ref = pts - center
        ref = (ref - cmin + padding) / (cmax - cmin) / 1.1
        ref = (ref - 0.5) * 2.0
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestSkinningPoints:
    def test_inverse_roundtrip(self, rng):
        n_j = 24
        aa = rng.randn(n_j, 3).astype(np.float32) * 0.2
        R = np.asarray(smpl.batch_rodrigues(jnp.asarray(aa)))
        t = rng.randn(n_j, 3).astype(np.float32) * 0.1
        tfs = np.tile(np.eye(4, dtype=np.float32), (n_j, 1, 1))
        tfs[:, :3, :3] = R
        tfs[:, :3, 3] = t
        x = rng.randn(32, 3).astype(np.float32)
        w = np.abs(rng.rand(32, n_j)).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        fwd, T = body.skinning(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(tfs))
        back, _ = body.skinning(fwd, jnp.asarray(w), jnp.asarray(tfs),
                                inverse=True)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


class TestRayAABB:
    def test_vs_reference(self, rng):
        from im2mesh.utils.utils import get_near_far
        bounds = np.array([[-0.5, -1.0, -0.4], [0.6, 0.9, 0.5]],
                          dtype=np.float32)
        ray_o = np.tile(np.array([[0., 0., -3.]], np.float32), (64, 1))
        ray_d = rng.randn(64, 3).astype(np.float32)
        ray_d[:, 2] = np.abs(ray_d[:, 2]) + 0.5
        near, far, mask = rays.ray_aabb(
            jnp.asarray(bounds[0]), jnp.asarray(bounds[1]),
            jnp.asarray(ray_o), jnp.asarray(ray_d))
        r_near, r_far, r_mask = get_near_far(bounds, ray_o, ray_d.copy())
        np.testing.assert_allclose(np.asarray(near), r_near, atol=1e-4)
        np.testing.assert_allclose(np.asarray(far), r_far, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(mask), r_mask)


class TestEmbedder:
    def test_vs_reference(self, rng):
        # load the reference embedder module standalone (its package
        # __init__ drags in torchvision/torchmeta)
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            'ref_embedder',
            '/root/reference/im2mesh/metaavatar_render/models/embedder.py')
        ref_embedder = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_embedder)
        get_embedder = ref_embedder.get_embedder
        x = rng.randn(16, 3).astype(np.float32)
        for multires in (4, 6, 10):
            embed, dim = get_embedder(multires)
            ref = embed(to_t(x)).numpy()
            ours = np.asarray(positional_encoding(jnp.asarray(x), multires))
            assert ours.shape[-1] == dim
            np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestSpiralPath:
    def test_vs_reference_gen_path(self):
        from im2mesh.utils.utils import gen_path as ref_gen_path
        from arah_tpu.utils.camera_path import gen_spiral_path
        w2cs = []
        for th in np.linspace(0, 2 * np.pi, 6)[:-1]:
            pos = np.array([2.5 * np.sin(th), 0.3, -2.5 * np.cos(th)])
            fwd = -pos / np.linalg.norm(pos)
            up = np.array([0., -1., 0.])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            up2 = np.cross(fwd, right)
            m = np.eye(4)
            m[:3, :3] = np.stack([right, up2, fwd])
            m[:3, 3] = -m[:3, :3] @ pos
            w2cs.append(m)
        ref = ref_gen_path([m.copy() for m in w2cs], num_render_views=10)
        ours = gen_spiral_path([m.copy() for m in w2cs],
                               num_render_views=10)
        for r, o in zip(ref, ours):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=1e-10)
