"""Tests for the native arahx geometry library (point-in-mesh, point-mesh
distance, marching tetrahedra)."""
import numpy as np
import pytest

from arah_tpu import native


def icosphere(subdiv=3, radius=1.0):
    """Generate an icosphere (host-side test mesh)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
             [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
             [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
             [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]]
    verts = list(verts)
    cache = {}

    def midpoint(i, j):
        key = (min(i, j), max(i, j))
        if key in cache:
            return cache[key]
        m = (verts[i] + verts[j]) / 2
        m /= np.linalg.norm(m)
        verts.append(m)
        cache[key] = len(verts) - 1
        return cache[key]

    for _ in range(subdiv):
        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        faces = new_faces
    return (np.asarray(verts, np.float32) * radius,
            np.asarray(faces, np.int32))


class TestInsideMesh:
    def test_sphere(self, rng):
        verts, faces = icosphere(3, radius=0.8)
        pts = (rng.rand(2000, 3).astype(np.float32) - 0.5) * 2.4
        inside = native.check_mesh_contains(verts, faces, pts)
        r = np.linalg.norm(pts, axis=-1)
        expect = r < 0.8
        # near-surface points may disagree due to faceting; exclude a band
        band = np.abs(r - 0.8) > 0.03
        agree = (inside == expect)[band].mean()
        assert agree > 0.995, agree


class TestPointMeshDistance:
    def test_sphere_distance(self, rng):
        verts, faces = icosphere(3, radius=1.0)
        pts = rng.randn(500, 3).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
        pts *= rng.uniform(0.5, 1.5, (500, 1)).astype(np.float32)
        sq, fi, bary = native.point_mesh_squared_distance(pts, verts, faces)
        r = np.linalg.norm(pts, axis=-1)
        expect = np.abs(r - 1.0)
        np.testing.assert_allclose(np.sqrt(sq), expect, atol=0.02)
        # barycentric reconstruction lands on the closest face
        tri = verts[faces[fi]]
        closest = np.einsum('nk,nkd->nd', bary, tri)
        d2 = np.sum((pts - closest) ** 2, axis=-1)
        np.testing.assert_allclose(d2, sq, atol=1e-5)
        assert np.allclose(bary.sum(-1), 1.0, atol=1e-5)


class TestMarchingCubes:
    def test_sphere_surface(self):
        n = 48
        lin = np.linspace(-1.2, 1.2, n).astype(np.float32)
        x, y, z = np.meshgrid(lin, lin, lin, indexing='ij')
        sdf = np.sqrt(x**2 + y**2 + z**2) - 0.7
        spacing = [lin[1] - lin[0]] * 3
        verts, faces = native.marching_cubes(
            sdf, 0.0, origin=[-1.2, -1.2, -1.2], spacing=spacing)
        assert len(verts) > 500 and len(faces) > 500
        radii = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(radii, 0.7, atol=0.02)
        # watertight: every edge shared by exactly two faces
        edges = {}
        for f in faces:
            for e in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
                key = (min(e), max(e))
                edges[key] = edges.get(key, 0) + 1
        counts = np.array(list(edges.values()))
        assert (counts == 2).all()

    def test_orientation_consistent(self):
        """All faces should wind the same way (consistent normals)."""
        n = 32
        lin = np.linspace(-1.0, 1.0, n).astype(np.float32)
        x, y, z = np.meshgrid(lin, lin, lin, indexing='ij')
        sdf = np.sqrt(x**2 + y**2 + z**2) - 0.6
        verts, faces = native.marching_cubes(
            sdf, 0.0, origin=[-1, -1, -1], spacing=[lin[1] - lin[0]] * 3)
        tri = verts[faces]
        normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centers = tri.mean(axis=1)
        dots = np.sum(normals * centers, axis=-1)
        frac_out = (dots > 0).mean()
        assert frac_out > 0.99 or frac_out < 0.01, frac_out
