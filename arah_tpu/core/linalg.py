"""Closed-form small-matrix inverses.

`jnp.linalg.inv` lowers batched small matrices to LU factorization loops
that compile and run poorly on TPU; the renderer only ever inverts 3x3
Jacobians and 4x4 affine (last row [0,0,0,1]) skinning transforms, both of
which have cheap closed forms that fuse into surrounding element-wise work.
"""
from __future__ import annotations

import jax.numpy as jnp


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Batched adjugate inverse of (..., 3, 3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, D, G], axis=-1),
        jnp.stack([B, E, H], axis=-1),
        jnp.stack([C, F, I], axis=-1)], axis=-2)
    return adj / det[..., None, None]


def inv_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., 4, 4) affine transforms with last row [0,0,0,1]
    (all LBS-blended bone transforms have this form)."""
    A = m[..., :3, :3]
    t = m[..., :3, 3]
    A_inv = inv3x3(A)
    t_inv = -jnp.einsum('...ij,...j->...i', A_inv, t)
    top = jnp.concatenate([A_inv, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], m.dtype), m.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def inv4x4(m: jnp.ndarray) -> jnp.ndarray:
    """General batched 4x4 inverse via cofactor expansion (used for the
    iso-surface solver's init Jacobian, which is not affine)."""
    # 2x2 sub-determinants of the lower two rows
    m00, m01, m02, m03 = (m[..., 0, 0], m[..., 0, 1], m[..., 0, 2],
                          m[..., 0, 3])
    m10, m11, m12, m13 = (m[..., 1, 0], m[..., 1, 1], m[..., 1, 2],
                          m[..., 1, 3])
    m20, m21, m22, m23 = (m[..., 2, 0], m[..., 2, 1], m[..., 2, 2],
                          m[..., 2, 3])
    m30, m31, m32, m33 = (m[..., 3, 0], m[..., 3, 1], m[..., 3, 2],
                          m[..., 3, 3])

    s0 = m00 * m11 - m10 * m01
    s1 = m00 * m12 - m10 * m02
    s2 = m00 * m13 - m10 * m03
    s3 = m01 * m12 - m11 * m02
    s4 = m01 * m13 - m11 * m03
    s5 = m02 * m13 - m12 * m03

    c5 = m22 * m33 - m32 * m23
    c4 = m21 * m33 - m31 * m23
    c3 = m21 * m32 - m31 * m22
    c2 = m20 * m33 - m30 * m23
    c1 = m20 * m32 - m30 * m22
    c0 = m20 * m31 - m30 * m21

    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / det

    r00 = (m11 * c5 - m12 * c4 + m13 * c3) * inv_det
    r01 = (-m01 * c5 + m02 * c4 - m03 * c3) * inv_det
    r02 = (m31 * s5 - m32 * s4 + m33 * s3) * inv_det
    r03 = (-m21 * s5 + m22 * s4 - m23 * s3) * inv_det
    r10 = (-m10 * c5 + m12 * c2 - m13 * c1) * inv_det
    r11 = (m00 * c5 - m02 * c2 + m03 * c1) * inv_det
    r12 = (-m30 * s5 + m32 * s2 - m33 * s1) * inv_det
    r13 = (m20 * s5 - m22 * s2 + m23 * s1) * inv_det
    r20 = (m10 * c4 - m11 * c2 + m13 * c0) * inv_det
    r21 = (-m00 * c4 + m01 * c2 - m03 * c0) * inv_det
    r22 = (m30 * s4 - m31 * s2 + m33 * s0) * inv_det
    r23 = (-m20 * s4 + m21 * s2 - m23 * s0) * inv_det
    r30 = (-m10 * c3 + m11 * c1 - m12 * c0) * inv_det
    r31 = (m00 * c3 - m01 * c1 + m02 * c0) * inv_det
    r32 = (-m30 * s3 + m31 * s1 - m32 * s0) * inv_det
    r33 = (m20 * s3 - m21 * s1 + m22 * s0) * inv_det

    return jnp.stack([
        jnp.stack([r00, r01, r02, r03], axis=-1),
        jnp.stack([r10, r11, r12, r13], axis=-1),
        jnp.stack([r20, r21, r22, r23], axis=-1),
        jnp.stack([r30, r31, r32, r33], axis=-1)], axis=-2)
