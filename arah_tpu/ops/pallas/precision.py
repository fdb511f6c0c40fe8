"""Split-precision matmul helpers for Pallas TPU kernels.

The v5e MXU runs bf16 x bf16 -> f32 at 2x the f32 matmul rate (measured
in-kernel: 94 vs 47 TFLOP/s on chained (128,128)x(128,2048) dots). A
f32 operand can be represented as hi + lo with both halves bf16
(hi = bf16(x), lo = bf16(x - hi)); three bf16 passes

    w_hi @ h_hi + w_hi @ h_lo + w_lo @ h_hi

reproduce the f32 product to ~2^-21 relative error (the dropped
lo @ lo term is O(2^-32)), far below the 1e-5 absolute solver
convergence thresholds. This is the standard TPU "bf16x3" trick XLA
uses for `precision=HIGHEST`; inside Pallas we spell it out by hand.

MEASURED NEGATIVE in the fused solver kernels (v5e): the corr kernel at
forced 50 iterations runs 78.0 ms with split3 vs 61.9 ms plain f32 —
those kernels are VPU/overlap-bound, not matmul-bound, so the extra
passes and casts add latency instead of hiding it. Kept for kernels
that ARE matmul-bound.
"""
from __future__ import annotations

import jax.numpy as jnp


def split_f32(w):
    """Split a f32 array into (hi, lo) bf16 halves with w ~= hi + lo."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def dot_split3(w_hi, w_lo, h):
    """f32-accurate (out, in) x (in, T) matmul as three bf16 MXU passes.

    w_hi/w_lo: bf16 halves of the f32 weight (from split_f32);
    h: f32 activations, split on the fly.
    """
    h_hi = h.astype(jnp.bfloat16)
    h_lo = (h - h_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.dot(w_hi, h_hi, preferred_element_type=jnp.float32)
            + jnp.dot(w_hi, h_lo, preferred_element_type=jnp.float32)
            + jnp.dot(w_lo, h_hi, preferred_element_type=jnp.float32))
