"""Closed-form batched 3x3 linear algebra for the Schur/quality hot path.

The sliding-window solver inverts the (L, 3, 3) landmark Hessian blocks
every LM iteration and takes their eigenvalues once per optimize call
(reference: Ceres' SchurEliminator 3x3 blocks and
``Estimator::optimize``'s landmark-quality eigen ratio,
okvis_ceres/src/Estimator.cpp:903-923). ``jnp.linalg.inv``/``eigvalsh``
lower to batched LU / QR-iteration loops that the TPU executes serially
per block; the closed forms below are pure elementwise VPU arithmetic that
XLA fuses straight into the surrounding program.
"""
from __future__ import annotations

import jax.numpy as jnp


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Adjugate-based inverse of (..., 3, 3) matrices (elementwise ops only).

    Matches ``jnp.linalg.inv`` to rounding for well-conditioned blocks; the
    caller is responsible for damping singular blocks (the solver adds
    LM damping + inactive-slot regularization before inverting).
    """
    a = A[..., 0, 0]
    b = A[..., 0, 1]
    c = A[..., 0, 2]
    d = A[..., 1, 0]
    e = A[..., 1, 1]
    f = A[..., 1, 2]
    g = A[..., 2, 0]
    h = A[..., 2, 1]
    i = A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def eigvalsh3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3) matrices, ascending.

    Trigonometric closed form (Smith 1961 / the standard "analytical 3x3
    symmetric eigenvalues" recipe): shift by the mean eigenvalue, scale so
    the deviator has unit norm, then the eigenvalues are
    q + 2p·cos(phi + {0, ±2π/3}). Pure elementwise ops — replaces
    ``jnp.linalg.eigvalsh`` in the landmark-quality computation.
    """
    a = A[..., 0, 0]
    b = A[..., 1, 1]
    c = A[..., 2, 2]
    d = A[..., 0, 1]
    e = A[..., 1, 2]
    f = A[..., 0, 2]
    q = (a + b + c) / 3.0
    da, db, dc = a - q, b - q, c - q
    p2 = (da * da + db * db + dc * dc + 2.0 * (d * d + e * e + f * f)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)
    # r = det(deviator / p) / 2, clamped into [-1, 1]
    B00, B11, B22 = da / safe_p, db / safe_p, dc / safe_p
    B01, B12, B02 = d / safe_p, e / safe_p, f / safe_p
    detB = (
        B00 * (B11 * B22 - B12 * B12)
        - B01 * (B01 * B22 - B12 * B02)
        + B02 * (B01 * B12 - B11 * B02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)  # largest
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3
    # p == 0: already diagonal-multiple-of-identity, all eigenvalues = q
    lam = jnp.stack([e3, e2, e1], axis=-1)
    return jnp.where(p[..., None] > 0, lam, jnp.broadcast_to(q[..., None], lam.shape))
