"""Fused small dense SPD solve as one Pallas TPU kernel.

The sliding-window reduced camera system (D = S·15 + C·6 ≤ a few hundred)
is solved once per LM iteration. XLA lowers ``cho_factor``/``cho_solve`` to
a blocked factorization — dozens of small kernel launches whose fixed costs
dominate at D ≈ 128 — while the entire solve fits in one VMEM tile. This
kernel runs pivot-free Gauss–Jordan elimination on the augmented [H | b]
in-place in VMEM: D rank-1 updates on a (Dp, Dp+128) tile, one program
launch total. Pivot-free elimination is backward-stable for the SPD
(Levenberg-damped) systems produced by ``gauss_newton._solve_step`` — the
pivots are Schur-complement diagonals, which stay positive.

Replaces (for the TPU path) the dense-solve step of Ceres SPARSE_SCHUR
(reference ``Estimator::optimize``, ``Estimator.cpp:876-929``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _gj_kernel(a_ref, out_ref, *, n: int):
    """In-place Gauss–Jordan on the augmented matrix a (Dp, Dp+128);
    column Dp holds b on entry and x on exit. Eliminates the first n
    columns (the real system; padded rows are decoupled identity)."""
    Dp = a_ref.shape[0]
    W = a_ref.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (Dp, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    def body(k, _):
        a = a_ref[:]
        row = a_ref[pl.ds(k, 1), :]  # (1, W) — dynamic sublane slice is fine
        pivot = jnp.sum(jnp.where(col_ids == k, row, 0.0))
        piv = row * (1.0 / pivot)  # (1, W)
        # column k via masked lane reduction (Mosaic can't load a dynamic
        # lane index)
        col = jnp.sum(jnp.where(col_ids == k, a, 0.0), axis=1, keepdims=True)
        # one update for all rows: subtracting col⊗piv zeroes column k
        # everywhere; writing (pivot − 1) at row k makes row k equal piv.
        col = jnp.where(row_ids == k, col - 1.0, col)
        a_ref[:] = a - col * piv
        return 0

    jax.lax.fori_loop(0, n, body, 0)
    out_ref[:] = a_ref[:, Dp:]


@partial(jax.jit, static_argnames=("interpret",))
def solve_spd_pallas(
    H: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """x = H⁻¹ b for SPD H (D,D), b (D,) — one fused kernel launch."""
    D = H.shape[0]
    dtype = jnp.float32
    Dp = max(_round_up(D, 128), 128)
    # augmented [H | b | lane padding]; padded rows/cols are identity so the
    # elimination of real columns never touches them
    A = jnp.eye(Dp, dtype=dtype)
    A = A.at[:D, :D].set(H.astype(dtype))
    aug = jnp.zeros((Dp, 128), dtype).at[:D, 0].set(b.astype(dtype))
    A = jnp.concatenate([A, aug], axis=1)
    out = pl.pallas_call(
        partial(_gj_kernel, n=D),
        out_shape=jax.ShapeDtypeStruct((Dp, 128), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A)
    return out[:D, 0].astype(H.dtype)


def solve_spd(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense SPD solve: fused Pallas Gauss–Jordan on TPU (f32 — LM's
    accept/reject loop tolerates step noise), Cholesky elsewhere (keeps
    f64 precision for CPU test runs)."""
    import os
    if (jax.default_backend() == "tpu" and H.shape[0] <= 1024
            and not os.environ.get("SVIN_NO_PALLAS_SOLVE")):
        return solve_spd_pallas(H, b)
    cho, lower = jax.scipy.linalg.cho_factor(H)
    return jax.scipy.linalg.cho_solve((cho, lower), b)
