"""Hamming-distance matching: XOR + popcount matrix, top-2 ratio test,
mutual consistency — with a Pallas TPU kernel for the distance matrix.

This single fused computation replaces the reference's entire
``okvis_matcher`` package (``DenseMatcher`` 4-thread pool with strided
keypoint partitions, best/second-best lists, distance ratio and mutual
pair reassignment — ``implementation/DenseMatcher.hpp:50-340``): on TPU the
N_A × N_B distance matrix is one VPU-parallel kernel and the selection
logic is dense argmin/top-2 reductions.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.population_count(x)


def hamming_matrix_ref(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Reference implementation: (Na,W) x (Nb,W) uint32 → (Na,Nb) int32."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(_popcount(x), axis=-1).astype(jnp.int32)


def _hamming_kernel(a_ref, b_ref, out_ref):
    # a: (TA, W) uint32; b: (TB, W) uint32; out: (TA, TB) int32
    a = a_ref[:]  # (TA, W)
    b = b_ref[:]  # (TB, W)
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    out_ref[:] = jnp.sum(
        jax.lax.population_count(x), axis=-1, dtype=jnp.int32
    )


@partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(
    a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Tiled Pallas kernel. Shapes must be multiples of the tile (pad first).
    Tiles of 128×128 descriptors × 8 words fit comfortably in VMEM
    (128·8·4 B = 4 KB per operand tile, out 64 KB)."""
    Na, W = a.shape
    Nb, _ = b.shape
    TA = min(128, Na)
    TB = min(128, Nb)
    grid = (pl.cdiv(Na, TA), pl.cdiv(Nb, TB))
    return pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((Na, Nb), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TA, W), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, W), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TA, TB), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(a, b)


def unpack_bits_pm1(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, W) uint32 → (N, 32·W) int8 in {−1, +1} (bit k of word w at
    column 32·w + k — must match the descriptor packing order)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    pm1 = (2 * bits.astype(jnp.int8) - 1)
    return pm1.reshape(packed.shape[0], packed.shape[1] * 32)


@jax.jit
def hamming_matrix_mxu(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamming distances via the MXU: with ±1 bit vectors,
    ⟨a, b⟩ = bits − 2·hamming, so hamming = (bits − aᵀb)/2. One int8 matmul
    on the systolic array replaces the whole popcount reduction — the
    fastest layout on TPU for the dense all-pairs case.
    """
    ap = unpack_bits_pm1(a)
    bp = unpack_bits_pm1(b)
    nbits = ap.shape[1]
    dot = jax.lax.dot_general(
        ap, bp,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (nbits - dot) // 2


def hamming_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: MXU matmul formulation on TPU, fused XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return hamming_matrix_mxu(a, b)
    return hamming_matrix_ref(a, b)


class MatchResult(NamedTuple):
    idx_b: jnp.ndarray  # (Na,) matched column in B, -1 if none
    dist: jnp.ndarray  # (Na,) best distance
    valid: jnp.ndarray  # (Na,) bool


# plain python int (a module-level jnp scalar would initialize the XLA
# backend at import time, breaking jax.distributed.initialize ordering)
BIG = 1 << 20


def match(
    dist: jnp.ndarray,  # (Na,Nb) int32 distances
    mask: jnp.ndarray = None,  # (Na,Nb) bool allowed pairs (gating)
    max_distance: int = 60,
    ratio: float = 0.0,
    mutual: bool = True,
) -> MatchResult:
    """Best-match selection with the DenseMatcher acceptance semantics:
    distance threshold (reference BRISK matching threshold 60), optional
    best/second-best distance ratio, and mutual (cross-check) consistency
    replacing the pair-reassignment pass."""
    d = dist
    if mask is not None:
        d = jnp.where(mask, d, BIG)
    Na, Nb = d.shape
    best = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    ok = best_d <= max_distance
    if ratio > 0.0:
        d2 = d.at[jnp.arange(Na), best].set(BIG)
        second = jnp.min(d2, axis=1)
        ok = ok & (best_d.astype(jnp.float32) <= ratio * second.astype(jnp.float32))
    if mutual:
        col_best = jnp.argmin(d, axis=0)  # (Nb,)
        ok = ok & (col_best[best] == jnp.arange(Na))
    return MatchResult(
        idx_b=jnp.where(ok, best, -1).astype(jnp.int32),
        dist=best_d.astype(jnp.int32),
        valid=ok,
    )


def match_descriptors(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    mask: jnp.ndarray = None,
    max_distance: int = 60,
    ratio: float = 0.0,
    mutual: bool = True,
) -> MatchResult:
    d = hamming_matrix(desc_a, desc_b)
    m = valid_a[:, None] & valid_b[None, :]
    if mask is not None:
        m = m & mask
    return match(d, m, max_distance=max_distance, ratio=ratio, mutual=mutual)


# one-program variant for host-sequenced pipelines: distance matrix +
# selection fused into a single compiled call (the un-jitted version above
# is fine inside larger jitted programs, where it inlines anyway)
match_descriptors_jit = partial(
    jax.jit, static_argnames=("max_distance", "ratio", "mutual")
)(match_descriptors)
