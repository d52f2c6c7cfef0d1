"""Pallas TPU kernel: fused descriptor-similarity running top-2.

The matcher needs, for every row descriptor, its two best dot products
against all column descriptors (ratio test) plus each column's best row
(mutual-best test).  The naive XLA path materializes the full (K1, K2)
similarity matrix in HBM and re-reads it for top_k and argmax — multiple
passes of HBM traffic.  This kernel tiles the matmul on the MXU and keeps
running top-2 statistics in an output block revisited across the inner
grid dimension (the standard streaming-accumulator pattern), so the
similarity matrix never leaves VMEM.

The column-side best (mutual test) is the same kernel run with the roles
of d1/d2 swapped — two streaming passes instead of one materialized
(K1, K2) buffer.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -2.0  # below any dot product of unit descriptors


def _top2_kernel(d1_ref, d2_ref, val_ref, idx_ref):
    j = pl.program_id(1)
    TM = d1_ref.shape[0]
    TN = d2_ref.shape[0]

    @pl.when(j == 0)
    def _():
        val_ref[:, 0] = jnp.full((TM,), _NEG, jnp.float32)
        val_ref[:, 1] = jnp.full((TM,), _NEG, jnp.float32)
        idx_ref[:, 0] = jnp.zeros((TM,), jnp.int32)
        idx_ref[:, 1] = jnp.zeros((TM,), jnp.int32)

    sim = jax.lax.dot_general(
        d1_ref[:], d2_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (TM, TN)

    loc_best = jnp.max(sim, axis=1)
    loc_arg = jnp.argmax(sim, axis=1).astype(jnp.int32) + j * TN
    cols = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1) + j * TN
    masked = jnp.where(cols == loc_arg[:, None], _NEG, sim)
    loc_second = jnp.max(masked, axis=1)

    best = val_ref[:, 0]
    second = val_ref[:, 1]
    best_i = idx_ref[:, 0]
    val_ref[:, 0] = jnp.maximum(best, loc_best)
    val_ref[:, 1] = jnp.maximum(
        jnp.minimum(best, loc_best), jnp.maximum(second, loc_second)
    )
    idx_ref[:, 0] = jnp.where(loc_best > best, loc_arg, best_i)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _top2_pass(d1, d2, tm: int, tn: int, interpret: bool):
    K1, D = d1.shape
    K2 = d2.shape[0]
    tn = min(tn, K2)
    tm = min(tm, K1)
    if K1 % tm != 0 or K2 % tn != 0:
        raise ValueError(
            f"top2_similarity requires tile-divisible shapes: "
            f"K1={K1} % tm={tm}, K2={K2} % tn={tn} — pad inputs first"
        )
    grid = (K1 // tm, K2 // tn)
    vals, idxs = pl.pallas_call(
        _top2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tm, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K1, 2), jnp.float32),
            jax.ShapeDtypeStruct((K1, 2), jnp.int32),
        ],
        interpret=interpret,
    )(d1.astype(jnp.float32), d2.astype(jnp.float32))
    return vals, idxs[:, 0]


def _fit_tile(t: int, k: int) -> int:
    """Largest tile <= t that divides k (halving steps, floor 8)."""
    t = min(t, k)
    while t > 8 and k % t != 0:
        t //= 2
    return t


def top2_similarity(
    d1: jnp.ndarray,
    d2: jnp.ndarray,
    tm: int = 256,
    tn: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For each row of d1 (K1, D): top-2 dot products against d2 (K2, D) and
    each d2 row's best d1 index (for the mutual-best test).

    Returns (top2_vals (K1, 2), best_idx (K1,), col_best_row (K2,)).
    Shape constraints: D % 128 == 0; tiles are shrunk per-pass to divide
    K1/K2, so any tile-divisible-by-8 row counts work (pad otherwise).
    """
    K1, K2 = d1.shape[0], d2.shape[0]
    vals, idx = _top2_pass(d1, d2, _fit_tile(tm, K1), _fit_tile(tn, K2), interpret)
    _, colarg = _top2_pass(d2, d1, _fit_tile(tm, K2), _fit_tile(tn, K1), interpret)
    return vals, idx, colarg
