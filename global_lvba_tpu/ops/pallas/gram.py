"""Pallas TPU kernel: symmetric rank-K update (SYRK) for the Gram Hessian.

The plane-factor Hessian assembly is dominated by the negative Gram
product -AᵀA of the expanded factor matrix A (rows = 3·V factor rows,
cols = 6·W pose states) — see factors/plane_eigen.py:_chunk_eval / the
reference math at /root/reference/include/BALM/bavoxel.hpp:141-163.  The
result is symmetric, but an XLA dot_general computes BOTH triangles: at
W = 512 the Gram is ~150 GFLOP per factor evaluation, half of it
redundant.  This kernel computes only the lower-triangular tiles — a
packed 1-D grid over the P = T(T+1)/2 tile pairs whose (i, j) block
coordinates arrive via scalar prefetch — and the caller mirrors the
result, recovering the ~2x that BLAS syrk has over gemm.

Grid layout: (P, nk) with the contraction dimension innermost, so each
output tile stays resident in a VMEM accumulator across its nk partial
products (the standard streaming-accumulator pattern; same as
ops/pallas/matcher.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    # Mosaic's dot_general lowering supports only DEFAULT/HIGHEST
    # (NotImplementedError "Unsupported dot precision: HIGH" on TPU);
    # HIGH requests round up to HIGHEST rather than crash
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


def _syrk_kernel(ii_ref, jj_ref, a_ref, b_ref, o_ref, acc_ref, *, nk, precision):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        b_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype,
        precision=precision,
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[0] = acc_ref[:]


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _syrk_tiles(A, tile: int, kc: int, precision: str, interpret: bool):
    """A: (Kr, Np) with Kr % kc == 0 and Np % tile == 0 (caller pads).
    Returns packed lower-triangle tiles (P, tile, tile), pair order
    row-major over i >= j."""
    Kr, Np = A.shape
    T = Np // tile
    nk = Kr // kc
    pairs = [(i, j) for i in range(T) for j in range(i + 1)]
    ii = jnp.asarray(np.array([p[0] for p in pairs], np.int32))
    jj = jnp.asarray(np.array([p[1] for p in pairs], np.int32))
    P = len(pairs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P, nk),
        in_specs=[
            pl.BlockSpec((kc, tile), lambda g, k, ii, jj: (k, ii[g])),
            pl.BlockSpec((kc, tile), lambda g, k, ii, jj: (k, jj[g])),
        ],
        out_specs=pl.BlockSpec((1, tile, tile), lambda g, k, ii, jj: (g, 0, 0)),
        scratch_shapes=[pltpu.VMEM((tile, tile), A.dtype)],
    )
    return pl.pallas_call(
        partial(_syrk_kernel, nk=nk, precision=_PRECISIONS[precision]),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, tile, tile), A.dtype),
        interpret=interpret,
    )(ii, jj, A, A)


def syrk(
    A: jnp.ndarray,
    tile: int = 512,
    kc: int = 512,
    precision: str = "highest",
    interpret: bool = False,
) -> jnp.ndarray:
    """Full symmetric AᵀA (N, N) from lower-triangular Pallas tiles.

    A: (Kr, N).  Rows pad to a kc multiple and columns to a tile multiple
    with zeros (exact — zero rows contribute nothing; padded columns are
    sliced off).  Off-diagonal tiles are mirrored; diagonal tiles are
    themselves symmetric and placed once.
    """
    Kr, N = A.shape
    tile = min(tile, max(8, 1 << math.ceil(math.log2(max(N, 8)))))
    kc = min(kc, max(8, 1 << math.ceil(math.log2(max(Kr, 8)))))
    Krp = -(-Kr // kc) * kc
    Np = -(-N // tile) * tile
    if Krp != Kr or Np != N:
        A = jnp.pad(A, ((0, Krp - Kr), (0, Np - N)))
    tiles = _syrk_tiles(A, tile, kc, precision, interpret)
    T = Np // tile
    # Mirror each off-diagonal tile at placement time rather than
    # transposing the assembled matrix: `full = off + off.T` fused under an
    # outer jit MISCOMPILES on TPU when `off` is a dynamic-update-slice
    # chain over the pallas output (measured 13% error on the mirrored
    # blocks while `off` itself is exact; scripts/kernel_parity_tpu.py
    # guards this).  Per-tile transposes sidestep the bad fusion and skip
    # materializing a second (Np, Np) temporary.
    full = jnp.zeros((Np, Np), A.dtype)
    g = 0
    for i in range(T):
        for j in range(i + 1):
            full = jax.lax.dynamic_update_slice(
                full, tiles[g], (i * tile, j * tile)
            )
            if i != j:
                full = jax.lax.dynamic_update_slice(
                    full, tiles[g].T, (j * tile, i * tile)
                )
            g += 1
    return full[:N, :N] if Np != N else full
