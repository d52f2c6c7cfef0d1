"""Pallas TPU selection-matmul kernels: one-hot expansion/reduction with
the 0/1 operand GENERATED IN VMEM.

The factor evaluation's frame-indexed expansions and reductions are
selection matmuls against a (VK, W) one-hot of the entry frame ids
(factors/plane_eigen.py).  In XLA the one-hot materializes in HBM —
~810 MB bf16 at the representative W=512 scene — and every consumer
streams it back in; the probe measured this traffic as the bulk of the
pose-expansion and g/Hd stages.  These kernels rebuild each one-hot TILE
from an iota==frame compare in VMEM (the frame ids are 4 bytes/entry vs
W bytes/entry for the one-hot row), so HBM sees only the real operands.

Exactness: callers pass values PRE-SPLIT into the 3-way bf16 mantissa
packing (plane_eigen._split3_bf16 + concat) — products by {0,1} are
exact and accumulate in f32, reproducing the f32 selection exactly (same
scheme as the XLA path; the kernels change only where the one-hot
lives).

Reference math being assembled: the per-pose gradient/Hessian reductions
and factor-row placement of acc_evaluate2 (/root/reference/include/BALM/
bavoxel.hpp:68-174).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_entries(VK: int, W: int) -> int:
    """Entry-tile size: the (W, t) bf16 one-hot tile + double-buffered
    operands must fit VMEM (~4 MB one-hot budget).  Large tiles matter:
    at t=512 the grid-step overhead dominated (measured: the W=512 scene
    is ~1540 steps/kernel and the kernels LOST to the XLA materialized
    one-hot; t=4096 cuts it to ~190 steps)."""
    t = max(128, min(4096, (2 * 1024 * 1024 // max(W, 1)) // 128 * 128))
    return min(t, -(-VK // 128) * 128)


def _table_select_kernel(fr_ref, tbl_ref, o_ref, *, W):
    fr = fr_ref[0, :]                                    # (t,) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, fr.shape[0]), 0)
    oh = (iota == fr[None, :]).astype(jnp.bfloat16)      # (W, t)
    o_ref[:] = jax.lax.dot_general(
        tbl_ref[:], oh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnums=(2, 3))
def table_select(frame: jnp.ndarray, tbl3: jnp.ndarray, W: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Channel-major table selection: out[c, e] = tbl3[frame[e], c].

    frame: (VK,) int32 (padded entries may carry any id >= W — their
    one-hot column is all-zero and the output is 0).  tbl3: (W, C) bf16 —
    the caller packs the 3 bf16 mantissa splits along C for exact f32
    selection.  Returns (C, VK) f32.
    """
    VK = frame.shape[0]
    C = tbl3.shape[1]
    t = _tile_entries(VK, W)
    VKp = -(-VK // t) * t
    fr = jnp.pad(frame, (0, VKp - VK), constant_values=W).reshape(1, VKp)
    out = pl.pallas_call(
        partial(_table_select_kernel, W=W),
        grid=(VKp // t,),
        in_specs=[
            pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, t), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, VKp), jnp.float32),
        interpret=interpret,
    )(fr, tbl3)
    return out[:, :VK]


def _entry_reduce_kernel(fr_ref, val_ref, o_ref, acc_ref, *, W, nsteps):
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    fr = fr_ref[0, :]                                    # (t,) int32
    t = fr.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (t, W), 1)
    oh = (iota == fr[:, None]).astype(jnp.bfloat16)      # (t, W)
    acc_ref[:] += jax.lax.dot_general(
        oh, val_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(s == nsteps - 1)
    def _():
        o_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnums=(2, 3))
def entry_reduce(frame: jnp.ndarray, vals3: jnp.ndarray, W: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Frame-indexed segment reduction: out[w, c] = Σ_{e: frame[e]==w}
    vals3[e, c].

    frame: (VK,) int32; vals3: (VK, C) bf16 (3-way-split-packed along C).
    Returns (W, C) f32.  Sequential grid accumulation in a VMEM scratch,
    flushed at the last step."""
    VK, C = vals3.shape
    t = _tile_entries(VK, W)
    VKp = -(-VK // t) * t
    fr = jnp.pad(frame, (0, VKp - VK), constant_values=W).reshape(1, VKp)
    vp = jnp.pad(vals3, ((0, VKp - VK), (0, 0)))
    nsteps = VKp // t
    return pl.pallas_call(
        partial(_entry_reduce_kernel, W=W, nsteps=nsteps),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((W, C), jnp.float32)],
        interpret=interpret,
    )(fr, vp)
