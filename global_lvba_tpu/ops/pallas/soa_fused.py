"""Fused Pallas kernels for the plane-factor SoA evaluation.

The componentwise linearization (factors/plane_eigen._soa_agg/_soa_eig/
_soa_chain — the TPU re-design of acc_evaluate2, /root/reference/include/
BALM/bavoxel.hpp:68-174) is ~300 elementwise ops per (voxel, frame) entry.
Left to XLA, it fragments into ~185 fusion launches + ~190 async copies
per evaluation (measured on the W=512 bench scene): the work is only
~0.15 GFLOP, so the evaluation is pure launch/copy latency — ~15 ms of
the 29 ms one-hot evaluation, ~100x above the bandwidth roofline.

Design: the pipeline is split around the one stage Mosaic cannot lower —
the closed-form 3x3 eigendecomposition needs `arccos`, which has no
Pallas TPU primitive — into

  kernel 1  (aggregation)  per-entry moment transform + reductions over
            the K observer axis (wholly inside each block) -> per-voxel
            stats (N, invN, vbar, world covariance), (V, 16) packed;
  XLA       eigh3_soa + factor-row scalings on the tiny (V,) arrays
            (a few fusions over ~10^3-element arrays — negligible);
  kernel 2  (chain) re-reads the entry operands, recomputes the cheap
            per-entry products (R·mu, R·Pc — cheaper than writing them
            out), and runs the full linearization chain -> 60 output
            channels.

Both kernels run the SAME jnp code as the XLA path (imported from
plane_eigen), so there is nothing to keep in sync; only the I/O layout
differs:

  inputs   n (V, K); mu (3, V, K); Pc (6, V, K); Rg (9, V, K);
           pg (3, V, K)   — channel-major so each channel load is one
           contiguous (Vt, K) tile
  outputs  kernel 1: agg (V, 16) = [N, invN, vb(3), cov6, pad];
           kernel 2: rows18 (18, V, K); jjt6 (6, V, K); D36 (36, V, K)

The pose gather R[fa.frame] stays OUTSIDE in XLA (measured ~free: 14.2 ms
with gather vs 14.8 ms with pre-gathered operands), as do the one-hot
frame-expansion matmuls and the -MᵀM Gram (MXU work XLA handles well).

V is padded to the tile size with zero entries: n = 0 rows produce
exactly-zero outputs through the shared masking (same guarantee the
zero-padded (V, K) buckets already rely on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _read_entry(n_ref, mu_ref, pc_ref, r9_ref, p3_ref):
    n = n_ref[...]
    mu3 = (mu_ref[0], mu_ref[1], mu_ref[2])
    P6 = tuple(pc_ref[i] for i in range(6))
    R9 = tuple(r9_ref[i] for i in range(9))
    p3 = (p3_ref[0], p3_ref[1], p3_ref[2])
    return n, mu3, P6, R9, p3


def _agg_kernel(n_ref, mu_ref, pc_ref, r9_ref, p3_ref, agg_ref):
    from ...factors.plane_eigen import _soa_agg

    n, mu3, P6, R9, p3 = _read_entry(n_ref, mu_ref, pc_ref, r9_ref, p3_ref)
    _, _, N, invN, vb, _, _, cov6 = _soa_agg(n, mu3, P6, R9, p3)
    cols = (N, invN) + vb + cov6                    # 11 live columns
    for i, c in enumerate(cols):
        agg_ref[:, i] = c
    for i in range(len(cols), agg_ref.shape[1]):
        agg_ref[:, i] = jnp.zeros_like(N)


def _chain_kernel(n_ref, mu_ref, pc_ref, r9_ref, p3_ref, pv_ref,
                  rows_ref, jjt_ref, d36_ref):
    from ...factors.plane_eigen import _soa_agg, _soa_chain

    n, mu3, P6, R9, p3 = _read_entry(n_ref, mu_ref, pc_ref, r9_ref, p3_ref)
    # per-entry products (mask, R·mu, R·Pc) recomputed in VMEM — cheaper
    # than a second HBM round-trip of 12 channels; the reductions this
    # also recomputes are dead code Mosaic eliminates
    mask, nm, _, _, _, Rm, RP, _ = _soa_agg(n, mu3, P6, R9, p3)
    u = (pv_ref[:, 0], pv_ref[:, 1], pv_ref[:, 2])
    B1 = (pv_ref[:, 3], pv_ref[:, 4], pv_ref[:, 5])
    B2 = (pv_ref[:, 6], pv_ref[:, 7], pv_ref[:, 8])
    vb = (pv_ref[:, 9], pv_ref[:, 10], pv_ref[:, 11])
    invN = pv_ref[:, 12]
    rows_ch, jjt_ch, d36_ch = _soa_chain(
        mask, nm, invN, vb, Rm, RP, mu3, P6, R9, p3, u, B1, B2
    )
    for i, ch in enumerate(rows_ch):
        rows_ref[i] = ch
    for i, ch in enumerate(jjt_ch):
        jjt_ref[i] = ch
    for i, ch in enumerate(d36_ch):
        d36_ref[i] = ch


def _channel_major(fa, Rg, pg):
    """(V, K, ...) bucket + gathered poses -> channel-major operands."""
    V, K = fa.n.shape
    mu = jnp.moveaxis(fa.mu, -1, 0)                       # (3, V, K)
    pc = jnp.stack([
        fa.Pc[..., 0, 0], fa.Pc[..., 0, 1], fa.Pc[..., 0, 2],
        fa.Pc[..., 1, 1], fa.Pc[..., 1, 2], fa.Pc[..., 2, 2],
    ])                                                    # (6, V, K)
    r9 = jnp.moveaxis(Rg.reshape(V, K, 9), -1, 0)         # (9, V, K)
    p3 = jnp.moveaxis(pg, -1, 0)                          # (3, V, K)
    return mu, pc, r9, p3


def _tile(V: int, K: int, budget_elems: int = 8192):
    """V-tile size: sublane-aligned, sized so the chain kernel's live set
    fits scoped VMEM.  Mosaic lays each (vt, K) value out padded to 128
    lanes, and the linearization chain holds ~150 live values at its widest
    point (measured from the compiler's stack-OOM report: vt=256, K=32 ->
    20.25 MB scoped), so the footprint is ~vt * roundup(K, 128) * 4 B * 160
    regardless of K <= 128 — budget it against ~11 MB of the 16 MB limit."""
    lanes = -(-max(K, 1) // 128) * 128
    vt = min(budget_elems // max(K, 1), 11 * 1024 * 1024 // (lanes * 4 * 160))
    vt = max(8, min(V, (vt // 8) * 8))
    vp = -(-V // vt) * vt
    return vt, vp


def _pad_v(x, vp, axis):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, vp - x.shape[axis])
    return jnp.pad(x, pad) if vp != x.shape[axis] else x


def _prep(fa, Rg, pg):
    V, K = fa.n.shape
    mu, pc, r9, p3 = _channel_major(fa, Rg, pg)
    vt, vp = _tile(V, K)
    n = _pad_v(fa.n, vp, 0)
    mu, pc, r9, p3 = (_pad_v(x, vp, 1) for x in (mu, pc, r9, p3))
    ch_spec = lambda c: pl.BlockSpec(
        (c, vt, K), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    entry_specs = [
        pl.BlockSpec((vt, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ch_spec(3), ch_spec(6), ch_spec(9), ch_spec(3),
    ]
    pv_spec = pl.BlockSpec((vt, 16), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return (n, mu, pc, r9, p3), entry_specs, ch_spec, pv_spec, vt, vp


def _agg(fa, Rg, pg, interpret):
    """Kernel-1 aggregation -> (N, invN, vb(3 tuple), cov6 (6 tuple))."""
    dt = fa.n.dtype
    ops, entry_specs, _, pv_spec, vt, vp = _prep(fa, Rg, pg)
    agg = pl.pallas_call(
        _agg_kernel,
        grid=(vp // vt,),
        in_specs=entry_specs,
        out_specs=pv_spec,
        out_shape=jax.ShapeDtypeStruct((vp, 16), dt),
        interpret=interpret,
    )(*ops)
    V = fa.n.shape[0]
    agg = agg[:V]
    return (agg[:, 0], agg[:, 1], tuple(agg[:, 2 + i] for i in range(3)),
            tuple(agg[:, 5 + i] for i in range(6)))


def soa_fused_channels(fa, Rg, pg, interpret: bool = False):
    """Fused evaluation -> (residv (V,), rows (18, V, K), jjt (6, V, K),
    d36 (36, V, K)).  Output channel order matches plane_eigen's stacked
    (V, K, C) arrays."""
    from ...factors.plane_eigen import _soa_eig

    V, K = fa.n.shape
    dt = fa.n.dtype
    interpret = interpret or jax.default_backend() != "tpu"

    N, invN, vb, cov6 = _agg(fa, Rg, pg, interpret)
    residv, u, B1, B2 = _soa_eig(cov6, N)            # tiny (V,) XLA region
    pv = jnp.stack(
        u + B1 + B2 + vb + (invN,), axis=-1
    )                                                 # (V, 13)
    pv = jnp.pad(pv, ((0, 0), (0, 3)))                # (V, 16)

    ops, entry_specs, ch_spec, pv_spec, vt, vp = _prep(fa, Rg, pg)
    rows, jjt, d36 = pl.pallas_call(
        _chain_kernel,
        grid=(vp // vt,),
        in_specs=entry_specs + [pv_spec],
        out_specs=[ch_spec(18), ch_spec(6), ch_spec(36)],
        out_shape=[
            jax.ShapeDtypeStruct((18, vp, K), dt),
            jax.ShapeDtypeStruct((6, vp, K), dt),
            jax.ShapeDtypeStruct((36, vp, K), dt),
        ],
        interpret=interpret,
    )(*ops, _pad_v(pv, vp, 0))
    return residv, rows[:, :V], jjt[:, :V], d36[:, :V]


def soa_resid_fused(fa, Rg, pg, interpret: bool = False):
    """Fused residual-only evaluation -> residv (V,)."""
    from ...ops.eigh3 import eigvals3_soa

    interpret = interpret or jax.default_backend() != "tpu"
    N, _, _, cov6 = _agg(fa, Rg, pg, interpret)
    lam0, _, _ = eigvals3_soa(*cov6)
    return jnp.where(N > 0, lam0, 0.0)
