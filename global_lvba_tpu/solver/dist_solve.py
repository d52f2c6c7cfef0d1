"""Distributed reduced-system solve: block-Jacobi preconditioned CG.

Replaces the replicated LU factorization of the damped reduced system —
the scaling wall once W (keyframes/anchors) reaches the thousands — with a
solver whose per-iteration work partitions over the 'frames' mesh axis:

  * the (6W, 6W) system matrix is row-sharded over frames; the CG matvec
    is a sharded matmul whose row blocks evaluate locally, with XLA
    inserting the all-gather of the replicated direction vector and the
    psum for the dot products (SURVEY.md §2.3 items 2/5 — the distributed
    replacement for SimplicialLDLT, /root/reference/include/BALM/
    bavoxel.hpp:695-710, and Ceres DENSE_SCHUR,
    /root/reference/src/lvba_system.cpp:1571-1576);
  * the preconditioner is the inverse of the 6x6 (or bsize x bsize)
    diagonal blocks — entirely local to each row shard;
  * fixed-trip fori_loop with done-masking (dynamic while_loop de-optimizes
    ~100x through this backend, see solver/lm.py).

The replicated LU remains the default for small W where an O(W^3) direct
solve on one chip is cheaper than ~sqrt(kappa) sharded matvecs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def _inv3_batched(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched 3x3 blocks via the adjugate —
    componentwise VPU math; jnp.linalg.inv on small batched blocks lowers
    to a serialized LAPACK-style loop on TPU.

    Each block is normalized by its max |entry| before the adjugate: tiny
    damped blocks (entries ~1e-12 on eps-pinned zero-rows) would otherwise
    underflow the f32 cofactors/det to 0 and silently return ~0 instead of
    the large inverse.  inv(s*A') = inv(A')/s restores the scale."""
    s = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    s = jnp.where(s == 0, jnp.ones_like(s), s)
    A = A / s
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(det == 0, 1e-30, det)
    r0 = jnp.stack([c00, a02 * a21 - a01 * a22, a01 * a12 - a02 * a11], -1)
    r1 = jnp.stack([c01, a00 * a22 - a02 * a20, a02 * a10 - a00 * a12], -1)
    r2 = jnp.stack([c02, a01 * a20 - a00 * a21, a00 * a11 - a01 * a10], -1)
    return jnp.stack([r0, r1, r2], -2) * (inv_det[..., None, None] / s)


def inv_blocks_6x6(D: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched 6x6 blocks by 2x2-of-3x3 Schur
    complement: two adjugate 3x3 inverses + a handful of batched 3x3
    products.  Replaces jnp.linalg.inv for the block-Jacobi
    preconditioners — the batched LAPACK inverse was most of the ~7.7 ms
    FIXED cost of the W=512 damped CG solve (trip count barely moved it).
    Valid for the damped SPD diagonal blocks this is used on (the (0,0)
    3x3 sub-block of an SPD matrix is SPD, hence invertible)."""
    A = D[..., :3, :3]
    B = D[..., :3, 3:]
    C = D[..., 3:, :3]
    E = D[..., 3:, 3:]
    Ai = _inv3_batched(A)
    CAi = C @ Ai
    S = E - CAi @ B
    Si = _inv3_batched(S)
    AiB = Ai @ B
    TL = Ai + AiB @ (Si @ CAi)
    TR = -(AiB @ Si)
    BL = -(Si @ CAi)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Si], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _inv_blocks(D: jnp.ndarray) -> jnp.ndarray:
    """Batched small-block inverse: closed form for 6x6, LAPACK otherwise."""
    if D.shape[-1] == 6:
        return inv_blocks_6x6(D)
    return jnp.linalg.inv(D)


def _block_jacobi_inv(A: jnp.ndarray, bsize: int) -> jnp.ndarray:
    """Inverses of the bsize x bsize diagonal blocks of A (n, n)."""
    return _block_jacobi_inv_damped(A, None, bsize)


def _block_jacobi_inv_damped(A: jnp.ndarray, damp, bsize: int) -> jnp.ndarray:
    """Block-Jacobi inverse of A + diag(damp) WITHOUT materializing the
    damped matrix: `H + jnp.diag(u*d+eps)` creates two full (n, n)
    temporaries, which at W = 512 (37.7 MB each) measured 3.8 ms of the
    damped-CG preamble — most of its fixed cost (round-5 chip
    decomposition).  The damping only touches the diagonal, so it is
    added to the EXTRACTED (W, b, b) blocks instead; bit-identical (the
    masked sum's off-diagonal zero terms are exact)."""
    n = A.shape[0]
    W = n // bsize
    blocks = A.reshape(W, bsize, W, bsize)
    # masked-sum extraction: an [arange, :, arange, :] gather serializes
    # on TPU (same pathology as the Hd scatter, see plane_eigen.
    # add_block_diag); the mask-multiply is one fused pass over A
    eyeW = (jnp.arange(W)[:, None] == jnp.arange(W)[None, :]).astype(A.dtype)
    diag = jnp.sum(blocks * eyeW[:, None, :, None], axis=2)  # (W, b, b)
    eye = jnp.eye(bsize, dtype=A.dtype)
    if damp is not None:
        diag = diag + damp.reshape(W, bsize)[:, :, None] * eye
    return _inv_blocks(diag + 1e-30 * eye)


def _pcg(matvec, precond, b, max_iters: int, tol: float):
    """Shared preconditioned-CG iteration: fixed-trip fori_loop with
    done-masking (see module docstring), convergence on ||r||/||b|| < tol.
    Vectors may be any pytree-shaped array; dots use vdot on the raveled
    values.  All three solver entry points (dense damped, matrix-free
    rows, matrix-free Schur) share this loop so guard/freeze semantics
    cannot silently diverge."""
    x = jnp.zeros_like(b)
    r = b
    z = precond(r)
    p = z
    rz = jnp.vdot(r, z)
    b2 = jnp.maximum(jnp.vdot(b, b), 1e-300)

    def body(_i, s):
        x, r, p, rz, done = s
        Ap = matvec(p)
        denom = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(denom == 0, 1.0, denom)
        x_n = x + alpha * p
        r_n = r - alpha * Ap
        z_n = precond(r_n)
        rz_n = jnp.vdot(r_n, z_n)
        beta = rz_n / jnp.where(rz == 0, 1.0, rz)
        p_n = z_n + beta * p
        conv = jnp.vdot(r_n, r_n) / b2 < tol * tol
        frz = lambda new, old: jnp.where(done, old, new)
        return (
            frz(x_n, x), frz(r_n, r), frz(p_n, p), frz(rz_n, rz),
            done | conv,
        )

    x, r, p, rz, done = jax.lax.fori_loop(
        0, max_iters, body, (x, r, p, rz, jnp.zeros((), jnp.bool_))
    )
    return x


def solve_damped_cg_rows(
    rows_list,
    frame_list,
    tbl_list,
    Hd: jnp.ndarray,
    g: jnp.ndarray,
    u: jnp.ndarray,
    max_iters: int = 256,
    tol: float = 1e-10,
):
    """MATRIX-FREE damped solve: (H + u diag(H)) dx = -g where
    H = scatter_diag(Hd) - MᵀM is applied straight from compact factor
    rows (factors/plane_eigen.py:plane_rows_matvec) — the (6W, 6W) Gram
    product, its HBM materialization, and the LU are all skipped.  This
    is the large-W scaling path: per-matvec work is O(V K).

    rows_list/frame_list/tbl_list: per-bucket (V, K, 18) rows, (V, K)
    frame ids, (W, Kf) frame-major gather tables
    (plane_eigen.frame_gather_table).  Hd: (W, 6, 6) diagonal extras;
    g: (W, 6).  Returns (dx (6W,), d (6W,)) with d = diag(H) (the LM
    gain-ratio denominator needs it)."""
    from ..factors.plane_eigen import plane_rows_cross_diag, plane_rows_matvec

    W = Hd.shape[0]
    dt = Hd.dtype
    with jax.default_matmul_precision("highest"):
        Dblk = Hd - sum(
            plane_rows_cross_diag(r, tbl, W)
            for r, tbl in zip(rows_list, tbl_list)
        )                                             # true 6x6 diag blocks
        d = jnp.diagonal(Dblk, axis1=1, axis2=2)      # (W, 6) = diag(H)
        # same epsilon as _solve_damped: pins frames with exactly-zero
        # rows (no factor observations) and keeps all solver paths
        # solving the IDENTICAL damped system
        eps = 1e-12 * (1.0 + jnp.max(jnp.abs(d)))
        eye = jnp.eye(6, dtype=dt)
        Minv = _inv_blocks(Dblk + (u * d + eps)[:, :, None] * eye)

        def matvec(x):                                # (W, 6) -> (W, 6)
            y = jnp.einsum("wab,wb->wa", Hd, x) + (u * d + eps) * x
            for r, f, tbl in zip(rows_list, frame_list, tbl_list):
                y = y - plane_rows_matvec(r, f, tbl, x)
            return y

        def precond(r):
            return jnp.einsum("wab,wb->wa", Minv, r)

        x = _pcg(matvec, precond, -g, max_iters, tol)
        return x.reshape(-1), d.reshape(-1)


def solve_schur_cg_mf(
    dHcc: jnp.ndarray,
    W: jnp.ndarray,
    Y: jnp.ndarray,
    obs_cam: jnp.ndarray,
    obs_pt: jnp.ndarray,
    b: jnp.ndarray,
    num_pts: int,
    fix_first: bool = True,
    max_iters: int = 256,
    tol: float = 1e-10,
) -> jnp.ndarray:
    """MATRIX-FREE reduced-camera solve (the Ceres ITERATIVE_SCHUR
    analogue): S dc = b with S = diag(dHcc) - Σ_pairs Y_a W_bᵀ applied
    per OBSERVATION — S x = dHcc x - Y · segsum_pt(Wᵀ x) — so the
    O(Σ track_len²) observation-pair list is never built at all and the
    per-matvec work is O(O).  Replaces the pair-scatter assembly of
    DENSE_SCHUR (/root/reference/src/lvba_system.cpp:1571-1576).

    dHcc: (M, 6, 6) DAMPED camera diag blocks; W/Y: (O, 6, 3) coupling
    and Y = W Hpp⁻¹; b: (M, 6) reduced rhs (row 0 already zeroed when
    fix_first).  The block-Jacobi preconditioner uses the exact diagonal
    of S when no camera observes the same point twice (the track builder
    dedups per image); with duplicates it is still a valid approximate
    preconditioner.  Returns dc (M, 6)."""
    M = dHcc.shape[0]
    dt = dHcc.dtype
    with jax.default_matmul_precision("highest"):
        cross = jax.ops.segment_sum(
            jnp.einsum("omk,onk->omn", Y, W), obs_cam, num_segments=M
        )
        Dblk = dHcc - cross
        eye = jnp.eye(6, dtype=dt)
        if fix_first:
            Dblk = Dblk.at[0].set(eye)
        Minv = _inv_blocks(Dblk + 1e-30 * eye)

        def matvec(x):                                # (M, 6) -> (M, 6)
            xm = x.at[0].set(0.0) if fix_first else x
            wx = jnp.einsum("omk,om->ok", W, xm[obs_cam])       # (O, 3)
            tp = jax.ops.segment_sum(wx, obs_pt, num_segments=num_pts)
            yo = jnp.einsum("omk,ok->om", Y, tp[obs_pt])        # (O, 6)
            y = jnp.einsum("mab,mb->ma", dHcc, xm) - jax.ops.segment_sum(
                yo, obs_cam, num_segments=M
            )
            if fix_first:
                y = y.at[0].set(x[0])
            return y

        def precond(r):
            return jnp.einsum("wab,wb->wa", Minv, r)

        return _pcg(matvec, precond, b, max_iters, tol)


class PMTier(NamedTuple):
    """One point-major tier: points whose track length fits K, padded.
    idx: (Pv, K) int32 into the FLAT observation arrays (pad -> O, a
    virtual all-zero row); cam: (Pv, K) int32 camera id (pad -> M, whose
    one-hot column is all-zero)."""

    idx: jnp.ndarray
    cam: jnp.ndarray


def _sel_pack3(vals: jnp.ndarray) -> jnp.ndarray:
    """3-way bf16 mantissa split packed along the channel axis (exact f32
    selection scheme — see factors/plane_eigen._split3_bf16).  f64 (CPU
    parity runs) passes through unsplit — the f64 dot is already exact."""
    if vals.dtype != jnp.float32:
        return vals
    from ..factors.plane_eigen import _split3_bf16

    return jnp.concatenate(_split3_bf16(vals), axis=-1)


def _sel_unpack3(d: jnp.ndarray, C: int) -> jnp.ndarray:
    if d.shape[-1] == C:
        return d
    return d[..., :C] + d[..., C:2 * C] + d[..., 2 * C:3 * C]


def solve_schur_cg_pm(
    dHcc: jnp.ndarray,
    W: jnp.ndarray,
    Y: jnp.ndarray,
    tiers,
    b: jnp.ndarray,
    fix_first: bool = True,
    max_iters: int = 48,
    tol: float = 1e-10,
) -> jnp.ndarray:
    """POINT-MAJOR matrix-free reduced-camera solve.

    Same system as solve_schur_cg_mf, but the matvec is restructured the
    way the LiDAR factor core was (round 4): per-observation gathers and
    segment_sums SERIALIZE on TPU (x[obs_cam], segment_sum(., obs_pt) —
    four O-length scatter/gathers per matvec put the M=1000/O=200k bench
    at ~1.1 s/iter), so observations are repacked once per solve into
    padded (Pv, K) point-major tiers where

      * the point-side reduce/broadcast is a plain K-axis sum/broadcast
        (points never leave tier order — they are internal to S);
      * the camera-side expand/reduce are EXACT bf16-split selection
        matmuls against the tier's (Pv*K, M) one-hot, which is
        loop-invariant and streams from HBM instead of serializing.

    W/Y stay in flat obs order; each tier row-gathers them ONCE per call
    (outside the CG loop).  Padded slots carry zero W/Y rows and an
    out-of-range cam id, so they contribute exactly nothing.

    max_iters is 48 (round 4 used 96; the mf path 256): the fixed-trip
    done-masked loop pays every trip whether converged or not, and an LM
    outer loop tolerates an inexact inner solve — a truncated CG iterate
    on an SPD system is still a descent direction, and the Nielsen
    acceptance test rejects any step the truncation made bad
    (inexact-Newton semantics; Ceres' ITERATIVE_SCHUR similarly runs
    loose inner tolerances).  Measured at m1000 (round 5, 10-outer
    budget): trips 48 and 96 converge to the IDENTICAL cost 62940.0
    while 48 is 27% faster end-to-end (0.88 vs 1.21 s).  Raise
    LVBA_PM_CG_ITERS for pathologically conditioned problems."""
    import os

    max_iters = int(os.environ.get("LVBA_PM_CG_ITERS", str(max_iters)))
    M = dHcc.shape[0]
    dt = dHcc.dtype
    with jax.default_matmul_precision("highest"):
        zrow = jnp.zeros((1,) + W.shape[1:], dt)
        Wp = jnp.concatenate([W, zrow])
        Yp = jnp.concatenate([Y, zrow])
        tdat = []
        for t in tiers:
            Wt = Wp[t.idx]                               # (Pv, K, 6, 3)
            Yt = Yp[t.idx]
            tdat.append((Wt, Yt, t.cam))
        return solve_schur_cg_pm_tiers(
            dHcc, tuple(tdat), b, fix_first=fix_first,
            max_iters=max_iters, tol=tol,
        )


def pm_onehot(cam: jnp.ndarray, M: int, dtype) -> jnp.ndarray:
    """(Pv*K, M) camera selection one-hot from tier camera ids (pad id M
    gives an all-zero row).  bf16 when the solve dtype is f32 (0/1 is
    exact in bf16; the VALUE operand is the one that gets the 3-way
    mantissa split), full width otherwise."""
    Pv, K = cam.shape
    oh_dt = jnp.bfloat16 if dtype == jnp.float32 else dtype
    return (
        cam[..., None] == jnp.arange(M, dtype=cam.dtype)
    ).astype(oh_dt).reshape(Pv * K, M)


def solve_schur_cg_pm_tiers(
    dHcc: jnp.ndarray,
    tdat,
    b: jnp.ndarray,
    fix_first: bool = True,
    max_iters: int = 48,
    tol: float = 1e-10,
) -> jnp.ndarray:
    """Point-major CG core on TIER-RESIDENT data: tdat is a tuple of
    (Wt (Pv,K,6,3), Yt (Pv,K,6,3), cam (Pv,K) int32 ids) — the
    tier-native LM loop (schur._lm_device_loop_tiers) produces W/Y in
    tier layout directly, so no per-call row gathers remain.  One-hots
    are generated INLINE from the ids at each use: XLA fuses the
    compare-broadcast into the dot's operand read, so only the int32
    ids touch HBM — a PRE-MATERIALIZED (Pv*K, M) one-hot is ~0.6 GB at
    M=1000/O=200k and streaming it twice per CG trip measured
    +113 ms/iter on chip (this round's probe)."""
    import os

    max_iters = int(os.environ.get("LVBA_PM_CG_ITERS", str(max_iters)))
    M = dHcc.shape[0]
    dt = dHcc.dtype
    with jax.default_matmul_precision("highest"):
        eye = jnp.eye(6, dtype=dt)
        cross = jnp.zeros((M, 6, 6), dt)
        for Wt, Yt, cam in tdat:
            Pv, K = Wt.shape[:2]
            yw = jnp.einsum("pkac,pkbc->pkab", Yt, Wt)   # Y W^T (6, 6)
            d = jax.lax.dot_general(
                pm_onehot(cam, M, dt), _sel_pack3(yw.reshape(Pv * K, 36)),
                (((0,), (0,)), ((), ())), preferred_element_type=dt,
            )
            cross = cross + _sel_unpack3(d, 36).reshape(M, 6, 6)
        Dblk = dHcc - cross
        if fix_first:
            Dblk = Dblk.at[0].set(eye)
        Minv = _inv_blocks(Dblk + 1e-30 * eye)

        def matvec(x):                                   # (M, 6) -> (M, 6)
            xm = x.at[0].set(0.0) if fix_first else x
            y = jnp.einsum("mab,mb->ma", dHcc, xm)
            xs3 = _sel_pack3(xm)                         # (M, 18) bf16
            for Wt, Yt, cam in tdat:
                Pv, K = Wt.shape[:2]
                oh = pm_onehot(cam, M, dt)               # fused, not stored
                xe = _sel_unpack3(
                    jax.lax.dot_general(
                        oh, xs3, (((1,), (0,)), ((), ())),
                        preferred_element_type=dt,
                    ), 6,
                ).reshape(Pv, K, 6)                      # x at each obs
                wx = jnp.einsum("pkmn,pkm->pkn", Wt, xe)  # (Pv, K, 3)
                tp = jnp.sum(wx, axis=1)                 # (Pv, 3) = point
                yo = jnp.einsum("pkmn,pn->pkm", Yt, tp)  # (Pv, K, 6)
                d = jax.lax.dot_general(
                    oh, _sel_pack3(yo.reshape(Pv * K, 6)),
                    (((0,), (0,)), ((), ())), preferred_element_type=dt,
                )
                y = y - _sel_unpack3(d, 6)
            if fix_first:
                y = y.at[0].set(x[0])
            return y

        def precond(r):
            return jnp.einsum("wab,wb->wa", Minv, r)

        return _pcg(matvec, precond, b, max_iters, tol)


def _pair_aligned(offsets, width: int, W: int) -> bool:
    """True when a bucket's group offsets admit the PAIR-WINDOW matvec:
    width is two equal blocks, W tiles exactly into blocks, and every
    offset sits on a block boundary (build_banded_groups guarantees this
    whenever block | W; the clamped last window breaks it otherwise)."""
    if width % 2:
        return False
    block = width // 2
    if block == 0 or W % block:
        return False
    return all(o % block == 0 and o <= W - width for o in offsets)


def _pair_onehot(offsets, block: int, n_pairs: int, dtype) -> jnp.ndarray:
    """(G, n_pairs) 0/1 selection of each group's pair-window row.  Exact
    under any matmul precision: every output element of a selection
    product has exactly one nonzero term.  Works for concrete python
    offsets and traced offset arrays alike."""
    offs = jnp.asarray(offsets, jnp.int32)
    return (
        offs[:, None] // block == jnp.arange(n_pairs, dtype=jnp.int32)
    ).astype(dtype)


def _pair_fold(x: jnp.ndarray, block: int):
    """x (W, 6) -> all block-pair windows (n_pairs, 2*block*6): row s is
    x[s*block : s*block + 2*block] flattened.  Pure reshape/concat —
    no slices at traced offsets, so the consumer einsums shard under
    GSPMD with the group axis partitioned."""
    nb = x.shape[0] // block
    xb = x.reshape(nb, block * 6)
    return jnp.concatenate([xb[:-1], xb[1:]], axis=-1)


def _pair_unfold(yp: jnp.ndarray, block: int, W: int, ch: int = 6):
    """Inverse scatter of _pair_fold: pair-row contributions
    (n_pairs, 2*block*ch) -> (W, ch) by adding each row's halves to its
    two constituent blocks.  Static slices only."""
    nb = W // block
    dt = yp.dtype
    yb = jnp.zeros((nb, block * ch), dt)
    yb = yb.at[:-1].add(yp[:, : block * ch])
    yb = yb.at[1:].add(yp[:, block * ch:])
    return yb.reshape(W, ch)


def solve_damped_cg_banded_vec(
    grams_list,
    wide_list,
    offsets_list,
    Hd: jnp.ndarray,
    g: jnp.ndarray,
    u: jnp.ndarray,
    max_iters: int = 96,
    tol: float = 1e-10,
):
    """PAIR-WINDOW banded damped CG — the vectorized (and distributable)
    form of solve_damped_cg_banded.  Every group covers exactly two
    consecutive frame blocks (caller checked _pair_aligned), so the
    banded matvec is three einsums per bucket with NO per-group loop and
    no dynamic slices:

        win = onehot @ pair_fold(x)          # (G, 12b) window select
        yg  = batched_gram @ win             # (G, 12b)
        y  -= pair_unfold(onehotᵀ @ yg)      # scatter back

    Under GSPMD with the Gram stack (and its offsets/one-hot) sharded
    over the mesh's factor axis, the first two einsums are device-local
    and the third's G-contraction becomes the psum — the distributed
    compact-banded solve never materializes a (6W)² buffer on ANY device
    (the single-device dense LDLT it replaces:
    /root/reference/include/BALM/bavoxel.hpp:695-710).

    offsets_list entries may be python int tuples (split LM) or traced
    int arrays (fused sharded LM).  Exactness: the one-hot products are
    pure selections (each output element has exactly one nonzero term —
    at most one group per start block per bucket, and zero-padded groups
    contribute exact zeros), so results match the unrolled static-slice
    path to summation-order rounding."""
    import os

    max_iters = int(os.environ.get("LVBA_BANDED_CG_ITERS", str(max_iters)))
    W = Hd.shape[0]
    dt = Hd.dtype
    with jax.default_matmul_precision("highest"):
        # precompute per-bucket selection one-hots + static geometry
        sel = []
        for grams, offs in zip(grams_list, offsets_list):
            width = grams.shape[1] // 6
            block = width // 2
            n_pairs = W // block - 1
            sel.append((_pair_onehot(offs, block, n_pairs, dt), block))

        # true diagonal 6x6 blocks for damping + preconditioner
        Dblk = Hd
        for (oh, block), grams, wM in zip(sel, grams_list, wide_list):
            G = grams.shape[0]
            width = grams.shape[1] // 6
            gb = grams.reshape(G, width, 6, width, 6)
            eyew = (jnp.arange(width)[:, None]
                    == jnp.arange(width)[None, :]).astype(dt)
            ldiag = jnp.sum(gb * eyew[None, :, None, :, None], axis=3)
            dp = jnp.einsum("gp,gx->px", oh, ldiag.reshape(G, width * 36))
            Dblk = Dblk - _pair_unfold(dp, block, W, ch=36).reshape(W, 6, 6)
            if wM.shape[0]:
                Dblk = Dblk - jnp.einsum("vwrc,vwrd->wcd", wM, wM)
        d = jnp.diagonal(Dblk, axis1=1, axis2=2)          # (W, 6)
        eps = 1e-12 * (1.0 + jnp.max(jnp.abs(d)))
        eye = jnp.eye(6, dtype=dt)
        Minv = _inv_blocks(Dblk + (u * d + eps)[:, :, None] * eye)

        def matvec(x):                                    # (W, 6)
            y = jnp.einsum("wab,wb->wa", Hd, x) + (u * d + eps) * x
            for (oh, block), grams, wM in zip(sel, grams_list, wide_list):
                pairs = _pair_fold(x, block)              # (n_pairs, 12b)
                win = jnp.einsum("gp,pc->gc", oh, pairs)  # window select
                yg = jnp.einsum("gab,gb->ga", grams, win)
                yp = jnp.einsum("gp,gc->pc", oh, yg)      # G-contraction
                y = y - _pair_unfold(yp, block, W)
                if wM.shape[0]:
                    s = jnp.einsum("vwrc,wc->vr", wM, x)
                    y = y - jnp.einsum("vwrc,vr->wc", wM, s)
            return y

        def precond(r):
            return jnp.einsum("wab,wb->wa", Minv, r)

        x = _pcg(matvec, precond, -g, max_iters, tol)
        return x.reshape(-1), d.reshape(-1)


def solve_damped_cg_banded(
    grams_list,
    wide_list,
    offsets_list,
    Hd: jnp.ndarray,
    g: jnp.ndarray,
    u: jnp.ndarray,
    max_iters: int = 96,
    tol: float = 1e-10,
):
    """Damped CG on the BANDED Hessian representation — the (6W)² matrix
    is never materialized (its 2.4 GB buffer at W = 4096 is what the
    remote-compile service rejects; scripts/probe_w4096.py).

    H = diag(Hd) - Σ_buckets [ scatter(grams by offset) + wide_Mᵀ wide_M ]
    applied directly: per group, a static window slice of x, one batched
    (G, 6w, 6w) matmul, static window adds back; stragglers apply through
    their (Vw, W, 3, 6) factor rows.  offsets_list: per-bucket TUPLES of
    python ints (the split LM is host-driven, so offsets are concrete) —
    static slices compile to fixed ranges instead of serialized gathers.

    max_iters defaults to 96 (inexact-Newton semantics, same rationale as
    solve_schur_cg_pm); LVBA_BANDED_CG_ITERS restores a deeper inner solve
    for ill-conditioned problems routed to the split/banded path.

    Returns (dx (6W,), d (6W,)) with d = diag(H) (LM gain ratio)."""
    import os

    max_iters = int(os.environ.get("LVBA_BANDED_CG_ITERS", str(max_iters)))
    W = Hd.shape[0]
    # LVBA_BANDED_PAIR=1 routes aligned-offset solves through the
    # pair-window vectorized form.  Default OFF single-chip by on-chip
    # A/B (W=4096: unrolled 634 vs pair 877 ms/iter — the unrolled
    # static-slice chains fuse better than the fold/scatter einsums);
    # the DISTRIBUTED path always uses the pair form directly
    # (solve_damped_cg_banded_vec), where shard_map needs loop-free
    # structure and the G-contraction psum.
    if os.environ.get("LVBA_BANDED_PAIR", "0") == "1" and all(
        isinstance(offs, tuple)
        and _pair_aligned(offs, grams.shape[1] // 6, W)
        for grams, offs in zip(grams_list, offsets_list)
    ):
        return solve_damped_cg_banded_vec(
            grams_list, wide_list, offsets_list, Hd, g, u,
            max_iters=max_iters, tol=tol,
        )
    dt = Hd.dtype
    with jax.default_matmul_precision("highest"):
        # true diagonal 6x6 blocks for damping + preconditioner
        Dblk = Hd
        for grams, wM, offs in zip(grams_list, wide_list, offsets_list):
            G = grams.shape[0]
            width = grams.shape[1] // 6
            gb = grams.reshape(G, width, 6, width, 6)
            eyew = (jnp.arange(width)[:, None]
                    == jnp.arange(width)[None, :]).astype(dt)
            ldiag = jnp.sum(gb * eyew[None, :, None, :, None], axis=3)
            add = jnp.zeros((W, 6, 6), dt)
            for i, o in enumerate(offs):
                add = jax.lax.dynamic_update_slice(
                    add,
                    jax.lax.dynamic_slice(
                        add, (o, 0, 0), (width, 6, 6)) + ldiag[i],
                    (o, 0, 0),
                )
            Dblk = Dblk - add
            if wM.shape[0]:
                Dblk = Dblk - jnp.einsum("vwrc,vwrd->wcd", wM, wM)
        d = jnp.diagonal(Dblk, axis1=1, axis2=2)          # (W, 6)
        eps = 1e-12 * (1.0 + jnp.max(jnp.abs(d)))
        eye = jnp.eye(6, dtype=dt)
        Minv = _inv_blocks(Dblk + (u * d + eps)[:, :, None] * eye)

        def matvec(x):                                    # (W, 6)
            y = jnp.einsum("wab,wb->wa", Hd, x) + (u * d + eps) * x
            for grams, wM, offs in zip(grams_list, wide_list, offsets_list):
                G = grams.shape[0]
                width = grams.shape[1] // 6
                win = jnp.stack(
                    [jax.lax.dynamic_slice(x, (o, 0), (width, 6))
                     for o in offs]
                ).reshape(G, width * 6)
                yg = jnp.einsum("gab,gb->ga", grams, win).reshape(
                    G, width, 6)
                for i, o in enumerate(offs):
                    y = jax.lax.dynamic_update_slice(
                        y,
                        jax.lax.dynamic_slice(y, (o, 0), (width, 6))
                        - yg[i],
                        (o, 0),
                    )
                if wM.shape[0]:
                    s = jnp.einsum("vwrc,wc->vr", wM, x)
                    y = y - jnp.einsum("vwrc,vr->wc", wM, s)
            return y

        def precond(r):
            return jnp.einsum("wab,wb->wa", Minv, r)

        x = _pcg(matvec, precond, -g, max_iters, tol)
        return x.reshape(-1), d.reshape(-1)


def solve_damped_cg(
    H: jnp.ndarray,
    g: jnp.ndarray,
    u: jnp.ndarray,
    bsize: int = 6,
    max_iters: int = 256,
    tol: float = 1e-10,
    h_sharding=None,
) -> jnp.ndarray:
    """Solve (H + u * diag(H)) dx = -g by block-Jacobi preconditioned CG.

    `h_sharding` (a NamedSharding row-sharding H over the frames axis)
    makes the matvec distribute under GSPMD; without it the same code runs
    single-device.  Matmuls run at HIGHEST precision — the bf16 default
    stalls convergence exactly as it does for the LU path (solver/lm.py).
    """
    with jax.default_matmul_precision("highest"):
        d = jnp.diagonal(H)
        # same epsilon as _solve_damped (solver/lm.py): pins exactly-zero
        # rows and keeps every solver path on the identical damped system
        eps = 1e-12 * (1.0 + jnp.max(jnp.abs(d)))
        if h_sharding is not None:
            H = jax.lax.with_sharding_constraint(H, h_sharding)

        def matvec(x):
            return H @ x + (u * d + eps) * x

        Minv = _block_jacobi_inv_damped(H, u * d + eps, bsize)

        def precond(r):
            W = r.shape[0] // bsize
            return jnp.einsum(
                "wab,wb->wa", Minv, r.reshape(W, bsize)
            ).reshape(-1)

        return _pcg(matvec, precond, -g, max_iters, tol)
