"""Levenberg-Marquardt driver for the LiDAR plane-eigen BA.

Replicates BALM2::damping_iter (/root/reference/include/BALM/
bavoxel.hpp:662-767) as a fully-jitted fixed-trip loop:

  * Nielsen damping: u = 0.01, v = 2; on acceptance
    u *= max(1/3, 1 - (2q-1)^3), v = 2; on rejection u *= v, v *= 2;
  * at most `max_iters` (reference: 10) outer iterations, fori_loop with
    done-masking (dynamic while_loop/cond de-optimize ~100x on TPU);
  * AVG_THR residual convention: residuals and the model decrease q1 are
    averaged over the factor count (bavoxel.hpp:634-635, 730-732);
  * convergence freezes the state when |r1 - r2| / r1 < 1e-6
    (bavoxel.hpp:759-761);
  * gauge left free — no pose is fixed, damping regularizes
    (matching the reference's free-gauge convention).

The damped normal equations are solved densely; for a window of W poses the
system is (6W, 6W) — tiny next to the factor evaluation, which is the real
per-iteration cost and runs as the batched fused kernel in
factors/plane_eigen.py.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..factors.plane_eigen import (
    AlignedBandedGroups,
    AlignedPlaneFactorArrays,
    PlaneFactorArrays,
    add_block_diag,
    banded_cgh,
    build_banded_groups,
    build_gather_plan,
    frame_gather_table,
    frame_slot_table,
    plane_cost,
    plane_cost_grad_hess,
    plane_cost_grad_rows,
)
from ..geometry.se3 import boxplus_pose


class LMResult(NamedTuple):
    R: jnp.ndarray
    p: jnp.ndarray
    iters: jnp.ndarray
    residual: jnp.ndarray


def _total_cost(buckets: Sequence[PlaneFactorArrays], R, p):
    c = jnp.zeros((), dtype=R.dtype)
    for fa in buckets:
        c = c + plane_cost(fa, R, p)
    return c


def _total_cgh(buckets: Sequence[PlaneFactorArrays], R, p, W, h_sharding=None,
               invs=None):
    resid = jnp.zeros((), dtype=R.dtype)
    g = jnp.zeros((W, 6), dtype=R.dtype)
    H = jnp.zeros((W, 6, W, 6), dtype=R.dtype)
    if invs is None:
        invs = (None,) * len(buckets)
    for fa, inv in zip(buckets, invs):
        r_, g_, H_ = plane_cost_grad_hess(fa, R, p, W, inv=inv)
        resid, g, H = resid + r_, g + g_, H + H_
    H = H.reshape(W * 6, W * 6)
    if h_sharding is not None:
        # keyframe-axis state parallelism: the assembled reduced system is
        # column-sharded over the 'frames' mesh axis (SURVEY.md §2.3 item 2)
        H = jax.lax.with_sharding_constraint(H, h_sharding)
    return resid, g.reshape(W * 6), H


def _banded_aligned() -> bool:
    """Trace-time switch for the frame-aligned banded-group layout: each
    group's slots align to its local 2B window, so the group evaluation is
    selection-free (no full-width pose one-hot per entry).  Default OFF:
    at banded scales the iteration is Gram-bound, not selection-bound —
    the W-wide pose one-hot is only ~1-2 ms of a 300+ ms W=2048 iteration
    while the dense local grid roughly doubles the chain work (chip A/B:
    W=4096 gather 1255 vs aligned 1333 ms/iter, same ATE).  Kept for span
    distributions dense within their window; LVBA_BANDED_ALIGNED=1
    enables."""
    return os.environ.get("LVBA_BANDED_ALIGNED", "0") == "1"


def _nielsen_update(res1, res2, q1, u, v, rel_tol):
    """Shared Nielsen trust-region bookkeeping (bavoxel.hpp:744-761):
    acceptance, damping update, convergence — used by BOTH LM loops
    (dense-H and matrix-free rows) so the schedule cannot diverge."""
    q = res1 - res2
    accept = q > 0
    qr = q / jnp.where(q1 == 0, 1.0, q1)
    u_acc = u * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * qr - 1.0) ** 3)
    u_new = jnp.where(accept, u_acc, u * v)
    v_new = jnp.where(accept, jnp.asarray(2.0, u.dtype), 2.0 * v)
    converged = jnp.abs(res1 - res2) / jnp.where(
        res1 == 0, 1.0, jnp.abs(res1)
    ) < rel_tol
    return accept, u_new, v_new, converged


def _solve_damped(H, g, u, refine: bool = True):
    """Solve (H + u * diag(H)) dx = -g with optional iterative refinement.

    Runs under HIGHEST matmul precision: the TPU default lowers the LU
    factorization's inner matmuls to bf16 passes, which at 6W ~ 1000 state
    dimensions degrades the step enough to stall LM convergence entirely
    (measured: W = 200 ATE diverged at default precision, converged in 4
    iterations at highest)."""
    with jax.default_matmul_precision("highest"):
        d = jnp.diagonal(H)
        # frames with no factor observations have exactly-zero rows (all
        # their points in non-planar voxels): multiplicative damping is
        # then zero too and the LU would NaN-poison the whole step.  The
        # epsilon pins such frames exactly (their gradient is exactly
        # zero -> dx = 0); the CG paths are naturally safe (zero residual
        # rows stay zero)
        eps = 1e-12 * (1.0 + jnp.max(jnp.abs(d)))
        A = H + jnp.diag(u * d + eps)
        lu, piv = jax.scipy.linalg.lu_factor(A)
        dx = jax.scipy.linalg.lu_solve((lu, piv), -g)
        if refine:
            r = -g - jnp.dot(A, dx)
            dx = dx + jax.scipy.linalg.lu_solve((lu, piv), r)
        return dx


def lm_damping_iter(
    buckets: Sequence[PlaneFactorArrays],
    R0: jnp.ndarray,
    p0: jnp.ndarray,
    max_iters: int = 10,
    u_init: float = 0.01,
    v_init: float = 2.0,
    rel_tol: float = 1e-6,
    h_sharding=None,
    reduced_solver: str = "auto",
    gather_tables: bool = None,
    hessian: str = "auto",
) -> LMResult:
    """Run damped LM over plane-eigen factor buckets.

    Jit-compiled as a whole (buckets are pytree arguments, so repeated
    solves with the same shapes reuse the executable) — calling the solver
    eagerly would dispatch the pre-loop evaluation op-by-op, which through
    a remote-device link costs orders of magnitude more than the compute.

    reduced_solver: "lu" (replicated direct solve; right for small W),
    "cg" (block-Jacobi preconditioned CG whose matvec distributes over the
    `h_sharding` row sharding — solver/dist_solve.py), "cg_mf" (MATRIX-FREE
    CG: the (6W)² Hessian is never assembled; H·x applies straight from
    compact factor rows — opt-in; on this hardware the Gram wins up to
    W≈4-8k, see the auto-policy note), or "auto" (cg once 6W >= 1536,
    else LU).

    hessian: "dense" Grams every bucket at full width W; "banded" groups
    voxels by observer-span frame block and Grams at local width 2B
    (plane_eigen.build_banded_groups) — Gram flops drop ~(2B/W)² on
    span-limited trajectories (corridors); "auto" measures the estimated
    flop ratio host-side at W >= 512 and picks banded when it saves >= 4x.

    Frame-ALIGNED buckets (buckets_to_device(vm, W=W), dense-occupancy
    scenes) evaluate selection-free and always take the dense-Gram jitted
    loop; gather tables / banded grouping / cg_mf target the bucketed
    layout's selection costs and are bypassed or rejected for them.
    """
    W = R0.shape[0]
    aligned = any(isinstance(fa, AlignedPlaneFactorArrays) for fa in buckets)
    # resolve the env fallback BEFORE the split-routing check below — a
    # default None would read as "no gather tables" there and silently
    # ignore LVBA_GATHER_M=1 for large-W solves
    if gather_tables is None:
        gather_tables = os.environ.get("LVBA_GATHER_M", "0") == "1"
    if aligned:
        # the aligned layout has no frame-selection to replace: gather
        # plans / banded grouping / the matrix-free rows path all target
        # the bucketed layout's selection costs
        if reduced_solver == "cg_mf":
            raise ValueError(
                "reduced_solver='cg_mf' needs bucketed factor arrays; "
                "build them with buckets_to_device(vm, layout='bucketed')"
            )
        gather_tables = False
        hessian = "dense"
    # very large W: route to the host-driven split-executable LM (three
    # bounded programs + the compact banded solve) — the fused whole-loop
    # program at W >= ~2048 is rejected by remote-compile services and its
    # dense (6W)² H stops fitting HBM by 8192.  Only from OUTSIDE a trace
    # (the split loop fetches scalars per iteration).
    split_w = int(os.environ.get("LVBA_SPLIT_W", "3072"))
    if (W >= split_w and not isinstance(R0, jax.core.Tracer)
            and h_sharding is None and not gather_tables
            and reduced_solver != "cg_mf"):
        return lm_damping_iter_split(
            buckets, R0, p0, max_iters=max_iters, u_init=u_init,
            v_init=v_init, rel_tol=rel_tol, reduced_solver=reduced_solver,
            hessian=hessian,
        )
    solver = str(reduced_solver)
    if solver == "auto":
        # CROSSOVER POLICY (measured, TPU v5e 1 chip):
        #   * reduced solve: LU below 6W = 1536, block-Jacobi CG above —
        #     LU is O((6W)^3) and lowers poorly on TPU;
        #   * Hessian assembly: dense Gram below W = 1024; at W >= 1024
        #     the banded auto-probe below engages the block-banded Gram
        #     when observer spans are local (>= 4x flop saving), cutting
        #     assembly flops by ~(2B/W)²;
        #   * cg_mf (fully matrix-free rows) stays OPT-IN: per-matvec row
        #     gathers serialize on TPU — corridor W=1024: Gram-CG 162 vs
        #     rows-CG 970 ms/iter — and the banded Gram now covers the
        #     sparse-coupling regime it was meant for;
        #   * single-chip ceiling: the assembled (6W)² f32 H reaches
        #     ~2.4 GB at W = 4096 and ~9.5 GB at W = 8192 (HBM 16 GB);
        #     beyond that, the window→anchor hierarchy + Morton factor
        #     sharding (parallel/spatial.py) scale across chips.
        solver = "cg" if 6 * W >= 1536 else "lu"
    if solver == "cg_mf":
        if h_sharding is not None:
            import logging

            logging.getLogger("global_lvba_tpu.solver").warning(
                "reduced_solver='cg_mf' ignores h_sharding (the matrix-free"
                " solve has no assembled H to row-shard); running replicated"
            )
        # frame-major gather tables, host-built once per solve (small
        # fetch of the frame/occupancy arrays)
        tables = tuple(frame_gather_table(fa, W) for fa in buckets)
        return _lm_rows_jitted(
            tuple(buckets), tables, R0, p0, int(max_iters), float(u_init),
            float(v_init), float(rel_tol),
        )
    if hessian in ("auto", "banded") and h_sharding is None:
        want = hessian == "banded"
        # auto engages only at W >= 1024: the group build fetches the
        # bucket stats to host (one round trip per leaf through a remote
        # link), which only pays for itself once the dense Gram dominates
        if want or W >= 1024:
            groups_all = []
            dense_cost = banded_cost = 0
            for fa in buckets:
                bg = build_banded_groups(fa, W, aligned=_banded_aligned())
                groups_all.append(bg)
                dense_cost += fa.n.shape[0] * W * W
                G, Vp, width = bg.fa.n.shape[:3]
                if not isinstance(bg, AlignedBandedGroups):
                    width = bg.inv.shape[-1]
                banded_cost += G * Vp * width * width
                banded_cost += bg.wide_fa.n.shape[0] * W * W
            if want or banded_cost * 4 <= dense_cost:
                g_size = sum(int(fa.n.shape[0]) for fa in buckets)
                return _lm_banded_jitted(
                    tuple(groups_all), R0, p0, int(max_iters),
                    float(u_init), float(v_init), float(rel_tol),
                    solver, int(g_size),
                )
    invs = (
        tuple(build_gather_plan(fa, W) for fa in buckets)
        if gather_tables else None
    )
    return _lm_jitted(
        tuple(buckets), invs, R0, p0, int(max_iters), float(u_init),
        float(v_init), float(rel_tol), h_sharding, solver,
    )


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def _lm_jitted(
    buckets,
    invs,
    R0: jnp.ndarray,
    p0: jnp.ndarray,
    max_iters: int,
    u_init: float,
    v_init: float,
    rel_tol: float,
    h_sharding,
    reduced_solver: str = "lu",
) -> LMResult:
    W = R0.shape[0]
    g_size = sum(int(fa.n.shape[0]) for fa in buckets)
    g_size_f = jnp.asarray(float(max(g_size, 1)), dtype=R0.dtype)
    solver = reduced_solver

    def cgh(R, p):
        r, g, H = _total_cgh(buckets, R, p, W, h_sharding, invs)
        return r / g_size_f, g, H

    res1_0, g_0, H_0 = cgh(R0, p0)

    # state: (R, p, u, v, res1, g, H, it, done)
    state = (
        R0,
        p0,
        jnp.asarray(u_init, R0.dtype),
        jnp.asarray(v_init, R0.dtype),
        res1_0,
        g_0,
        H_0,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.bool_),
    )

    def body_fn(_i, s):
        R, p, u, v, res1, g, H, it, done = s
        if solver == "cg":
            from .dist_solve import solve_damped_cg

            # 48 fixed trips = 2x margin over the measured convergence
            # (~22 iterations at W = 512, tol 1e-10 rel; 24-trip solve
            # already bit-matches the 256-trip reference through the
            # done-masked freeze).  Chip A/B at W=512: 96 -> 48 trips is
            # 12.28 -> 11.45 ms/iter with residual equal to 6 digits and
            # identical ATE.  LVBA_LIDAR_CG_ITERS overrides.
            dx = solve_damped_cg(
                H, g, u, h_sharding=h_sharding,
                max_iters=int(os.environ.get("LVBA_LIDAR_CG_ITERS", "48")),
            )
        else:
            dx = _solve_damped(H, g, u)
        dxp = dx.reshape(W, 6)
        R_t, p_t = boxplus_pose(R, p, dxp)
        d = jnp.diagonal(H)
        q1 = 0.5 * jnp.dot(dx, u * d * dx - g) / g_size_f

        # ONE factor evaluation per iteration, at the TRIAL point: its
        # residual is the acceptance test, and on acceptance its (g, H)
        # are exactly the next iteration's normal equations; on rejection
        # the carried (g, H) of the unchanged state are kept.  This beats
        # both the reference's is_calc_hess split (residual-only on reject
        # + full Hessian on accept, bavoxel.hpp:686-742) and a lax.cond
        # (which costs ~100x the evaluation inside a TPU loop): every
        # iteration does exactly one fused pass, never two.
        res2, g_t, H_t = cgh(R_t, p_t)
        accept, u_new, v_new, converged = _nielsen_update(
            res1, res2, q1, u, v, rel_tol
        )

        # The loop is a FIXED-trip fori_loop with done-masking, not a
        # while_loop: a dynamic trip count de-optimizes the whole body on
        # TPU (~100x per-iteration slowdown measured through this backend).
        # Once converged, the state freezes and the remaining iterations
        # are cheap replays of an unchanged state.  The accept-select and
        # done-freeze are ONE fused where (keep = accept & ~done): a
        # scalar-predicate select over the (6W, 6W) H costs ~1.7 ms per
        # pass at W = 512 (round-5 chip decomposition) and the old
        # two-where chain paid it twice.
        keep = accept & jnp.logical_not(done)
        sel = lambda new, old: jnp.where(keep, new, old)
        frz = lambda new, old: jnp.where(done, old, new)
        return (
            sel(R_t, R),
            sel(p_t, p),
            frz(u_new, u),
            frz(v_new, v),
            sel(res2, res1),
            sel(g_t, g),
            sel(H_t, H),
            jnp.where(done, it, it + 1),
            done | converged,
        )

    R, p, u, v, res1, g, H, it, done = jax.lax.fori_loop(
        0, max_iters, body_fn, state
    )
    return LMResult(R=R, p=p, iters=it, residual=res1)


@partial(jax.jit, static_argnums=(3,))
def _cgh_dense_exec(buckets, R, p, W, g_size_f):
    r, g, H = _total_cgh(buckets, R, p, W)
    return r / g_size_f, g, H


@partial(jax.jit, static_argnums=(3,))
def _cgh_banded_exec(groups_all, R, p, W, g_size_f):
    resid = jnp.zeros((), R.dtype)
    g = jnp.zeros((W, 6), R.dtype)
    Hd = jnp.zeros((W, 6, 6), R.dtype)
    H = jnp.zeros((6 * W, 6 * W), R.dtype)
    for bg in groups_all:
        r_, g_, Hd_, H_ = banded_cgh(bg, R, p, W)
        resid, g, Hd, H = resid + r_, g + g_, Hd + Hd_, H + H_
    Hq = H.reshape(W, 6, W, 6)
    Hq = add_block_diag(Hq, Hd, W)
    return resid / g_size_f, g.reshape(W * 6), Hq.reshape(6 * W, 6 * W)


@partial(jax.jit, static_argnums=(3,))
def _cgh_banded_compact_exec(groups_all, R, p, W, g_size_f):
    """Banded evaluation WITHOUT the dense (6W)² H: (resid, g (W,6),
    Hd (W,6,6), per-bucket grams, per-bucket straggler M).  The compile
    of the dense-H banded eval is what the tunnel's remote service
    rejects at W = 4096 (probe_w4096.py)."""
    from ..factors.plane_eigen import banded_cgh_compact

    resid = jnp.zeros((), R.dtype)
    g = jnp.zeros((W, 6), R.dtype)
    Hd = jnp.zeros((W, 6, 6), R.dtype)
    grams, wides = [], []
    for bg in groups_all:
        r_, g_, Hd_, gr, wM = banded_cgh_compact(bg, R, p, W)
        resid, g, Hd = resid + r_, g + g_, Hd + Hd_
        grams.append(gr)
        wides.append(wM)
    return resid / g_size_f, g, Hd, tuple(grams), tuple(wides)


@partial(jax.jit, static_argnums=(6,))
def _solve_banded_exec(grams, wides, Hd, g2, u, g_size_f, offsets):
    from .dist_solve import solve_damped_cg_banded

    dx, d = solve_damped_cg_banded(grams, wides, offsets, Hd, g2, u)
    q1 = 0.5 * jnp.dot(dx, u * d * dx - g2.reshape(-1)) / g_size_f
    return dx, q1


@partial(jax.jit, static_argnums=(4,))
def _solve_exec(H, g, u, g_size_f, solver):
    if solver == "cg":
        from .dist_solve import solve_damped_cg

        dx = solve_damped_cg(H, g, u, h_sharding=None, max_iters=96)
    else:
        dx = _solve_damped(H, g, u)
    d = jnp.diagonal(H)
    q1 = 0.5 * jnp.dot(dx, u * d * dx - g) / g_size_f
    return dx, q1


@jax.jit
def _step_exec(R, p, dx):
    return boxplus_pose(R, p, dx.reshape(R.shape[0], 6))


def lm_damping_iter_split(
    buckets: Sequence[PlaneFactorArrays],
    R0: jnp.ndarray,
    p0: jnp.ndarray,
    max_iters: int = 10,
    u_init: float = 0.01,
    v_init: float = 2.0,
    rel_tol: float = 1e-6,
    reduced_solver: str = "auto",
    hessian: str = "auto",
) -> LMResult:
    """Host-driven LM with the SAME Nielsen schedule / acceptance / AVG_THR
    semantics as the fused `lm_damping_iter` loop, but compiled as THREE
    small executables (factor evaluation, damped solve, pose step) with the
    trust-region bookkeeping on host.

    Exists because the tunnel's remote-compile service rejects very large
    single programs: the W >= 2048 banded LM jits the whole Nielsen loop +
    group scan + 96-trip CG as ONE executable and died with HTTP 500 twice
    in round 3 (BENCH_r03 w2048_error/w4096_error).  Splitting bounds each
    program's size; the price is ~2 scalar device->host fetches per
    iteration (~50 ms through the tunnel) — negligible against the
    100s-of-ms per-iteration compute at the Ws where this path is needed.
    Numerically it performs the identical update sequence (f32 rounding of
    the host-vs-device Nielsen scalars aside); equality-tested vs the fused
    loop in tests/test_lm_split.py.
    """
    W = R0.shape[0]
    solver = str(reduced_solver)
    if solver == "cg_mf":
        raise ValueError(
            "lm_damping_iter_split does not support reduced_solver='cg_mf'"
            " (use the fused lm_damping_iter for the rows path, or"
            " hessian='banded' here — the banded-compact solve never"
            " materializes the dense H either)"
        )
    if solver == "auto":
        solver = "cg" if 6 * W >= 1536 else "lu"

    use_banded = False
    if hessian in ("auto", "banded"):
        want = hessian == "banded"
        if want or W >= 1024:
            groups_all = []
            dense_cost = banded_cost = 0
            for fa in buckets:
                bg = build_banded_groups(fa, W, aligned=_banded_aligned())
                groups_all.append(bg)
                dense_cost += fa.n.shape[0] * W * W
                G, Vp, width = bg.fa.n.shape[:3]
                if not isinstance(bg, AlignedBandedGroups):
                    width = bg.inv.shape[-1]
                banded_cost += G * Vp * width * width
                banded_cost += bg.wide_fa.n.shape[0] * W * W
            use_banded = want or banded_cost * 4 <= dense_cost

    g_size = sum(int(fa.n.shape[0]) for fa in buckets)
    g_size_f = jnp.asarray(float(max(g_size, 1)), R0.dtype)

    if use_banded:
        # compact representation: the dense-H banded eval is the program
        # the remote-compile service rejects at W >= 4096 (probe_w4096.py)
        import numpy as np

        offsets = tuple(
            tuple(int(o) for o in np.asarray(bg.offset)) for bg in groups_all
        )

        def cgh(R, p):
            return _cgh_banded_compact_exec(
                tuple(groups_all), R, p, W, g_size_f)

        def solve(state, u):
            _, g2, Hd, grams, wides = state
            return _solve_banded_exec(
                grams, wides, Hd, g2, jnp.asarray(u, R0.dtype), g_size_f,
                offsets,
            )
    else:
        def cgh(R, p):
            return _cgh_dense_exec(tuple(buckets), R, p, W, g_size_f)

        def solve(state, u):
            _, g1, H = state
            return _solve_exec(H, g1, jnp.asarray(u, R0.dtype), g_size_f,
                               solver)

    R, p = R0, p0
    state = cgh(R, p)
    res1 = float(state[0])
    u, v = float(u_init), float(v_init)
    it = 0
    for _ in range(max_iters):
        dx, q1_d = solve(state, u)
        R_t, p_t = _step_exec(R, p, dx)
        state_t = cgh(R_t, p_t)
        res2, q1 = float(state_t[0]), float(q1_d)

        q = res1 - res2
        converged = abs(res1 - res2) / (abs(res1) if res1 != 0 else 1.0) \
            < rel_tol
        if q > 0:
            qr = q / (q1 if q1 != 0 else 1.0)
            u *= max(1.0 / 3.0, 1.0 - (2.0 * qr - 1.0) ** 3)
            v = 2.0
            R, p, state, res1 = R_t, p_t, state_t, res2
        else:
            u *= v
            v *= 2.0
        it += 1
        if converged:
            break
    return LMResult(
        R=R, p=p, iters=jnp.asarray(it, jnp.int32),
        residual=jnp.asarray(res1, R0.dtype),
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _lm_banded_jitted(groups_all, R0, p0, max_iters, u_init, v_init,
                      rel_tol, reduced_solver, g_size, mesh=None,
                      mesh_axis="factors"):
    """Banded-Hessian LM: identical Nielsen loop to _lm_jitted, but the
    normal equations assemble through block-banded Grams
    (plane_eigen.banded_cgh) — the large-W scaling path.  `g_size` comes
    from the ORIGINAL buckets so the AVG_THR residual normalization is
    identical to the dense path.  With `mesh`, each bucket's group stack
    shards over `mesh_axis` and the partials psum
    (parallel.shard.banded_cgh_sharded) — the distributed large-W path."""
    W = R0.shape[0]
    g_size_f = jnp.asarray(float(max(g_size, 1)), dtype=R0.dtype)
    solver = reduced_solver
    if mesh is not None:
        # lazy import: parallel.shard imports this module at load time
        from ..parallel.shard import banded_cgh_sharded

    def one_bucket(bg, R, p):
        if mesh is None:
            return banded_cgh(bg, R, p, W)
        return banded_cgh_sharded(bg, R, p, W, mesh, mesh_axis)

    def cgh(R, p):
        resid = jnp.zeros((), R0.dtype)
        g = jnp.zeros((W, 6), R0.dtype)
        Hd = jnp.zeros((W, 6, 6), R0.dtype)
        H = jnp.zeros((6 * W, 6 * W), R0.dtype)
        for bg in groups_all:
            r_, g_, Hd_, H_ = one_bucket(bg, R, p)
            resid, g, Hd, H = resid + r_, g + g_, Hd + Hd_, H + H_
        Hq = H.reshape(W, 6, W, 6)
        Hq = add_block_diag(Hq, Hd, W)
        return resid / g_size_f, g.reshape(W * 6), Hq.reshape(W * 6, W * 6)

    res1_0, g_0, H_0 = cgh(R0, p0)
    state = (
        R0, p0,
        jnp.asarray(u_init, R0.dtype), jnp.asarray(v_init, R0.dtype),
        res1_0, g_0, H_0,
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
    )

    def body_fn(_i, s):
        R, p, u, v, res1, g, H, it, done = s
        if solver == "cg":
            from .dist_solve import solve_damped_cg

            dx = solve_damped_cg(H, g, u, h_sharding=None, max_iters=96)
        else:
            dx = _solve_damped(H, g, u)
        dxp = dx.reshape(W, 6)
        R_t, p_t = boxplus_pose(R, p, dxp)
        d = jnp.diagonal(H)
        q1 = 0.5 * jnp.dot(dx, u * d * dx - g) / g_size_f
        res2, g_t, H_t = cgh(R_t, p_t)
        accept, u_new, v_new, converged = _nielsen_update(
            res1, res2, q1, u, v, rel_tol
        )
        # fused accept-select + done-freeze (one where pass over the
        # banded H, not two — see _lm_jitted)
        sel = lambda new, old: jnp.where(accept & ~done, new, old)
        frz = lambda new, old: jnp.where(done, old, new)
        return (
            sel(R_t, R), sel(p_t, p), frz(u_new, u), frz(v_new, v),
            sel(res2, res1), sel(g_t, g), sel(H_t, H),
            jnp.where(done, it, it + 1), done | converged,
        )

    R, p, u, v, res1, g, H, it, done = jax.lax.fori_loop(
        0, max_iters, body_fn, state
    )
    return LMResult(R=R, p=p, iters=it, residual=res1)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _lm_banded_compact_jitted(groups_all, R0, p0, max_iters, u_init,
                              v_init, rel_tol, g_size, mesh=None,
                              mesh_axis="factors"):
    """COMPACT banded LM: identical Nielsen loop to _lm_banded_jitted, but
    the linearization is carried as per-group Grams + diag extras — the
    dense (6W)² cross Hessian is never assembled (the compact form that
    unlocked W = 8192 single-chip, here inside a fused loop), and the
    damped solve applies them in the pair-window form
    (dist_solve.solve_damped_cg_banded_vec).  With `mesh`, the group
    stacks evaluate sharded (parallel.shard.banded_cgh_compact_sharded)
    and the Grams STAY sharded through the solve, whose G-contraction
    einsum GSPMD turns into the psum — the distributed large-W path with
    no (6W)² buffer on any device.  Group offsets must be pair-aligned
    (callers check host-side)."""
    from .dist_solve import solve_damped_cg_banded_vec
    from ..factors.plane_eigen import banded_cgh_compact

    if mesh is not None:
        from ..parallel.shard import banded_cgh_compact_sharded

    W = R0.shape[0]
    g_size_f = jnp.asarray(float(max(g_size, 1)), dtype=R0.dtype)
    offsets = tuple(bg.offset for bg in groups_all)

    def cgh(R, p):
        resid = jnp.zeros((), R0.dtype)
        g = jnp.zeros((W, 6), R0.dtype)
        Hd = jnp.zeros((W, 6, 6), R0.dtype)
        grams, wides = [], []
        for bg in groups_all:
            if mesh is None:
                r_, g_, Hd_, gr, wM = banded_cgh_compact(bg, R, p, W)
            else:
                r_, g_, Hd_, gr, wM = banded_cgh_compact_sharded(
                    bg, R, p, W, mesh, mesh_axis)
            resid, g, Hd = resid + r_, g + g_, Hd + Hd_
            grams.append(gr)
            wides.append(wM)
        return resid / g_size_f, g, Hd, tuple(grams), tuple(wides)

    res1_0, g_0, Hd_0, grams_0, wides_0 = cgh(R0, p0)
    state = (
        R0, p0,
        jnp.asarray(u_init, R0.dtype), jnp.asarray(v_init, R0.dtype),
        res1_0, g_0, Hd_0, grams_0, wides_0,
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_),
    )

    def body_fn(_i, s):
        R, p, u, v, res1, g, Hd, grams, wides, it, done = s
        dx, d = solve_damped_cg_banded_vec(grams, wides, offsets, Hd, g, u)
        dxp = dx.reshape(W, 6)
        R_t, p_t = boxplus_pose(R, p, dxp)
        q1 = 0.5 * jnp.dot(dx, u * d * dx - g.reshape(-1)) / g_size_f
        res2, g_t, Hd_t, grams_t, wides_t = cgh(R_t, p_t)
        accept, u_new, v_new, converged = _nielsen_update(
            res1, res2, q1, u, v, rel_tol
        )
        sel = lambda new, old: jnp.where(accept & ~done, new, old)
        grams_new = jax.tree_util.tree_map(sel, grams_t, grams)
        wides_new = jax.tree_util.tree_map(sel, wides_t, wides)
        frz = lambda new, old: jnp.where(done, old, new)
        return (
            sel(R_t, R), sel(p_t, p), frz(u_new, u), frz(v_new, v),
            sel(res2, res1), sel(g_t, g), sel(Hd_t, Hd),
            grams_new, wides_new,
            jnp.where(done, it, it + 1), done | converged,
        )

    out = jax.lax.fori_loop(0, max_iters, body_fn, state)
    R, p, u, v, res1 = out[:5]
    it = out[9]
    return LMResult(R=R, p=p, iters=it, residual=res1)


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _lm_rows_jitted(buckets, tables, R0, p0, max_iters, u_init, v_init,
                    rel_tol):
    """Matrix-free LM: same Nielsen damping / one-evaluation-per-iteration
    loop as the dense path, but the linearization is carried as COMPACT
    per-bucket factor rows (V, K, 18) + diag extras — the (6W)² Gram that
    dominates the dense factor evaluation at large W is never formed, and
    the damped system solves by matrix-free block-Jacobi PCG
    (solver/dist_solve.py:solve_damped_cg_rows)."""
    from .dist_solve import solve_damped_cg_rows

    W = R0.shape[0]
    g_size = sum(int(fa.n.shape[0]) for fa in buckets)
    g_size_f = jnp.asarray(float(max(g_size, 1)), dtype=R0.dtype)
    frames = tuple(fa.frame for fa in buckets)

    def eval_rows(R, p):
        resid = jnp.zeros((), R0.dtype)
        g = jnp.zeros((W, 6), R0.dtype)
        Hd = jnp.zeros((W, 6, 6), R0.dtype)
        rows = []
        for fa, tbl in zip(buckets, tables):
            r_, g_, Hd_, rows_ = plane_cost_grad_rows(fa, R, p, W, tbl)
            resid, g, Hd = resid + r_, g + g_, Hd + Hd_
            rows.append(rows_)
        return resid / g_size_f, g, Hd, tuple(rows)

    res1_0, g_0, Hd_0, rows_0 = eval_rows(R0, p0)

    state = (
        R0,
        p0,
        jnp.asarray(u_init, R0.dtype),
        jnp.asarray(v_init, R0.dtype),
        res1_0,
        g_0,
        Hd_0,
        rows_0,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.bool_),
    )

    def body_fn(_i, s):
        R, p, u, v, res1, g, Hd, rows, it, done = s
        dx, d = solve_damped_cg_rows(rows, frames, tables, Hd, g, u)
        dxp = dx.reshape(W, 6)
        R_t, p_t = boxplus_pose(R, p, dxp)
        q1 = 0.5 * jnp.dot(dx, u * d * dx - g.reshape(-1)) / g_size_f

        # ONE factor evaluation per iteration, at the TRIAL point (see the
        # dense body above for why this beats is_calc_hess and lax.cond)
        res2, g_t, Hd_t, rows_t = eval_rows(R_t, p_t)
        accept, u_new, v_new, converged = _nielsen_update(
            res1, res2, q1, u, v, rel_tol
        )

        sel = lambda new, old: jnp.where(accept & ~done, new, old)
        rows_new = jax.tree_util.tree_map(sel, rows_t, rows)
        R_new = sel(R_t, R)
        p_new = sel(p_t, p)
        g_new = sel(g_t, g)
        Hd_new = sel(Hd_t, Hd)
        res1_new = sel(res2, res1)

        frz = lambda new, old: jnp.where(done, old, new)
        return (
            R_new,
            p_new,
            frz(u_new, u),
            frz(v_new, v),
            res1_new,
            g_new,
            Hd_new,
            rows_new,
            jnp.where(done, it, it + 1),
            done | converged,
        )

    R, p, u, v, res1, g, Hd, rows, it, done = jax.lax.fori_loop(
        0, max_iters, body_fn, state
    )
    return LMResult(R=R, p=p, iters=it, residual=res1)
