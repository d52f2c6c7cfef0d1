"""Profile the W=512 factor evaluation variants on the real chip.

Compares, per evaluation (chained on-device loop, min-of-N):
  * one-hot frame expansion vs the (V, W, 60) slot-table gather vs the
    GatherPlan path (frame-major g/Hd + (3V, 6W) Gram operand)
  * XLA full Gram vs the Pallas lower-triangle SYRK
  * Gram matmul precision (HIGHEST vs HIGH), ATE-gated
  * full LM iteration time under one-hot vs GatherPlan
Prints one JSON line per variant.  Run ALONE (one TPU client at a time).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses
from global_lvba_tpu.factors.padding import buckets_to_device
from global_lvba_tpu.factors.plane_eigen import (
    build_gather_plan,
    frame_slot_table,
)
from global_lvba_tpu.solver.lm import _total_cgh, lm_damping_iter


def chained_eval_ms(buckets, invs, R, p, W, reps=6):
    @jax.jit
    def eval_loop(R_, p_):
        def body(_i, carry):
            Rc, pc, acc = carry
            r, g, H = _total_cgh(buckets, Rc, pc, W, invs=invs)
            s = r + 1e-30 * (jnp.sum(jnp.abs(g)) + jnp.sum(jnp.abs(H)))
            eps = s * jnp.asarray(1e-30, Rc.dtype)
            return (Rc + eps, pc + eps, acc + s)

        _, _, acc = jax.lax.fori_loop(0, reps, body, (R_, p_, jnp.zeros((), R_.dtype)))
        return acc

    fn1 = jax.jit(lambda R_, p_: _total_cgh(buckets, R_, p_, W, invs=invs))
    ca = fn1.lower(R, p).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    np.asarray(eval_loop(R, p))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(eval_loop(R, p))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / reps
    return dt * 1e3, flops


def stage_probe(buckets, R, p, W, out, reps=6):
    """Cumulative stage timings of the one-hot evaluation: where do the
    ~29 ms go?  Stages (each keeps all its outputs live via sum(abs)):
      soa    — _soa_core only (eigh3 + per-entry chain, pure VPU)
      ghd    — + one-hot g/Hd reductions
      m      — + one-hot M expansion (V, W, 3, 6)
      gram   — + the MᵀM Gram dot (full eval minus the Hd scatter)
    Differences between consecutive lines = per-region cost."""
    import jax
    from global_lvba_tpu.factors import plane_eigen as pe

    hi = jax.lax.Precision.HIGHEST

    def eval_stage(stage, R_, p_):
        acc = jnp.zeros((), R_.dtype)
        for fa in buckets:
            V, K = fa.n.shape
            resid, jjt6, D36, rows18 = pe._soa_core(fa, R_, p_, W)
            acc = acc + resid
            if stage == "soa":
                acc = acc + 1e-30 * (
                    jnp.sum(jnp.abs(jjt6)) + jnp.sum(jnp.abs(D36))
                    + jnp.sum(jnp.abs(rows18))
                )
                continue
            onehot = (
                fa.frame[..., None] == jnp.arange(W, dtype=fa.frame.dtype)
            ).astype(fa.n.dtype)
            oh_flat = onehot.reshape(V * K, W)
            g = jax.lax.dot_general(
                oh_flat, jjt6.reshape(V * K, 6),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=fa.n.dtype, precision=hi,
            )
            Hd = jax.lax.dot_general(
                oh_flat, D36.reshape(V * K, 36),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=fa.n.dtype, precision=hi,
            )
            acc = acc + 1e-30 * (jnp.sum(jnp.abs(g)) + jnp.sum(jnp.abs(Hd)))
            if stage == "ghd":
                acc = acc + 1e-30 * jnp.sum(jnp.abs(rows18))
                continue
            M = jax.lax.dot_general(
                onehot, rows18,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=fa.n.dtype, precision=hi,
            ).reshape(V, W, 3, 6)
            if stage == "m":
                acc = acc + 1e-30 * jnp.sum(jnp.abs(M))
                continue
            Hq = jax.lax.dot_general(
                M, M, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
                preferred_element_type=M.dtype, precision=hi,
            )
            acc = acc + 1e-30 * jnp.sum(jnp.abs(Hq))
        return acc

    for stage in ("soa", "ghd", "m", "gram"):
        @jax.jit
        def loop(R_, p_, stage=stage):
            def body(_i, carry):
                Rc, pc, acc = carry
                s = eval_stage(stage, Rc, pc)
                eps = s * jnp.asarray(1e-30, Rc.dtype)
                return (Rc + eps, pc + eps, acc + s)

            _, _, acc = jax.lax.fori_loop(
                0, reps, body, (R, p, jnp.zeros((), R.dtype))
            )
            return acc

        np.asarray(loop(R, p))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(R, p))
            ts.append(time.perf_counter() - t0)
        out[f"stage_ms_{stage}"] = round(min(ts) / reps * 1e3, 2)
        print(json.dumps(out), flush=True)


def kernel_only_ms(buckets, R, p, out=None, reps=6):
    """Device time of the fused SoA kernels ALONE (no frame expansion, no
    Gram) — the floor the kernel sets against the stage_ms_soa XLA line."""
    from global_lvba_tpu.ops.pallas.soa_fused import soa_fused_channels

    if out is None:
        out = {}

    @jax.jit
    def loop(R_, p_):
        def body(_i, carry):
            Rc, pc, acc = carry
            s = jnp.zeros((), Rc.dtype)
            for fa in buckets:
                residv, rowsC, jjtC, d36C = soa_fused_channels(
                    fa, Rc[fa.frame], pc[fa.frame]
                )
                s = s + jnp.sum(residv) + 1e-30 * (
                    jnp.sum(jnp.abs(rowsC)) + jnp.sum(jnp.abs(jjtC))
                    + jnp.sum(jnp.abs(d36C))
                )
            eps = s * jnp.asarray(1e-30, Rc.dtype)
            return (Rc + eps, pc + eps, acc + s)

        _, _, acc = jax.lax.fori_loop(
            0, reps, body, (R_, p_, jnp.zeros((), R_.dtype)))
        return acc

    np.asarray(loop(R, p))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(R, p))
        ts.append(time.perf_counter() - t0)
    out["soa_kernel_only_ms"] = round(min(ts) / reps * 1e3, 2)
    print(json.dumps(out), flush=True)


def lm_ms_per_iter(buckets, R, p, gather, iters=4):
    res = lm_damping_iter(buckets, R, p, max_iters=iters, gather_tables=gather)
    np.asarray(res.R)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = lm_damping_iter(buckets, R, p, max_iters=iters,
                              gather_tables=gather)
        np.asarray(res.R)
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3, float(res.residual)


def _clear_lm_cache():
    from global_lvba_tpu.solver.lm import _lm_jitted

    _lm_jitted.clear_cache()


def main():
    W = int(os.environ.get("PROF_W", "512"))
    scene = make_plane_scene(num_frames=W, points_per_frame=2000, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float32, layout="bucketed")
    aligned = buckets_to_device(vm, dtype=jnp.float32, W=W, layout="aligned")
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=1)
    R = jax.device_put(jnp.asarray(Rp, jnp.float32))
    p = jax.device_put(jnp.asarray(pp, jnp.float32))
    invs60 = tuple(frame_slot_table(fa, W) for fa in buckets)
    plans = tuple(build_gather_plan(fa, W) for fa in buckets)

    peak = float(os.environ.get("LVBA_PEAK_TFLOPS", "197"))
    out = {"W": W}

    # production layout first (round 5 default at this density/width)
    def eval_aligned():
        ms, flops = chained_eval_ms(aligned, None, R, p, W)
        out["eval_ms_aligned"] = round(ms, 2)
        out["mfu_pct_aligned"] = round(
            100.0 * flops / (ms / 1e3) / 1e12 / peak, 2)
        out["eval_gflop_aligned"] = round(flops / 1e9, 1)
        print(json.dumps(out), flush=True)

    eval_aligned()

    def eval_variant(name, iv, env=None):
        env = env or {}
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            ms, flops = chained_eval_ms(buckets, iv, R, p, W)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        out[f"eval_ms_{name}"] = round(ms, 2)
        out[f"mfu_pct_{name}"] = round(100.0 * flops / (ms / 1e3) / 1e12 / peak, 2)
        out[f"eval_gflop_{name}"] = round(flops / 1e9, 1)
        print(json.dumps(out), flush=True)

    # round-4 default: exact bf16-split selection dots + MXU pose
    # expansion + Gram HIGH (measured winners; see STATUS.md)
    eval_variant("default", None)
    eval_variant("exact0", None, env={"LVBA_EXACT_DOTS": "0"})
    eval_variant("exact0_gramhighest", None, env={
        "LVBA_EXACT_DOTS": "0", "LVBA_GRAM_PRECISION": "highest"})
    eval_variant("gram_highest", None, env={
        "LVBA_GRAM_PRECISION": "highest"})
    eval_variant("selkernel", None, env={"LVBA_SEL_KERNEL": "1"})
    eval_variant("soa", None, env={"LVBA_SOA_KERNEL": "pallas"})
    stage_probe(buckets, R, p, W, out)
    kernel_only_ms(buckets, R, p, out)
    eval_variant("gather60", invs60)
    eval_variant("plan", plans)
    eval_variant("plan_syrk", plans, env={"LVBA_GRAM_KERNEL": "pallas"})

    from global_lvba_tpu.models.synthetic import ate_rmse

    for name, bks, gather, env in (
        ("aligned", aligned, False, {}),
        ("default", buckets, False, {}),
        ("exact0", buckets, False, {"LVBA_EXACT_DOTS": "0"}),
        ("selkernel", buckets, False, {"LVBA_SEL_KERNEL": "1"}),
        ("plan", buckets, True, {}),
    ):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            _clear_lm_cache()
            ms, resid = lm_ms_per_iter(bks, R, p, gather)
            res_ate = lm_damping_iter(bks, R, p, max_iters=10,
                                      gather_tables=gather)
            ate = ate_rmse(np.asarray(res_ate.p, np.float64), scene.p_true)
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None) if v is None else os.environ.update(
                    {k: v})
        out[f"lm_ms_per_iter_{name}"] = round(ms, 2)
        out[f"lm_resid_{name}"] = resid
        out[f"lm_ate_{name}"] = round(float(ate), 6)
        print(json.dumps(out), flush=True)

    # block-banded Gram at W=512 (auto engages only at >= 4x flop savings;
    # measure it unconditionally so the crossover policy rests on numbers)
    try:
        _clear_lm_cache()
        res_b = lm_damping_iter(buckets, R, p, max_iters=4, hessian="banded")
        np.asarray(res_b.R)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res_b = lm_damping_iter(buckets, R, p, max_iters=4,
                                    hessian="banded")
            np.asarray(res_b.R)
            ts.append(time.perf_counter() - t0)
        out["lm_ms_per_iter_banded"] = round(min(ts) / 4 * 1e3, 2)
        out["lm_resid_banded"] = float(res_b.residual)
    except Exception as e:
        out["banded_error"] = str(e)[:120]
    print(json.dumps(out), flush=True)

    # Gram-precision x kernel sweep on the plan path (after the one-hot
    # removal the Gram dominates; HIGH = 3 bf16 passes instead of 6).  The
    # final ATE is the accuracy gate — HIGHEST's value is the reference.
    from global_lvba_tpu.models.synthetic import ate_rmse

    for kern in ("xla", "pallas"):
        for prec in ("highest", "high"):
            os.environ["LVBA_GRAM_PRECISION"] = prec
            os.environ["LVBA_GRAM_KERNEL"] = kern
            # env knobs are read at TRACE time — drop cached executables
            _clear_lm_cache()
            ms, flops = chained_eval_ms(buckets, plans, R, p, W)
            t0 = time.perf_counter()
            resf = lm_damping_iter(buckets, R, p, max_iters=4,
                                   gather_tables=True)
            np.asarray(resf.R)
            lm_ms = (time.perf_counter() - t0) / 4 * 1e3
            tag = f"{kern}_{prec}"
            out[f"eval_ms_gram_{tag}"] = round(ms, 2)
            out[f"mfu_pct_gram_{tag}"] = round(
                100.0 * flops / (ms / 1e3) / 1e12 / peak, 2)
            out[f"lm_ms_gram_{tag}"] = round(lm_ms, 2)
            out[f"ate_gram_{tag}"] = round(
                ate_rmse(np.asarray(resf.p, np.float64), scene.p_true), 6)
            print(json.dumps(out), flush=True)
    os.environ["LVBA_GRAM_PRECISION"] = "highest"
    os.environ.pop("LVBA_GRAM_KERNEL", None)


if __name__ == "__main__":
    main()
