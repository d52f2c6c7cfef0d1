"""Large-W convergence probe (VERDICT r4 item 3): drive the compact
banded split LM at W=4096/8192 to the full 10-iter/1e-6 budget on chip
and record per-iteration time AND the converged ATE — round-4 artifacts
stopped at 3 iterations (ATE 0.0102), leaving convergence at scale
unproven.  Also the first chip A/B of the pair-window vectorized banded
solve (dist_solve.solve_damped_cg_banded_vec) vs round 4's unrolled
static-slice numbers (550-767 / 994-1215 ms/iter).

Usage: python scripts/probe_wlarge_converge.py [W ...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def run(W: int, ppf: int, max_iters: int = 10):
    import jax

    if os.environ.get("LVBA_PROBE_F64", "0") == "1":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    dtype = jnp.float64 if os.environ.get(
        "LVBA_PROBE_F64", "0") == "1" else jnp.float32
    max_iters = int(os.environ.get("LVBA_PROBE_ITERS", str(max_iters)))

    from global_lvba_tpu.factors.padding import buckets_to_device
    from global_lvba_tpu.map.voxelize import build_voxel_map
    from global_lvba_tpu.models.synthetic import (
        ate_rmse, make_corridor_scene, perturb_poses,
    )
    from global_lvba_tpu.solver.lm import lm_damping_iter_split

    t0 = time.perf_counter()
    scene = make_corridor_scene(num_frames=W, points_per_frame=ppf, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=dtype)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=1)
    R = jax.device_put(jnp.asarray(Rp, dtype))
    p = jax.device_put(jnp.asarray(pp, dtype))
    print(f"[W={W}] setup {time.perf_counter() - t0:.1f}s "
          f"pts={scene.points_body.shape[0]}", flush=True)

    # warm (compiles the three split executables)
    t0 = time.perf_counter()
    res = lm_damping_iter_split(buckets, R, p, max_iters=1)
    np.asarray(res.R)
    print(f"[W={W}] warm+compile {time.perf_counter() - t0:.1f}s", flush=True)

    # timed short run (per-iteration figure, round-4-comparable: 3 iters)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        res3 = lm_damping_iter_split(buckets, R, p, max_iters=3)
        np.asarray(res3.R)
        ts.append(time.perf_counter() - t0)
    ms_iter = min(ts) / 3 * 1e3
    ate3 = ate_rmse(np.asarray(res3.p, np.float64), scene.p_true)

    # FULL budget: 10 outer iters / rel_tol 1e-6 (the reference's budget,
    # bavoxel.hpp:686,760)
    t0 = time.perf_counter()
    resc = lm_damping_iter_split(buckets, R, p, max_iters=max_iters)
    np.asarray(resc.R)
    dt_full = time.perf_counter() - t0
    ate0 = ate_rmse(pp, scene.p_true)
    atec = ate_rmse(np.asarray(resc.p, np.float64), scene.p_true)
    print(
        f"[W={W}] ms/iter={ms_iter:.1f}  ATE {ate0:.5f} -> {ate3:.5f} (3it)"
        f" -> {atec:.6f} ({int(resc.iters)}it, {dt_full:.1f}s full,"
        f" residual={float(resc.residual):.4g})",
        flush=True,
    )
    return dict(W=W, ms_per_iter=round(ms_iter, 1), ate0=round(ate0, 5),
                ate_3it=round(ate3, 5), ate_converged=round(atec, 6),
                iters=int(resc.iters), full_s=round(dt_full, 1))


if __name__ == "__main__":
    ws = [int(a) for a in sys.argv[1:]] or [4096, 8192]
    out = []
    for W in ws:
        ppf = 700 if W >= 8192 else 1000
        out.append(run(W, ppf))
    import json

    print(json.dumps(out))
