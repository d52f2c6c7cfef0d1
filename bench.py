"""Benchmark: LiDAR plane-eigen BA iteration throughput on the default
backend (TPU when available).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

metric: full damped-LM iterations/sec (Hessian+gradient evaluation, damped
solve, pose update, trial residual) on a standard synthetic global-BA
workload (W=50 keyframes, ~150k points, planar voxel map at 1 m).

vs_baseline: ratio against the same per-iteration factor evaluation done by
a single-threaded numpy loop (the reference's CPU path analogue — the
upstream repo publishes no numbers, see BASELINE.md / SURVEY.md §6).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from global_lvba_tpu.map.voxelize import build_voxel_map
    from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses
    from global_lvba_tpu.factors.padding import buckets_to_device
    from global_lvba_tpu.factors.plane_eigen import plane_cost_grad_hess, plane_cost
    from global_lvba_tpu.solver.lm import _solve_damped
    from global_lvba_tpu.geometry.se3 import boxplus_pose

    W = 50
    scene = make_plane_scene(num_frames=W, points_per_frame=3000, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float32)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.005, 0.02)
    R = jnp.asarray(Rp, jnp.float32)
    p = jnp.asarray(pp, jnp.float32)

    @jax.jit
    def lm_iter(R, p, u):
        resid = jnp.zeros((), R.dtype)
        g = jnp.zeros((W, 6), R.dtype)
        H = jnp.zeros((W, 6, W, 6), R.dtype)
        for fa in buckets:
            r_, g_, H_ = plane_cost_grad_hess(fa, R, p, W)
            resid, g, H = resid + r_, g + g_, H + H_
        dx = _solve_damped(H.reshape(W * 6, W * 6), g.reshape(W * 6), u)
        R2, p2 = boxplus_pose(R, p, dx.reshape(W, 6))
        r2 = jnp.zeros((), R.dtype)
        for fa in buckets:
            r2 = r2 + plane_cost(fa, R2, p2)
        return R2, p2, resid, r2

    # warm up (compile)
    out = lm_iter(R, p, jnp.float32(0.01))
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = lm_iter(R, p, jnp.float32(0.01))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    tpu_ips = iters / dt

    # numpy single-thread baseline: one factor evaluation (the per-iteration
    # dominant cost), extrapolated to a full iteration (eval + cheap solve)
    from global_lvba_tpu.eval.baseline_cpu import numpy_plane_cost_grad_hess

    t0 = time.perf_counter()
    for b in vm.buckets:
        numpy_plane_cost_grad_hess(
            b.n, b.mu, b.Pc, b.frame, scene.R_true, scene.p_true, W
        )
    base_dt = time.perf_counter() - t0
    base_ips = 1.0 / base_dt

    result = {
        "metric": "lidar_ba_lm_iters_per_sec_W50",
        "value": round(tpu_ips, 3),
        "unit": "iters/s",
        "vs_baseline": round(tpu_ips / base_ips, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
