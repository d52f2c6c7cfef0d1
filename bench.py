"""Benchmark: LiDAR plane-eigen BA iteration throughput on the default
backend (TPU when available).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

metric: damped-LM iterations/sec on a standard synthetic global-BA
workload (W=50 keyframes, ~150k points, planar voxel map at 1 m), measured
as complete 10-iteration jitted solves (fused Hessian+gradient evaluation,
damped solve, pose update, trial residual per iteration) over distinct
pose initializations — the production call shape.  Synchronization is a
device->host fetch (block_until_ready is not a reliable barrier through
remote-device transports).

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
    from global_lvba_tpu.solver.lm import lm_damping_iter

    W = 50
    LM_ITERS = 10
    scene = make_plane_scene(num_frames=W, points_per_frame=3000, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float32)

    inits = []
    for s in range(1, 7):
        Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.005, 0.02, seed=s)
        inits.append(
            (
                jax.device_put(jnp.asarray(Rp, jnp.float32)),
                jax.device_put(jnp.asarray(pp, jnp.float32)),
            )
        )

    def solve(R, p):
        res = lm_damping_iter(buckets, R, p, max_iters=LM_ITERS)
        # device->host fetch as the synchronization barrier
        np.asarray(res.R)
        return res

    solve(*inits[0])  # compile + warm up

    t0 = time.perf_counter()
    n_solves = 0
    for R, p in inits[1:]:
        solve(R, p)
        n_solves += 1
    dt = time.perf_counter() - t0
    tpu_ips = n_solves * LM_ITERS / dt

    # numpy single-thread baseline: one factor evaluation (the per-iteration
    # dominant cost) of the same problem
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
