"""Bisect the W=4096 remote-compile failure: compile each split-LM
executable separately (banded eval, damped CG solve, pose step) and
report which one the tunnel's compile service rejects.  On success,
time one eval + one solve."""

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

from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_corridor_scene, perturb_poses
from global_lvba_tpu.factors.padding import buckets_to_device
from global_lvba_tpu.factors.plane_eigen import build_banded_groups
from global_lvba_tpu.solver.lm import (
    _cgh_banded_exec, _cgh_dense_exec, _solve_exec, _step_exec,
)


def main():
    W = int(os.environ.get("PROBE_W", "4096"))
    out = {"W": W}
    scene = make_corridor_scene(num_frames=W, points_per_frame=1000, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float32)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=1)
    R = jax.device_put(jnp.asarray(Rp, jnp.float32))
    p = jax.device_put(jnp.asarray(pp, jnp.float32))
    groups = tuple(build_banded_groups(fa, W) for fa in buckets)
    out["n_buckets"] = len(buckets)
    out["groups"] = [
        [int(x) for x in (bg.fa.n.shape[0], bg.fa.n.shape[1],
                          bg.inv.shape[-1], bg.wide_fa.n.shape[0])]
        for bg in groups
    ]
    print(json.dumps(out), flush=True)
    g_size = sum(int(fa.n.shape[0]) for fa in buckets)
    g_size_f = jnp.asarray(float(max(g_size, 1)), jnp.float32)

    try:
        t0 = time.perf_counter()
        r, g, H = _cgh_banded_exec(groups, R, p, W, g_size_f)
        np.asarray(r)
        out["eval_compile_run_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        r, g, H = _cgh_banded_exec(groups, R, p, W, g_size_f)
        np.asarray(r)
        out["eval_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    except Exception as e:
        out["eval_error"] = str(e)[:200]
        print(json.dumps(out), flush=True)
        return
    print(json.dumps(out), flush=True)

    try:
        t0 = time.perf_counter()
        dx, q1 = _solve_exec(H, g, jnp.asarray(0.01, jnp.float32),
                             g_size_f, "cg")
        np.asarray(q1)
        out["solve_compile_run_s"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        dx, q1 = _solve_exec(H, g, jnp.asarray(0.01, jnp.float32),
                             g_size_f, "cg")
        np.asarray(q1)
        out["solve_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    except Exception as e:
        out["solve_error"] = str(e)[:200]
    print(json.dumps(out), flush=True)

    try:
        Rt, pt = _step_exec(R, p, dx)
        np.asarray(pt)
        out["step_ok"] = True
    except Exception as e:
        out["step_error"] = str(e)[:200]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
