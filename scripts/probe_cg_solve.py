"""Decompose the W=512 damped block-Jacobi CG solve (solver/dist_solve.
solve_damped_cg): preamble (diagonal extraction + block-Jacobi inverses)
vs the fixed-trip CG loop, and the trips sweep 24/48/96.

The H operand is the real assembled Hessian from the aligned W=512
evaluation.  Run ALONE (one TPU client at a time)."""

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
from global_lvba_tpu.factors.plane_eigen import plane_cost_grad_hess
from global_lvba_tpu.solver import dist_solve as ds


def timed(fn, *args, reps=6):
    @jax.jit
    def loop(*a):
        def body(_i, carry):
            args_c, acc = carry
            s = fn(*args_c)
            eps = s * jnp.asarray(1e-30, jnp.float32)
            return (tuple(x + eps for x in args_c), acc + s)

        args_f, acc = jax.lax.fori_loop(
            0, reps, body, (args, jnp.zeros((), jnp.float32)))
        return acc

    np.asarray(loop(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps * 1e3


def main():
    W = int(os.environ.get("PROF_W", "512"))
    scene = make_plane_scene(num_frames=W, points_per_frame=2000, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    [fa] = buckets_to_device(vm, dtype=jnp.float32, W=W, layout="aligned")
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=1)
    R = jax.device_put(jnp.asarray(Rp, jnp.float32))
    p = jax.device_put(jnp.asarray(pp, jnp.float32))
    _, g, H = jax.jit(
        lambda R_, p_: plane_cost_grad_hess(fa, R_, p_, W))(R, p)
    H = jax.device_put(np.asarray(H).reshape(6 * W, 6 * W))
    g = jax.device_put(np.asarray(g).reshape(6 * W))
    u = jnp.asarray(0.01, jnp.float32)
    out = {"W": W}

    def live(x):
        return 1e-30 * jnp.sum(jnp.abs(x))

    def diag_np(H_, g_, u_):
        return live(jnp.diagonal(H_)) + live(g_) + u_ * 0.0

    def diag_masked(H_, g_, u_):
        n = H_.shape[0]
        eye = (jnp.arange(n)[:, None] == jnp.arange(n)[None, :]).astype(
            H_.dtype)
        return live(jnp.sum(H_ * eye, axis=1)) + live(g_) + u_ * 0.0

    def preamble(H_, g_, u_):
        with jax.default_matmul_precision("highest"):
            d = jnp.diagonal(H_)
            eps = 1e-12 * (1.0 + jnp.max(jnp.abs(d)))
            Minv = ds._block_jacobi_inv_damped(H_, u_ * d + eps, 6)
        return live(Minv) + live(g_)

    def solve_n(n_trips):
        def f(H_, g_, u_):
            return live(ds.solve_damped_cg(H_, g_, u_, max_iters=n_trips))
        return f

    out["ms_diagonal"] = round(timed(diag_np, H, g, u), 3)
    print(json.dumps(out), flush=True)
    out["ms_diag_masked"] = round(timed(diag_masked, H, g, u), 3)
    print(json.dumps(out), flush=True)
    out["ms_preamble"] = round(timed(preamble, H, g, u), 3)
    print(json.dumps(out), flush=True)
    for n in (0, 24, 48, 96):
        out[f"ms_cg_{n}"] = round(timed(solve_n(n), H, g, u), 2)
        print(json.dumps(out), flush=True)

    # solution quality at each trip budget (drives the default)
    ref = np.asarray(ds.solve_damped_cg(H, g, u, max_iters=256),
                     np.float64)
    for n in (24, 48, 96):
        x = np.asarray(ds.solve_damped_cg(H, g, u, max_iters=n), np.float64)
        out[f"relerr_{n}"] = float(
            np.linalg.norm(x - ref) / (np.linalg.norm(ref) + 1e-300))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
