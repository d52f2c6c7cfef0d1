"""On-chip A/B: frame-aligned dense layout vs bucketed one-hot layout at
the representative W=512 scene (eval ms, LM ms/iter, ATE gate)."""

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
from global_lvba_tpu.models.synthetic import ate_rmse, make_plane_scene, perturb_poses
from global_lvba_tpu.factors.padding import buckets_to_device
from global_lvba_tpu.solver.lm import _total_cgh, lm_damping_iter
from global_lvba_tpu.solver.lm import _lm_jitted


def eval_ms(buckets, R, p, W, reps=6):
    @jax.jit
    def eval_loop(R_, p_):
        def body(_i, carry):
            Rc, pc, acc = carry
            r, g, H = _total_cgh(buckets, Rc, pc, W)
            s = r + 1e-30 * (jnp.sum(jnp.abs(g)) + jnp.sum(jnp.abs(H)))
            eps = s * jnp.asarray(1e-30, Rc.dtype)
            return (Rc + eps, pc + eps, acc + s)

        _, _, acc = jax.lax.fori_loop(0, reps, body,
                                      (R_, p_, jnp.zeros((), R_.dtype)))
        return acc

    fn1 = jax.jit(lambda R_, p_: _total_cgh(buckets, R_, p_, W))
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
    return min(ts) / reps * 1e3, flops


def lm_ms(buckets, R, p, iters=4):
    _lm_jitted.clear_cache()
    res = lm_damping_iter(buckets, R, p, max_iters=iters)
    np.asarray(res.R)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = lm_damping_iter(buckets, R, p, max_iters=iters)
        np.asarray(res.R)
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1e3


def main():
    W = int(os.environ.get("PROF_W", "512"))
    scene = make_plane_scene(num_frames=W, points_per_frame=2000, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=1)
    R = jax.device_put(jnp.asarray(Rp, jnp.float32))
    p = jax.device_put(jnp.asarray(pp, jnp.float32))
    out = {"W": W}
    peak = float(os.environ.get("LVBA_PEAK_TFLOPS", "197"))

    for name, kw in (("bucketed", {"layout": "bucketed"}),
                     ("aligned", {"layout": "aligned"})):
        buckets = buckets_to_device(vm, dtype=jnp.float32, W=W, **kw)
        out[f"{name}_shapes"] = [list(fa.n.shape) for fa in buckets]
        ms, flops = eval_ms(buckets, R, p, W)
        out[f"eval_ms_{name}"] = round(ms, 2)
        out[f"eval_gflop_{name}"] = round(flops / 1e9, 1)
        out[f"mfu_counted_{name}"] = round(
            100.0 * flops / (ms / 1e3) / 1e12 / peak, 2)
        print(json.dumps(out), flush=True)
        out[f"lm_ms_{name}"] = round(lm_ms(buckets, R, p), 2)
        res = lm_damping_iter(buckets, R, p, max_iters=10)
        out[f"lm_ate_{name}"] = round(
            float(ate_rmse(np.asarray(res.p, np.float64), scene.p_true)), 6)
        print(json.dumps(out), flush=True)

    # series-definition logical MFU (round-2/3 numerator: one-hot f32 graph)
    lg = 258465120256.0 / 1e9
    out["mfu_logical_aligned"] = round(
        lg / out["eval_ms_aligned"] / peak / 1e-3 / 10, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
