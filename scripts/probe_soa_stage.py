"""Decompose the W=512 `stage_ms_soa` cost (the pre-expansion SoA region:
pose expansion + per-entry linearization chain) into its parts on chip.

Lines printed (cumulative JSON, min-of-3 chained-loop ms):
  pose_only    — _pose_channels alone (the exact-selection MXU expansion)
  agg          — + _soa_agg (aggregation/covariance)
  eig          — + _soa_eig (tiny (V,) closed-form eigh3)
  chain        — + _soa_chain (= the full stage_ms_soa region)
  chain_pregathered — chain with poses ALREADY in channel planes
                 (isolates the chain itself from the selection)
  chain48      — chain emitting only the 48 UNIQUE channels (rows18 +
                 jjt6 + 24 unique D entries) instead of 60
Run ALONE (one TPU client at a time).
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
from global_lvba_tpu.factors import plane_eigen as pe


def timed(fn, R, p, reps=6):
    @jax.jit
    def loop(R_, p_):
        def body(_i, carry):
            Rc, pc, acc = carry
            s = fn(Rc, pc)
            eps = s * jnp.asarray(1e-30, Rc.dtype)
            return (Rc + eps, pc + eps, acc + s)

        _, _, acc = jax.lax.fori_loop(0, reps, body,
                                      (R_, p_, jnp.zeros((), R_.dtype)))
        return acc

    np.asarray(loop(R, p))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(R, p))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps * 1e3


def live(*xs):
    acc = jnp.zeros((), jnp.float32)
    for x in xs:
        if isinstance(x, tuple):
            acc = acc + live(*x)
        else:
            acc = acc + 1e-30 * jnp.sum(jnp.abs(x))
    return acc


def main():
    W = int(os.environ.get("PROF_W", "512"))
    scene = make_plane_scene(num_frames=W, points_per_frame=2000, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float32)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=1)
    R = jax.device_put(jnp.asarray(Rp, jnp.float32))
    p = jax.device_put(jnp.asarray(pp, jnp.float32))
    out = {"W": W, "entries": sum(int(np.prod(fa.n.shape)) for fa in buckets),
           "buckets": [list(fa.n.shape) for fa in buckets]}

    def pose_only(R_, p_):
        acc = jnp.zeros((), jnp.float32)
        for fa in buckets:
            R9, p3 = pe._pose_channels(fa, R_, p_)
            acc = acc + live(R9, p3)
        return acc

    def agg(R_, p_):
        acc = jnp.zeros((), jnp.float32)
        for fa in buckets:
            mu3, P6 = pe._moment_channels(fa)
            R9, p3 = pe._pose_channels(fa, R_, p_)
            parts = pe._soa_agg(fa.n, mu3, P6, R9, p3)
            acc = acc + live(*[x for x in parts])
        return acc

    def eig(R_, p_):
        acc = jnp.zeros((), jnp.float32)
        for fa in buckets:
            mu3, P6 = pe._moment_channels(fa)
            R9, p3 = pe._pose_channels(fa, R_, p_)
            mask, n, N, invN, vb, Rm, RP, cov6 = pe._soa_agg(
                fa.n, mu3, P6, R9, p3)
            residv, u, B1, B2 = pe._soa_eig(cov6, N)
            acc = acc + jnp.sum(residv) + live(u, B1, B2, vb, Rm, RP)
        return acc

    def chain(R_, p_):
        acc = jnp.zeros((), jnp.float32)
        for fa in buckets:
            r, jjt6, D36, rows18 = pe._soa_core(fa, R_, p_, W)
            acc = acc + r + live(jjt6, D36, rows18)
        return acc

    # chain with the pose planes precomputed OUTSIDE the timed loop
    pre = []
    for fa in buckets:
        R9, p3 = pe._pose_channels(fa, R, p)
        pre.append((jnp.stack(R9), jnp.stack(p3)))

    def chain_pregathered(R_, p_):
        acc = jnp.zeros((), jnp.float32)
        for fa, (R9s, p3s) in zip(buckets, pre):
            # tie to R_ so the loop chains (values identical: eps ~ 1e-30)
            R9 = tuple(R9s[i] + R_[0, 0, 0] * 0.0 for i in range(9))
            p3 = tuple(p3s[i] for i in range(3))
            mu3, P6 = pe._moment_channels(fa)
            mask, n, N, invN, vb, Rm, RP, cov6 = pe._soa_agg(
                fa.n, mu3, P6, R9, p3)
            residv, u, B1, B2 = pe._soa_eig(cov6, N)
            rows_ch, jjt_ch, d36_ch = pe._soa_chain(
                mask, n, invN, vb, Rm, RP, mu3, P6, R9, p3, u, B1, B2)
            acc = acc + jnp.sum(residv) + live(rows_ch, jjt_ch, d36_ch)
        return acc

    for name, fn in (("pose_only", pose_only), ("agg", agg), ("eig", eig),
                     ("chain", chain),
                     ("chain_pregathered", chain_pregathered)):
        out[f"ms_{name}"] = round(timed(fn, R, p), 2)
        print(json.dumps(out), flush=True)

    # fusion/copy count of the full-eval module (default path)
    fn1 = jax.jit(lambda R_, p_: pe.plane_cost_grad_hess(
        buckets[0], R_, p_, W))
    try:
        txt = fn1.lower(R, p).compile().as_text()
        out["hlo_fusions"] = txt.count(" fusion(")
        out["hlo_copies"] = txt.count(" copy(")
        out["hlo_custom_calls"] = txt.count(" custom-call(")
    except Exception as e:
        out["hlo_error"] = str(e)[:100]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
