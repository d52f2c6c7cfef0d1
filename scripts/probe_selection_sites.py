"""Per-site A/B of the three frame-selection contractions in the W=512
factor evaluation: XLA inline one-hot vs the Pallas VMEM-generated-one-hot
kernels (ops/pallas/selection.py).

Sites (all exact bf16-split selection):
  pose   — table expansion (W, 12) -> (12, VK)      [_pose_channels]
  ghd    — entry reduction (VK, 42) -> (W, 42)      [g/Hd assembly]
  m      — batched expansion (V, K, 18) -> (V, W, 18)  [M rows]

Each timed as a chained on-device loop over the real bucket set, with the
value operands precomputed so ONLY the selection contraction is timed.
Prints one cumulative JSON line per measurement.
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
from global_lvba_tpu.ops.pallas.selection import entry_reduce, table_select


def timed(make_fn, x0, reps=6):
    fn = make_fn

    @jax.jit
    def loop(x):
        def body(_i, carry):
            xc, acc = carry
            s = fn(xc)
            return (xc + s * jnp.asarray(1e-30, xc.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, reps, body,
                                   (x, jnp.zeros((), jnp.float32)))
        return acc

    np.asarray(loop(x0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(x0))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps * 1e3


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
    out = {"W": W}
    hi = jax.lax.Precision.HIGHEST

    # precomputed value operands per bucket (kept OUTSIDE the timed loops)
    rng = np.random.default_rng(0)
    vals42 = [
        jax.device_put(jnp.asarray(
            rng.standard_normal((int(np.prod(fa.n.shape)), 42)), jnp.float32))
        for fa in buckets
    ]
    rows18 = [
        jax.device_put(jnp.asarray(
            rng.standard_normal(fa.n.shape + (18,)), jnp.float32))
        for fa in buckets
    ]

    # ---- site: pose expansion ----
    def pose_xla(R_):
        acc = jnp.zeros((), jnp.float32)
        os.environ.pop("LVBA_SEL_KERNEL", None)
        for fa in buckets:
            R9, p3 = pe._pose_channels(fa, R_, p)
            for c in R9 + p3:
                acc = acc + 1e-30 * jnp.sum(jnp.abs(c))
        return acc

    def pose_pallas(R_):
        acc = jnp.zeros((), jnp.float32)
        tbl = jnp.concatenate([R_.reshape(W, 9), p], axis=1)
        tbl3 = jnp.concatenate(pe._split3_bf16(tbl), axis=1)
        for fa in buckets:
            V, K = fa.n.shape
            g = table_select(fa.frame.reshape(-1), tbl3, W,
                             interpret=jax.default_backend() != "tpu")
            g12 = g[:12] + g[12:24] + g[24:36]
            acc = acc + 1e-30 * jnp.sum(jnp.abs(g12))
        return acc

    out["pose_xla_ms"] = round(timed(pose_xla, R), 2)
    print(json.dumps(out), flush=True)
    out["pose_pallas_ms"] = round(timed(pose_pallas, R), 2)
    print(json.dumps(out), flush=True)

    # ---- site: g/Hd entry reduction ----
    def ghd_xla(x0):
        acc = jnp.zeros((), jnp.float32)
        for fa, v in zip(buckets, vals42):
            vv = v + x0 * 1e-30
            oh_bf = (
                fa.frame.reshape(-1)[:, None]
                == jnp.arange(W, dtype=fa.frame.dtype)
            ).astype(jnp.bfloat16)
            gHd = pe._exact_sel_dot(
                vv, oh_bf, (((0,), (0,)), ((), ())),
                values_left=False, pack_axis=1, out_axis=1,
            )
            acc = acc + 1e-30 * jnp.sum(jnp.abs(gHd))
        return acc

    def ghd_pallas(x0):
        acc = jnp.zeros((), jnp.float32)
        for fa, v in zip(buckets, vals42):
            vv = v + x0 * 1e-30
            vals3 = jnp.concatenate(
                [x.astype(jnp.bfloat16) for x in pe._split3_bf16(vv)], axis=1)
            gHd3 = entry_reduce(fa.frame.reshape(-1), vals3, W,
                                interpret=jax.default_backend() != "tpu")
            gHd = gHd3[:, :42] + gHd3[:, 42:84] + gHd3[:, 84:126]
            acc = acc + 1e-30 * jnp.sum(jnp.abs(gHd))
        return acc

    z = jnp.zeros((), jnp.float32)
    out["ghd_xla_ms"] = round(timed(ghd_xla, z), 2)
    print(json.dumps(out), flush=True)
    out["ghd_pallas_ms"] = round(timed(ghd_pallas, z), 2)
    print(json.dumps(out), flush=True)

    # ---- site: M expansion (batched per voxel) ----
    def m_xla(x0):
        acc = jnp.zeros((), jnp.float32)
        for fa, r18 in zip(buckets, rows18):
            rr = r18 + x0 * 1e-30
            oh_bf = (
                fa.frame[..., None] == jnp.arange(W, dtype=fa.frame.dtype)
            ).astype(jnp.bfloat16)
            M = pe._exact_sel_dot(
                rr, oh_bf, (((1,), (1,)), ((0,), (0,))), values_left=False,
                pack_axis=2, out_axis=2,
            )
            acc = acc + 1e-30 * jnp.sum(jnp.abs(M))
        return acc

    out["m_xla_ms"] = round(timed(m_xla, z), 2)
    print(json.dumps(out), flush=True)

    # combined gHd+M sharing ONE one-hot expression per bucket (does CSE
    # of the operand change anything measurable?)
    def ghdm_xla(x0):
        acc = jnp.zeros((), jnp.float32)
        for fa, v, r18 in zip(buckets, vals42, rows18):
            vv = v + x0 * 1e-30
            rr = r18 + x0 * 1e-30
            oh_bf = (
                fa.frame[..., None] == jnp.arange(W, dtype=fa.frame.dtype)
            ).astype(jnp.bfloat16)
            gHd = pe._exact_sel_dot(
                vv, oh_bf.reshape(-1, W), (((0,), (0,)), ((), ())),
                values_left=False, pack_axis=1, out_axis=1,
            )
            M = pe._exact_sel_dot(
                rr, oh_bf, (((1,), (1,)), ((0,), (0,))), values_left=False,
                pack_axis=2, out_axis=2,
            )
            acc = acc + 1e-30 * (jnp.sum(jnp.abs(gHd)) + jnp.sum(jnp.abs(M)))
        return acc

    out["ghdm_xla_ms"] = round(timed(ghdm_xla, z), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
