"""Decompose the frame-aligned W=512 evaluation: where do the ~6 ms go?

Cumulative chained-loop stages (min-of-3, ms):
  agg    — _soa_agg reductions only (per-voxel stats live)
  eig    — + _soa_eig
  sums   — + chain with ONLY the g/Hd channel sums live (rows dead)
  rows   — + rows18 stacked (V, W, 18) live          [full pre-Gram region]
  full   — + the -MᵀM Gram (= the production evaluation)
Run ALONE (one TPU client at a time)."""

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
    [fa] = buckets_to_device(vm, dtype=jnp.float32, W=W, layout="aligned")
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=1)
    R = jax.device_put(jnp.asarray(Rp, jnp.float32))
    p = jax.device_put(jnp.asarray(pp, jnp.float32))
    out = {"W": W, "V": int(fa.n.shape[0])}
    hi = jax.lax.Precision.HIGHEST

    def pre(R_, p_):
        mu3, P6 = pe._moment_channels(fa)
        R9, p3 = pe._pose_channels(fa, R_, p_)
        return mu3, P6, R9, p3

    def agg(R_, p_):
        mu3, P6, R9, p3 = pre(R_, p_)
        parts = pe._soa_agg(fa.n, mu3, P6, R9, p3)
        return live(*parts)

    def eig(R_, p_):
        mu3, P6, R9, p3 = pre(R_, p_)
        mask, n, N, invN, vb, Rm, RP, cov6 = pe._soa_agg(
            fa.n, mu3, P6, R9, p3)
        residv, u, B1, B2 = pe._soa_eig(cov6, N)
        return jnp.sum(residv) + live(u, B1, B2, vb, Rm, RP)

    def chain_core(R_, p_):
        mu3, P6, R9, p3 = pre(R_, p_)
        mask, n, N, invN, vb, Rm, RP, cov6 = pe._soa_agg(
            fa.n, mu3, P6, R9, p3)
        residv, u, B1, B2 = pe._soa_eig(cov6, N)
        rows_ch, jjt_ch, d36_ch = pe._soa_chain(
            mask, n, invN, vb, Rm, RP, mu3, P6, R9, p3, u, B1, B2)
        return residv, rows_ch, jjt_ch, d36_ch

    def sums(R_, p_):
        residv, rows_ch, jjt_ch, d36_ch = chain_core(R_, p_)
        g = jnp.stack([jnp.sum(c, axis=0) for c in jjt_ch], axis=-1)
        Hd = jnp.stack([jnp.sum(c, axis=0) for c in d36_ch], axis=-1)
        return jnp.sum(residv) + live(g, Hd)

    def rows(R_, p_):
        residv, rows_ch, jjt_ch, d36_ch = chain_core(R_, p_)
        g = jnp.stack([jnp.sum(c, axis=0) for c in jjt_ch], axis=-1)
        Hd = jnp.stack([jnp.sum(c, axis=0) for c in d36_ch], axis=-1)
        rows18 = jnp.stack(rows_ch, axis=-1)
        return jnp.sum(residv) + live(g, Hd, rows18)

    def full(R_, p_):
        r, g, H = pe.plane_cost_grad_hess(fa, R_, p_, W)
        return r + live(g, H)

    for name, fn in (("agg", agg), ("eig", eig), ("sums", sums),
                     ("rows", rows), ("full", full)):
        out[f"ms_{name}"] = round(timed(fn, R, p), 2)
        print(json.dumps(out), flush=True)

    # HLO shape of the pre-Gram region (fusion fragmentation check)
    fn1 = jax.jit(lambda R_, p_: rows(R_, p_))
    try:
        txt = fn1.lower(R, p).compile().as_text()
        out["rows_hlo_fusions"] = txt.count(" fusion(")
        out["rows_hlo_copies"] = txt.count(" copy(")
    except Exception as e:
        out["hlo_error"] = str(e)[:100]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
