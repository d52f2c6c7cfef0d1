"""Hypothesis probe: is the W=512 SoA-core cost the R[frame]/p[frame]
gather?  Times three variants of the per-entry evaluation chain:

  gather   — _soa_core as-is (R[fa.frame] inside the loop)
  hoisted  — Rg/pg precomputed OUTSIDE the timed loop (pure elementwise
             chain remains; if this collapses the time, the gather is it)
  onehot   — Rg/pg expanded by a one-hot MXU matmul inside the loop
             (the candidate fix: selection-exact, no serialized gather)

Prints one JSON line.  Run ALONE (one TPU client at a time).
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


def chained_ms(fn, R, p, reps=8):
    @jax.jit
    def loop(R_, p_):
        def body(_i, carry):
            Rc, pc, acc = carry
            s = fn(Rc, pc)
            eps = s * jnp.asarray(1e-30, Rc.dtype)
            return (Rc + eps, pc + eps, acc + s)

        _, _, acc = jax.lax.fori_loop(
            0, reps, body, (R_, p_, jnp.zeros((), R_.dtype))
        )
        return acc

    np.asarray(loop(R, p))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(R, p))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps * 1e3


def live(*xs):
    return sum(jnp.sum(jnp.abs(x)) for x in xs)


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

    def f_gather(R_, p_):
        acc = jnp.zeros((), R_.dtype)
        for fa in buckets:
            resid, jjt6, D36, rows18 = pe._soa_core(fa, R_, p_, W)
            acc = acc + resid + 1e-30 * live(jjt6, D36, rows18)
        return acc

    out["soa_ms_gather"] = round(chained_ms(f_gather, R, p), 2)
    print(json.dumps(out), flush=True)

    # hoisted: gather runs once OUTSIDE the chained loop; the loop body
    # re-runs only the elementwise chain.  We fake it by substituting a
    # bucket whose frame array indexes a PRE-GATHERED contiguous pose set:
    # frame := iota over a (V*K)-pose array built once per call.  The
    # gather cost becomes a one-time contiguous build; inside the loop
    # R2[frame2] is an iota gather of contiguous rows.
    buckets2 = []
    frames_flat = []
    for fa in buckets:
        V, K = fa.n.shape
        f2 = jnp.arange(V * K, dtype=fa.frame.dtype).reshape(V, K)
        buckets2.append(pe.PlaneFactorArrays(fa.n, fa.mu, fa.Pc, f2))
        frames_flat.append(fa.frame.reshape(-1))

    def f_hoisted(R_, p_):
        acc = jnp.zeros((), R_.dtype)
        for fa, fl in zip(buckets2, frames_flat):
            R2 = R_[fl]
            p2 = p_[fl]
            resid, jjt6, D36, rows18 = pe._soa_core(fa, R2, p2, W)
            acc = acc + resid + 1e-30 * live(jjt6, D36, rows18)
        return acc

    # NOTE: the iota gather R2[f2] inside _soa_core is still a gather; to
    # truly hoist, run the real gather once per loop call but chain only
    # the elementwise part.  Simplest faithful hoist: close over
    # pre-gathered arrays (loop-invariant; XLA hoists them out of the
    # fori_loop body).
    pre = []
    for fa in buckets:
        pre.append((R[fa.frame], p[fa.frame]))

    def f_hoisted2(R_, p_):
        # R_/p_ enter only through a tiny perturbation of the PRE-GATHERED
        # operands, so the chain dependency is kept without re-gathering
        eps = (jnp.sum(R_[0]) + jnp.sum(p_[0])) * 1e-30
        acc = jnp.zeros((), R_.dtype)
        for fa, (Rg, pg) in zip(buckets, pre):
            V, K = fa.n.shape
            f2 = jnp.arange(V * K, dtype=fa.frame.dtype).reshape(V, K)
            fa2 = pe.PlaneFactorArrays(fa.n, fa.mu, fa.Pc, f2)
            resid, jjt6, D36, rows18 = pe._soa_core(
                fa2,
                (Rg + eps).reshape(V * K, 3, 3),
                (pg + eps).reshape(V * K, 3),
                W,
            )
            acc = acc + resid + 1e-30 * live(jjt6, D36, rows18)
        return acc

    out["soa_ms_hoisted_iota"] = round(chained_ms(f_hoisted, R, p), 2)
    print(json.dumps(out), flush=True)
    out["soa_ms_pregathered"] = round(chained_ms(f_hoisted2, R, p), 2)
    print(json.dumps(out), flush=True)

    # one-hot expansion of R,p on the MXU instead of the gather
    hi = jax.lax.Precision.HIGHEST

    def f_onehot(R_, p_):
        acc = jnp.zeros((), R_.dtype)
        Rp12 = jnp.concatenate(
            [R_.reshape(W, 9), p_.reshape(W, 3)], axis=1
        )                                               # (W, 12)
        for fa in buckets:
            V, K = fa.n.shape
            oh = (
                fa.frame.reshape(V * K)[:, None]
                == jnp.arange(W, dtype=fa.frame.dtype)[None, :]
            ).astype(fa.n.dtype)                        # (V*K, W)
            g12 = jax.lax.dot_general(
                oh, Rp12, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=fa.n.dtype, precision=hi,
            )                                           # (V*K, 12)
            Rg = g12[:, :9].reshape(V, K, 3, 3)
            pg = g12[:, 9:].reshape(V, K, 3)
            f2 = jnp.arange(V * K, dtype=fa.frame.dtype).reshape(V, K)
            fa2 = pe.PlaneFactorArrays(fa.n, fa.mu, fa.Pc, f2)
            resid, jjt6, D36, rows18 = pe._soa_core(
                fa2, Rg.reshape(V * K, 3, 3), pg.reshape(V * K, 3), W
            )
            acc = acc + resid + 1e-30 * live(jjt6, D36, rows18)
        return acc

    out["soa_ms_onehot_expand"] = round(chained_ms(f_onehot, R, p), 2)
    print(json.dumps(out), flush=True)

    # numerical check: one-hot expansion == gather, exactly (selection)
    a = np.asarray(jax.jit(f_gather)(R, p))
    b = np.asarray(jax.jit(f_onehot)(R, p))
    out["onehot_equals_gather"] = bool(np.array_equal(a, b))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
