"""Chip probe: where do the 14.6 ms of the SoA stage go, and which
pose-expansion formulation avoids it?

Hypothesis (round 4): the channel-major relayout of the gathered poses —
moveaxis((V,K,3,3) -> (9,V,K)) — is a minor-to-major transpose XLA lowers
~80x below HBM bandwidth.  Candidates measured per chained evaluation:

  gather_mv   R[frame] then moveaxis            (current)
  gather_cm   (9,W) table gathered on axis 1    -> (9,V,K) directly
  onehot_mxu  one-hot (VK,W) x (W,12) matmul    -> (12,VK) channel-major
  take_kernel in-kernel jnp.take of (W,) table  (lowering probe only)
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses
from global_lvba_tpu.factors.padding import buckets_to_device


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


def main():
    W = 512
    scene = make_plane_scene(num_frames=W, points_per_frame=2000, seed=0)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float32)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=1)
    R = jax.device_put(jnp.asarray(Rp, jnp.float32))
    p = jax.device_put(jnp.asarray(pp, jnp.float32))
    out = {}

    def live(*xs):
        return sum(jnp.sum(jnp.abs(x)) * 1e-30 for x in xs)

    # (a) plain gather, entry-major output (V,K,3,3)
    def gather_only(R_, p_):
        acc = jnp.zeros((), R_.dtype)
        for fa in buckets:
            acc = acc + live(R_[fa.frame], p_[fa.frame])
        return acc

    out["gather_only_ms"] = round(timed(gather_only, R, p), 2)
    print(json.dumps(out), flush=True)

    # (b) gather + channel-major moveaxis (the current formulation)
    def gather_mv(R_, p_):
        acc = jnp.zeros((), R_.dtype)
        for fa in buckets:
            V, K = fa.n.shape
            Rg = R_[fa.frame]
            pg = p_[fa.frame]
            r9 = jnp.moveaxis(Rg.reshape(V, K, 9), -1, 0)
            p3 = jnp.moveaxis(pg, -1, 0)
            acc = acc + live(r9, p3)
        return acc

    out["gather_mv_ms"] = round(timed(gather_mv, R, p), 2)
    print(json.dumps(out), flush=True)

    # (c) channel-major gather: (12, W) table indexed on axis 1
    def gather_cm(R_, p_):
        tbl = jnp.concatenate(
            [R_.reshape(W, 9), p_], axis=1).T          # (12, W), tiny
        acc = jnp.zeros((), R_.dtype)
        for fa in buckets:
            g = tbl[:, fa.frame]                       # (12, V, K)
            acc = acc + live(g)
        return acc

    out["gather_cm_ms"] = round(timed(gather_cm, R, p), 2)
    print(json.dumps(out), flush=True)

    # (d) one-hot MXU expansion -> (12, VK) channel-major
    hi = jax.lax.Precision.HIGHEST

    def onehot_mxu(R_, p_):
        tbl = jnp.concatenate([R_.reshape(W, 9), p_], axis=1)  # (W, 12)
        acc = jnp.zeros((), R_.dtype)
        for fa in buckets:
            V, K = fa.n.shape
            onehot = (
                fa.frame[..., None] == jnp.arange(W, dtype=fa.frame.dtype)
            ).astype(fa.n.dtype).reshape(V * K, W)
            g = jax.lax.dot_general(
                tbl, onehot, dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=fa.n.dtype, precision=hi,
            )                                           # (12, VK)
            acc = acc + live(g)
        return acc

    out["onehot_mxu_ms"] = round(timed(onehot_mxu, R, p), 2)
    print(json.dumps(out), flush=True)

    # (e) can Mosaic lower an in-kernel (W,) table take by (vt, K) indices?
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def take_kernel(tbl_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(tbl_ref[0], idx_ref[:], axis=0)

    fa = buckets[1]
    V, K = fa.n.shape
    vt = 128
    try:
        tbl = jnp.arange(W, dtype=jnp.float32).reshape(1, W)
        got = pl.pallas_call(
            take_kernel,
            grid=(V // vt,),
            in_specs=[
                pl.BlockSpec((1, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vt, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((vt, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((V, K), jnp.float32),
        )(tbl, fa.frame)
        ref = np.asarray(fa.frame, np.float32)
        err = float(np.abs(np.asarray(got) - ref).max())
        out["take_kernel"] = f"OK err={err:.1e}"

        def take_timed(R_, p_):
            tblR = (R_.reshape(W, 9)[:, 0] + p_[:, 0]).reshape(1, W)
            acc = jnp.zeros((), R_.dtype)
            for fb in buckets:
                Vb, Kb = fb.n.shape
                vtb = max(8, min(128, Vb))
                g = pl.pallas_call(
                    take_kernel,
                    grid=(Vb // vtb,),
                    in_specs=[
                        pl.BlockSpec((1, W), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((vtb, Kb), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((vtb, Kb), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((Vb, Kb), jnp.float32),
                )(tblR, fb.frame)
                acc = acc + live(g)
            return acc

        # one channel gathered in-kernel; 12 channels ~ 12x this minus reuse
        out["take_kernel_1ch_ms"] = round(timed(take_timed, R, p), 2)
    except Exception as e:
        out["take_kernel"] = f"FAIL: {str(e)[:140]}"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
