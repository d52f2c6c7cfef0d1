"""Chip probe: Gram formulation A/B at W=512 (round 4).

The eval's Gram is ~3.4 ms at HIGH on the (V, W, 3, 6) multi-dim dot.
Candidates:
  multidim   dot_general contract (0,2)               (current)
  swap_syrk  swapaxes(1,2) -> (3V, 6W) 2-D -> Pallas lower-triangle SYRK
  swap_dot   same relayout -> full 2-D AᵀA (isolates the transpose cost)
Also: the pose expansion via the Pallas table_select kernel alone
(the combined selection kernels lost; pose-only may win).
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

from global_lvba_tpu.map.voxelize import build_voxel_map
from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses
from global_lvba_tpu.factors.padding import buckets_to_device
from global_lvba_tpu.factors import plane_eigen as pe


def timed(fn, R, p, reps=6):
    @jax.jit
    def loop(R_, p_):
        def body(_i, c):
            Rc, pc, acc = c
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
    live = lambda *xs: sum(jnp.sum(jnp.abs(x)) * 1e-30 for x in xs)
    out = {}

    def eval_with_gram(mode, R_, p_):
        acc = jnp.zeros((), R_.dtype)
        H = jnp.zeros((6 * W, 6 * W), R_.dtype)
        for fa in buckets:
            r, g, Hd, M = pe._chunk_eval_soa(fa, R_, p_, W)
            acc = acc + r + live(g, Hd)
            if mode == "multidim":
                Hq = jax.lax.dot_general(
                    M, M, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
                    preferred_element_type=M.dtype,
                    precision=pe._gram_precision(),
                ).reshape(6 * W, 6 * W)
                H = H - Hq
            else:
                V = M.shape[0]
                A = jnp.swapaxes(M, 1, 2).reshape(3 * V, 6 * W)
                if mode == "swap_syrk":
                    from global_lvba_tpu.ops.pallas.gram import syrk

                    H = H - syrk(A, precision="high")
                else:
                    H = H - jax.lax.dot_general(
                        A, A, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=A.dtype,
                        precision=pe._gram_precision(),
                    )
        return acc + live(H)

    for mode in ("multidim", "swap_dot", "swap_syrk"):
        out[f"eval_gram_{mode}_ms"] = round(
            timed(lambda R_, p_, m=mode: eval_with_gram(m, R_, p_), R, p), 2)
        print(json.dumps(out), flush=True)

    # correctness spot check: syrk vs multidim on one bucket
    fa = buckets[-1]
    _, _, _, M = pe._chunk_eval_soa(fa, R, p, W)
    V = M.shape[0]
    A = jnp.swapaxes(M, 1, 2).reshape(3 * V, 6 * W)
    from global_lvba_tpu.ops.pallas.gram import syrk

    H1 = np.asarray(syrk(A, precision="high"), np.float64)
    H0 = np.asarray(jax.lax.dot_general(
        M, M, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
        preferred_element_type=M.dtype,
        precision=jax.lax.Precision.HIGHEST,
    ), np.float64).reshape(6 * W, 6 * W)
    out["syrk_vs_multidim_rel"] = float(
        np.abs(H1 - H0).max() / max(np.abs(H0).max(), 1e-30))
    print(json.dumps(out), flush=True)

    # pose expansion: XLA packed dot vs the Pallas table_select kernel
    from global_lvba_tpu.ops.pallas.selection import table_select

    def pose_xla(R_, p_):
        acc = jnp.zeros((), R_.dtype)
        for fa in buckets:
            R9, p3 = pe._pose_channels(fa, R_, p_)
            acc = acc + live(*R9, *p3)
        return acc

    def pose_kernel(R_, p_):
        acc = jnp.zeros((), R_.dtype)
        tbl = jnp.concatenate([R_.reshape(W, 9), p_], axis=1)
        tbl3 = jnp.concatenate(pe._split3_bf16(tbl), axis=1)
        for fa in buckets:
            V, K = fa.n.shape
            g = table_select(fa.frame.reshape(-1), tbl3, W)
            g12 = (g[:12] + g[12:24] + g[24:36]).reshape(12, V, K)
            acc = acc + live(g12)
        return acc

    out["pose_xla_ms"] = round(timed(pose_xla, R, p), 2)
    print(json.dumps(out), flush=True)
    out["pose_kernel_ms"] = round(timed(pose_kernel, R, p), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
