"""Chip probe: visual reduced-solver A/B on the bench fixtures.

Measures ms/iter for each reduced solver at M=200 (the ladder-3 class:
short tracks, Q ~ 300k) and M=1000 (long-track class, Q = 2M), with the
final cost as the convergence gate.  Informs _auto_solver's crossover
policy by measurement.
"""

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import bench


def measure(prob_builder, name, solvers, iters):
    from global_lvba_tpu.solver.schur import solve_visual_ba

    prob, Rp, tp, X = prob_builder()
    out = {}
    for solver in solvers:
        pr = dataclasses.replace(prob, reduced_solver=solver)
        try:
            r = solve_visual_ba(pr, Rp, tp, X, max_iters=iters)
            np.asarray(r.R)
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                r = solve_visual_ba(pr, Rp, tp, X, max_iters=iters)
                np.asarray(r.R)
                ts.append(time.perf_counter() - t0)
            out[f"{name}_{solver}_ms_per_iter"] = round(
                min(ts) / iters * 1e3, 2)
            out[f"{name}_{solver}_cost"] = round(float(r.cost), 1)
        except Exception as e:
            out[f"{name}_{solver}_error"] = str(e)[:100]
        print(json.dumps(out), flush=True)
    return out


def m200_builder():
    import bench as b

    # reuse the bench fixture construction
    from global_lvba_tpu.geometry.camera import CameraModel
    from global_lvba_tpu.eval.oracle import _np_project, _exp_so3
    from global_lvba_tpu.solver.schur import VisualBAProblem

    rng = np.random.default_rng(0)
    M, P, OBS_PER_PT = 200, 2000, 10
    cam = CameraModel(fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                      k1=-0.05, k2=0.08, p1=-0.001, p2=0.0005,
                      width=640, height=480)
    Rcw = np.zeros((M, 3, 3))
    tcw = np.zeros((M, 3))
    for m in range(M):
        Rcw[m] = _exp_so3(rng.normal(scale=0.05, size=3))
        tcw[m] = [0.05 * m, 0.0, 4.0]
    X = rng.uniform(-3, 3, size=(P, 3))
    X[:, 2] = rng.uniform(8, 12, size=P)
    base = rng.integers(0, M - OBS_PER_PT + 1, size=P)
    obs_pt = np.repeat(np.arange(P, dtype=np.int32), OBS_PER_PT)
    obs_cam = (base[:, None] + np.arange(OBS_PER_PT)[None, :]).reshape(-1)
    obs_cam = obs_cam.astype(np.int32)
    uv, _ = _np_project(cam, Rcw[obs_cam], tcw[obs_cam], X[obs_pt])
    obs_uv = uv + rng.normal(scale=0.3, size=uv.shape)
    pn = np.tile(np.array([[0.0, 0.0, 1.0]]), (P, 1))
    pd = -X[:, 2].copy()
    prob = VisualBAProblem(cam=cam, obs_cam=obs_cam, obs_pt=obs_pt,
                           obs_uv=obs_uv, plane_n=pn, plane_d=pd,
                           num_cams=M, num_pts=P)
    Rp = Rcw.copy()
    tp = tcw.copy()
    for m in range(1, M):
        Rp[m] = Rcw[m] @ _exp_so3(rng.normal(scale=0.002, size=3))
        tp[m] = tcw[m] + rng.normal(scale=0.01, size=3)
    return prob, Rp, tp, X


def main():
    measure(m200_builder, "m200", ("lu", "cg", "cg_mf"), iters=8)


if __name__ == "__main__":
    main()
