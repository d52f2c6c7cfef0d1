"""Chip-side parity regression of the Pallas kernels vs the XLA paths.

Runs ON the real TPU (non-interpret) the kernels that the CPU suite can
only exercise in interpret mode (tests/test_soa_fused.py,
tests/test_plane_factor.py::test_gram_syrk):

  * soa_fused_channels / soa_resid_fused vs the XLA _soa_core pipeline
  * the lower-triangle SYRK vs an XLA full Gram
  * banded_cgh (block-banded Gram) vs the dense _total_cgh
  * a short LM solve under LVBA_SOA_KERNEL=pallas vs the default

so a Mosaic lowering failure or VMEM overflow is caught BEFORE the
measurement sweeps (VERDICT r3 weak #4).  f32 tolerances: the kernels run
the same jnp code as the XLA path, but fusion order differs.

Prints one JSON line per check; exits non-zero on any failure.
"""

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

FAILED = []


def check(name, a, b, tol, scale=None):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    s = scale if scale is not None else max(np.max(np.abs(a)), 1e-30)
    err = float(np.max(np.abs(a - b)) / s)
    ok = err < tol and np.isfinite(err)
    print(json.dumps({"check": name, "rel_err": err, "tol": tol,
                      "ok": bool(ok)}), flush=True)
    if not ok:
        FAILED.append(name)


def main():
    from global_lvba_tpu.factors.padding import buckets_to_device
    from global_lvba_tpu.factors.plane_eigen import (
        _soa_core, build_banded_groups, banded_cgh,
    )
    from global_lvba_tpu.solver.lm import _total_cgh
    from global_lvba_tpu.map.voxelize import build_voxel_map
    from global_lvba_tpu.models.synthetic import make_plane_scene, perturb_poses
    from global_lvba_tpu.ops.pallas.gram import syrk
    from global_lvba_tpu.ops.pallas.soa_fused import (
        soa_fused_channels, soa_resid_fused,
    )
    from global_lvba_tpu.solver.lm import lm_damping_iter, _lm_jitted

    backend = jax.default_backend()
    print(json.dumps({"backend": backend, "device": str(jax.devices()[0])}),
          flush=True)

    W = 64
    scene = make_plane_scene(num_frames=W, points_per_frame=1500, seed=3)
    vm = build_voxel_map(
        scene.points_body, scene.frame_ids, scene.R_true, scene.p_true,
        voxel_size=1.0, eigen_ratios=(0.2, 0.2, 0.2, 0.2),
    )
    buckets = buckets_to_device(vm, dtype=jnp.float32)
    Rp, pp = perturb_poses(scene.R_true, scene.p_true, 0.003, 0.01, seed=4)
    R = jnp.asarray(Rp, jnp.float32)
    p = jnp.asarray(pp, jnp.float32)

    # --- 1. fused SoA kernels vs the XLA _soa_core, every bucket tier ---
    for bi, fa in enumerate(buckets):
        Rg, pg = R[fa.frame], p[fa.frame]
        resv, rowsC, jjtC, d36C = jax.jit(soa_fused_channels)(fa, Rg, pg)
        res_x, jjt_x, d36_x, rows_x = jax.jit(
            lambda fa_, R_, p_: _soa_core(fa_, R_, p_, W)
        )(fa, R, p)
        check(f"soa_resid_b{bi}", jnp.sum(resv), res_x, 2e-5)
        # rows carry 1/(lambda_i - lambda_j) eigen-perturbation ratios whose
        # f32 rounding differs with fusion order on near-degenerate voxels;
        # their Hessian contributions cancel (cgh_soa_H below is tight)
        check(f"soa_rows_b{bi}", jnp.moveaxis(rowsC, 0, -1), rows_x, 1e-3)
        check(f"soa_jjt_b{bi}", jnp.moveaxis(jjtC, 0, -1), jjt_x, 2e-5)
        check(f"soa_d36_b{bi}", jnp.moveaxis(d36C, 0, -1), d36_x, 2e-5)
        rv2 = jax.jit(soa_resid_fused)(fa, Rg, pg)
        check(f"soa_residonly_b{bi}", jnp.sum(rv2), res_x, 2e-5)

    # --- 2. SYRK vs XLA full Gram ---
    key = jax.random.PRNGKey(0)
    for (Kr, N) in ((640, 384), (1536, 772)):   # incl. non-multiple N
        A = jax.random.normal(key, (Kr, N), jnp.float32)
        G_ref = jax.jit(lambda A_: jax.lax.dot_general(
            A_, A_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))(A)
        G_k = jax.jit(lambda A_: syrk(A_, tile=256, kc=512))(A)
        check(f"syrk_{Kr}x{N}", G_k, G_ref, 2e-6)

    # --- 3. full cost/grad/Hessian: pallas SoA kernel vs default ---
    def cgh_with(env):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fn = jax.jit(lambda R_, p_: _total_cgh(buckets, R_, p_, W))
            out = fn(R, p)
            return tuple(np.asarray(x) for x in out)
        finally:
            for k, v in saved.items():
                os.environ.pop(k, None) if v is None else os.environ.update({k: v})

    # pin the Gram to HIGHEST on both sides: the comparison isolates the
    # SoA-kernel lowering, not the (round-5 default) one-bf16-pass Gram
    # rounding, which drifts the default-vs-pallas delta right at the
    # 2e-5 tolerance (measured 2.08e-5)
    r0, g0, H0 = cgh_with({"LVBA_GRAM_PRECISION": "highest"})
    r1, g1, H1 = cgh_with({"LVBA_SOA_KERNEL": "pallas",
                           "LVBA_GRAM_PRECISION": "highest"})
    check("cgh_soa_resid", r1, r0, 2e-5)
    check("cgh_soa_g", g1, g0, 2e-5, scale=float(np.max(np.abs(g0))))
    check("cgh_soa_H", H1, H0, 2e-5, scale=float(np.max(np.abs(H0))))

    # --- 4. block-banded Gram vs dense ---
    rb = gb = None
    groups = [build_banded_groups(fa, W) for fa in buckets]

    @jax.jit
    def banded_total(R_, p_):
        resid = jnp.zeros((), R_.dtype)
        g = jnp.zeros((W, 6), R_.dtype)
        Hd = jnp.zeros((W, 6, 6), R_.dtype)
        H = jnp.zeros((6 * W, 6 * W), R_.dtype)
        for bg in groups:
            r_, g_, Hd_, H_ = banded_cgh(bg, R_, p_, W)
            resid, g, Hd, H = resid + r_, g + g_, Hd + Hd_, H + H_
        Hq = H.reshape(W, 6, W, 6)
        Hq = Hq.at[jnp.arange(W), :, jnp.arange(W), :].add(Hd)
        return resid, g.reshape(-1), Hq.reshape(6 * W, 6 * W)

    # reference at the DEFAULT knobs: banded and dense share the same
    # Gram precision, so this comparison stays same-knob (the HIGHEST
    # r0/H0 above exists only to isolate the pallas kernel check)
    r0d, g0d, H0d = cgh_with({})
    rb, gb, Hb = banded_total(R, p)
    check("banded_resid", rb, r0d, 2e-5)
    check("banded_g", gb, g0d, 2e-5, scale=float(np.max(np.abs(g0d))))
    check("banded_H", Hb, H0d, 2e-5, scale=float(np.max(np.abs(H0d))))

    # --- 5. short LM solve: pallas SoA kernel vs default poses ---
    res_d = lm_damping_iter(buckets, R, p, max_iters=4)
    pd = np.asarray(res_d.p)
    os.environ["LVBA_SOA_KERNEL"] = "pallas"
    try:
        _lm_jitted.clear_cache()
        res_k = lm_damping_iter(buckets, R, p, max_iters=4)
        pk = np.asarray(res_k.p)
    finally:
        os.environ.pop("LVBA_SOA_KERNEL", None)
        _lm_jitted.clear_cache()
    check("lm_soa_poses", pk, pd, 3e-3,
          scale=float(np.max(np.abs(pd - np.asarray(p, np.float64)))))

    print(json.dumps({"kernel_parity": "PASS" if not FAILED else "FAIL",
                      "failed": FAILED}), flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
