"""Per-stage SIFT extraction profile on the real chip.

Splits extract_sift's pipeline (frontend/sift.py) into cumulative stages,
each timed as a chained on-device loop (min-of-N, one packed scalar
fetched), so stage cost = difference of consecutive cumulative times:

  pyramid   — Gaussian scale-space (MXU Toeplitz matmuls), all octaves
  extrema   — + DoG reduce-window extrema, approx_max_k, Newton refine
  orient    — + patch slicing, gradient, orientation histograms
  full      — + descriptors (= extract_sift)

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

from global_lvba_tpu.frontend import sift as S


def _stage_fn(params: S.SiftParams, stage: str):
    """Cumulative computation up to `stage`; returns a packed scalar."""

    def run(image):
        Sn = params.n_scales
        first_scale = 0.5 if params.first_octave == -1 else 1.0
        sigma_init = 0.5 / first_scale
        octave_img = image
        base_sigma = sigma_init
        acc = jnp.zeros((), image.dtype)
        import math

        for o in range(params.n_octaves):
            kp_per_octave = max(64, params.max_kp // 2 >> o)
            if octave_img.shape[0] < 16 or octave_img.shape[1] < 16:
                break
            incs = []
            lvl0_from_base = base_sigma < params.sigma0 - 1e-6
            s_start = 0 if lvl0_from_base else 1
            for s in range(s_start, Sn + 3):
                sig_abs = params.sigma0 * 2 ** (s / Sn)
                incs.append(math.sqrt(max(sig_abs ** 2 - base_sigma ** 2, 0.01)))
            levels = S._gauss_levels_matmul(
                octave_img, incs,
                upsample2=(o == 0 and params.first_octave == -1),
            )
            gauss = levels if lvl0_from_base else jnp.concatenate(
                [octave_img[None], levels]
            )
            if stage == "pyramid":
                acc = acc + jnp.sum(gauss[-1])
            else:
                xy, s_idx, sigma_o, resp, valid = S._extract_octave(
                    gauss, params, kp_per_octave
                )
                if stage == "extrema":
                    acc = acc + jnp.sum(xy) + jnp.sum(resp)
                else:
                    sclamp = jnp.clip(s_idx - 1, 0, Sn - 1)
                    dxp, dyp, origin = S._extract_patches(
                        gauss[1: Sn + 1], xy, sclamp
                    )
                    xy_loc = xy - origin.astype(xy.dtype)
                    mpx = jnp.sqrt(dxp * dxp + dyp * dyp)
                    apx = jnp.arctan2(dyp, dxp)
                    mo, ao, xy_o = S._crop_ori_window(mpx, apx, xy_loc)
                    th1, th2, has2 = S._orientations(
                        mo, ao, xy_o, sigma_o, params
                    )
                    if stage == "orient":
                        acc = acc + jnp.sum(th1) + jnp.sum(th2)
                    else:
                        d1 = S._descriptors(mpx, apx, xy_loc, sigma_o, th1,
                                            params)
                        d2 = S._descriptors(mpx, apx, xy_loc, sigma_o, th2,
                                            params)
                        acc = acc + jnp.sum(d1) + jnp.sum(d2)
            octave_img = S._resize_half(gauss[Sn])
            base_sigma = params.sigma0
        return acc

    return run


def timed_loop(fn, img, reps=8):
    @jax.jit
    def loop(image):
        def body(_i, carry):
            im, acc = carry
            a = fn(im)
            return (im + a * jnp.asarray(1e-30, im.dtype), acc + a)

        _, acc = jax.lax.fori_loop(0, reps, body, (image, jnp.zeros((), img.dtype)))
        return acc

    np.asarray(loop(img))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(img))
        ts.append(time.perf_counter() - t0)
    return min(ts) / reps * 1e3


def main():
    H, W = 512, 640
    rng = np.random.default_rng(0)
    # value-noise texture: representative spectral content (pure white
    # noise over-detects extrema; a flat image under-detects)
    base = rng.standard_normal((H // 8, W // 8)).astype(np.float32)
    img = np.asarray(
        jax.image.resize(jnp.asarray(base), (H, W), "cubic")
    )
    img = (img - img.min()) / (np.ptp(img) + 1e-9)
    img = jnp.asarray(img, jnp.float32)
    params = S.SiftParams()
    out = {"H": H, "W": W}
    prev = 0.0
    for stage in ("pyramid", "extrema", "orient", "full"):
        ms = timed_loop(_stage_fn(params, stage), img)
        out[f"cum_ms_{stage}"] = round(ms, 2)
        out[f"stage_ms_{stage}"] = round(ms - prev, 2)
        prev = ms
        print(json.dumps(out), flush=True)
    # reference: the public extract_sift entry (includes global top-k)
    feats = S.extract_sift(img, params)
    np.asarray(feats.response)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        f = S.extract_sift(img + jnp.asarray(1e-12, img.dtype), params)
        np.asarray(f.response[0])
        ts.append(time.perf_counter() - t0)
    out["extract_sift_ms_single_dispatch"] = round(min(ts) * 1e3, 2)
    out["n_valid"] = int(np.asarray(feats.valid).sum())
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
