"""Blur-precision A/B on chip (round 5): HIGH vs HIGHEST pyramid must
produce matching keypoints/descriptors, and HIGH must be faster.  The
recorded gate for frontend/sift._blur_precision's default."""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(prec):
    code = f'''
import os, sys, time, json
sys.path.insert(0, "{ROOT}")
os.environ["LVBA_SIFT_BLUR_PRECISION"] = "{prec}"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from global_lvba_tpu.frontend.sift import SiftParams, extract_sift
params = SiftParams()
rng = np.random.default_rng(0)
# structured image (random noise has no stable extrema ranking)
yy, xx = np.mgrid[0:512, 0:640]
img = np.zeros((512, 640), np.float32)
for k in range(60):
    cx, cy = rng.uniform(40, 600), rng.uniform(40, 470)
    s = rng.uniform(2, 14)
    a = rng.uniform(0.2, 1.0)
    img += a * np.exp(-(((xx-cx)**2 + (yy-cy)**2) / (2*s*s))).astype(np.float32)
img = (img / img.max()).astype(np.float32)
B = 4
stack = jax.device_put(jnp.asarray(np.stack([img]*B)))
fn = jax.jit(jax.vmap(lambda im: extract_sift(im, params)))
f = fn(stack)
np.asarray(f.desc)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    f = fn(stack); np.asarray(f.desc)
    ts.append(time.perf_counter()-t0)
valid = np.asarray(f.valid[0])
out = dict(prec="{prec}", ms_per_img=round(min(ts)/B*1e3, 2),
           n=int(valid.sum()))
np.save("/tmp/sift_{prec}_xy.npy", np.asarray(f.xy[0])[valid])
np.save("/tmp/sift_{prec}_desc.npy", np.asarray(f.desc[0])[valid])
print(json.dumps(out))
'''
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1200)
    print(r.stdout.strip())
    if r.returncode != 0:
        print(r.stderr[-600:])


if __name__ == "__main__":
    import numpy as np

    for prec in ("high", "highest"):
        run(prec)
    a = np.load("/tmp/sift_high_xy.npy")
    b = np.load("/tmp/sift_highest_xy.npy")
    da = np.load("/tmp/sift_high_desc.npy")
    db = np.load("/tmp/sift_highest_desc.npy")
    n = min(len(a), len(b))
    # match keypoints by nearest position
    from scipy.spatial import cKDTree

    d, idx = cKDTree(b).query(a, k=1)
    matched = d < 0.5
    dd = np.linalg.norm(da[matched] - db[idx[matched]], axis=1)
    print(json.dumps(dict(
        kp_high=len(a), kp_highest=len(b),
        pos_matched_frac=round(float(matched.mean()), 4),
        desc_l2_mean=round(float(dd.mean()), 5),
        desc_l2_max=round(float(dd.max()), 5),
    )))
