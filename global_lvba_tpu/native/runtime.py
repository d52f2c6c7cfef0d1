"""ctypes bindings for the native host runtime (liblvba_native.so).

Compiled lazily with g++ on first use; every entry point has a pure-numpy
fallback in its caller, so the package works without a toolchain."""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger("global_lvba_tpu.native")

_DIR = Path(__file__).parent
_SO = _DIR / "liblvba_native.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _DIR / "lvba_native.cpp"
    try:
        subprocess.run(
            # default fp-contract (FMA) matches numpy's BLAS-backed f32
            # projection closest: measured 138/307k boundary pixels differ
            # vs 5740 with -ffp-contract=off (numpy's sgemm uses FMA)
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             str(src), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        log.info("native build unavailable: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    # (re)build when missing or stale: the .so is NOT shipped (it is built
    # with -march=native and would SIGILL on a different host), and a
    # stale binary would silently diverge from lvba_native.cpp
    src = _DIR / "lvba_native.cpp"
    if not _SO.exists() or (
        src.exists() and src.stat().st_mtime > _SO.stat().st_mtime
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as e:
        log.info("native load failed: %s", e)
        return None
    lib.lvba_lzf_decompress.restype = ctypes.c_long
    lib.lvba_lzf_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
    ]
    lib.lvba_voxel_keys.restype = ctypes.c_int
    lib.lvba_voxel_keys.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_double, ctypes.c_void_p,
    ]
    if hasattr(lib, "lvba_voxel_keys64"):
        lib.lvba_voxel_keys64.restype = ctypes.c_int
        lib.lvba_voxel_keys64.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_double, ctypes.c_int,
            ctypes.c_void_p,
        ]
    lib.lvba_radix_argsort.restype = None
    lib.lvba_radix_argsort.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
    ]
    lib.lvba_union_find.restype = None
    lib.lvba_union_find.argtypes = [
        ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p,
    ]
    if hasattr(lib, "lvba_plane_cgh"):
        lib.lvba_plane_cgh.restype = None
        lib.lvba_plane_cgh.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_long, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
        ]
    if hasattr(lib, "lvba_zbuffer"):
        lib.lvba_zbuffer.restype = None
        lib.lvba_zbuffer.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
    if hasattr(lib, "lvba_zbuffer_ranges"):
        lib.lvba_zbuffer_ranges.restype = None
        lib.lvba_zbuffer_ranges.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
    if hasattr(lib, "lvba_transform_points"):
        lib.lvba_transform_points.restype = None
        lib.lvba_transform_points.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ]
    if hasattr(lib, "lvba_bin_moments"):
        lib.lvba_bin_moments.restype = None
        lib.lvba_bin_moments.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
    if hasattr(lib, "lvba_lm_solve"):
        lib.lvba_lm_solve.restype = None
        lib.lvba_lm_solve.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.lvba_set_lapack.restype = None
        lib.lvba_set_lapack.argtypes = [ctypes.c_char_p]
        _point_at_scipy_lapack(lib)
    _lib = lib
    return lib


def _point_at_scipy_lapack(lib) -> None:
    """Hand the native LM solver scipy's bundled OpenBLAS: the image's
    reference libblas runs ~1 GFLOP/s, which would make the honest CPU
    baseline unfairly slow at the (6W)² solve."""
    try:
        import glob
        import scipy

        base = Path(scipy.__file__).parent.parent / "scipy.libs"
        for cand in sorted(glob.glob(str(base / "libscipy_openblas*.so"))):
            lib.lvba_set_lapack(cand.encode())
            return
    except Exception as e:  # solver falls back to its own LU
        log.info("optimized LAPACK unavailable for native LM: %s", e)


def lzf_decompress(data: bytes, expected: int) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(expected, dtype=np.uint8)
    n = lib.lvba_lzf_decompress(
        data, len(data), out.ctypes.data_as(ctypes.c_void_p), expected
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def voxel_keys(pts: np.ndarray, voxel_size: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    out = np.empty(pts.shape[0], dtype=np.int64)
    rc = lib.lvba_voxel_keys(
        pts.ctypes.data_as(ctypes.c_void_p), pts.shape[0], float(voxel_size),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out if rc == 0 else None


def voxel_keys64(pts: np.ndarray, voxel_size: float,
                 n_threads: int = 0) -> Optional[np.ndarray]:
    """Fused threaded floor+pack of f64 world points -> int64 voxel keys
    (same convention as map.voxelize.pack_voxel_keys(voxel_coords(...)))."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "lvba_voxel_keys64"):
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    out = np.empty(pts.shape[0], dtype=np.int64)
    rc = lib.lvba_voxel_keys64(
        pts.ctypes.data_as(ctypes.c_void_p), pts.shape[0],
        float(voxel_size), n_threads,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out if rc == 0 else None


def radix_argsort(keys: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    out = np.empty(keys.shape[0], dtype=np.int64)
    lib.lvba_radix_argsort(
        keys.ctypes.data_as(ctypes.c_void_p), keys.shape[0],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def transform_points(pts: np.ndarray, fid: np.ndarray, R: np.ndarray,
                     p: np.ndarray, n_threads: int = 0):
    """Threaded out_i = R[fid_i] @ pts_i + p[fid_i] (f64), or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "lvba_transform_points"):
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    fid = np.ascontiguousarray(fid, dtype=np.int32)
    R = np.ascontiguousarray(R, dtype=np.float64)
    p = np.ascontiguousarray(p, dtype=np.float64)
    out = np.empty_like(pts)
    lib.lvba_transform_points(
        pts.ctypes.data_as(ctypes.c_void_p),
        fid.ctypes.data_as(ctypes.c_void_p),
        pts.shape[0],
        R.ctypes.data_as(ctypes.c_void_p),
        p.ctypes.data_as(ctypes.c_void_p),
        n_threads,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def bin_moments(pts: np.ndarray, sort_idx: np.ndarray,
                starts: np.ndarray, n_threads: int = 0):
    """Threaded per-segment (sum xyz, sum xxT-6) accumulation over sorted
    point segments — the hot half of build_voxel_map's host binning.
    Returns (sums (S, 3), moms (S, 6)) f64, or None without the lib."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "lvba_bin_moments"):
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    sort_idx = np.ascontiguousarray(sort_idx, dtype=np.int64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    S = starts.shape[0]
    sums = np.empty((S, 3), dtype=np.float64)
    moms = np.empty((S, 6), dtype=np.float64)
    lib.lvba_bin_moments(
        pts.ctypes.data_as(ctypes.c_void_p),
        sort_idx.ctypes.data_as(ctypes.c_void_p),
        pts.shape[0],
        starts.ctypes.data_as(ctypes.c_void_p),
        S, n_threads,
        sums.ctypes.data_as(ctypes.c_void_p),
        moms.ctypes.data_as(ctypes.c_void_p),
    )
    return sums, moms


def plane_cgh(bucket, R: np.ndarray, p: np.ndarray, W: int,
              n_threads: int = 0):
    """Multithreaded C++ plane-factor (resid, grad, Hessian) — the honest
    CPU baseline of the reference's acc_evaluate2 + divide_thread
    (/root/reference/include/BALM/bavoxel.hpp:68-174,597-639).

    bucket: PlaneFactorBucket-like with n (V,K) f32, mu, Pc, frame.
    Returns (resid, g (6W,), H (6W, 6W)) in f64, or None without the lib.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "lvba_plane_cgh"):
        return None
    n = np.ascontiguousarray(bucket.n, dtype=np.float32)
    mu = np.ascontiguousarray(bucket.mu, dtype=np.float32)
    Pc = np.ascontiguousarray(bucket.Pc, dtype=np.float32)
    frame = np.ascontiguousarray(bucket.frame, dtype=np.int32)
    R64 = np.ascontiguousarray(R, dtype=np.float64)
    p64 = np.ascontiguousarray(p, dtype=np.float64)
    V, K = n.shape
    resid = np.zeros(1, dtype=np.float64)
    g = np.zeros(6 * W, dtype=np.float64)
    H = np.zeros((6 * W, 6 * W), dtype=np.float64)
    lib.lvba_plane_cgh(
        n.ctypes.data_as(ctypes.c_void_p),
        mu.ctypes.data_as(ctypes.c_void_p),
        Pc.ctypes.data_as(ctypes.c_void_p),
        frame.ctypes.data_as(ctypes.c_void_p),
        V, K,
        R64.ctypes.data_as(ctypes.c_void_p),
        p64.ctypes.data_as(ctypes.c_void_p),
        W, n_threads,
        resid.ctypes.data_as(ctypes.c_void_p),
        g.ctypes.data_as(ctypes.c_void_p),
        H.ctypes.data_as(ctypes.c_void_p),
    )
    return float(resid[0]), g, H


def lm_solve(buckets, R: np.ndarray, p: np.ndarray, W: int,
             max_iters: int = 10, n_threads: int = 0):
    """Full damped-LM solve in optimized C++ over PlaneFactorBucket-likes —
    the honest CPU baseline of the reference's damping_iter
    (/root/reference/include/BALM/bavoxel.hpp:662-767) at any scale.

    Returns (R_opt, p_opt, resid, iters) in f64, or None without the lib.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "lvba_lm_solve"):
        return None
    nb = len(buckets)
    ns = [np.ascontiguousarray(b.n, np.float32) for b in buckets]
    mus = [np.ascontiguousarray(b.mu, np.float32) for b in buckets]
    Pcs = [np.ascontiguousarray(b.Pc, np.float32) for b in buckets]
    frs = [np.ascontiguousarray(b.frame, np.int32) for b in buckets]
    ptr = lambda arrs: (ctypes.c_void_p * nb)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs]
    )
    Vs = np.asarray([b.n.shape[0] for b in buckets], np.int64)
    Ks = np.asarray([b.n.shape[1] for b in buckets], np.int32)
    R64 = np.ascontiguousarray(R, np.float64).copy()
    p64 = np.ascontiguousarray(p, np.float64).copy()
    resid = np.zeros(1, np.float64)
    iters = np.zeros(1, np.int32)
    lib.lvba_lm_solve(
        nb, ptr(ns), ptr(mus), ptr(Pcs), ptr(frs),
        Vs.ctypes.data_as(ctypes.c_void_p), Ks.ctypes.data_as(ctypes.c_void_p),
        R64.ctypes.data_as(ctypes.c_void_p), p64.ctypes.data_as(ctypes.c_void_p),
        W, max_iters, n_threads,
        resid.ctypes.data_as(ctypes.c_void_p),
        iters.ctypes.data_as(ctypes.c_void_p),
    )
    return R64, p64, float(resid[0]), int(iters[0])


def zbuffer(pts: np.ndarray, Rcw: np.ndarray, tcw: np.ndarray, cam,
            out: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """Native min-depth rasterization; float-exact mirror of
    pipeline/depth._zbuffer_host.  Returns (H, W) f32 or None w/o the lib."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "lvba_zbuffer"):
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    R64 = np.ascontiguousarray(Rcw, np.float64)
    t64 = np.ascontiguousarray(tcw, np.float64)
    if out is None:
        out = np.empty((cam.height, cam.width), np.float32)
    lib.lvba_zbuffer(
        pts.ctypes.data_as(ctypes.c_void_p), pts.shape[0],
        R64.ctypes.data_as(ctypes.c_void_p), t64.ctypes.data_as(ctypes.c_void_p),
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        float(cam.k1), float(cam.k2), float(cam.p1), float(cam.p2),
        cam.width, cam.height,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def zbuffer_ranges(pts: np.ndarray, starts: np.ndarray, counts: np.ndarray,
                   Rcw: np.ndarray, tcw: np.ndarray, cam,
                   out: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """Native rasterization straight from CSR ranges of a voxel-grouped
    point array (no per-image gathered copy); result is identical to
    zbuffer(pts[expand(starts, counts)], ...).  None without the lib."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "lvba_zbuffer_ranges"):
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    s64 = np.ascontiguousarray(starts, np.int64)
    c64 = np.ascontiguousarray(counts, np.int64)
    R64 = np.ascontiguousarray(Rcw, np.float64)
    t64 = np.ascontiguousarray(tcw, np.float64)
    if out is None:
        out = np.empty((cam.height, cam.width), np.float32)
    lib.lvba_zbuffer_ranges(
        pts.ctypes.data_as(ctypes.c_void_p),
        s64.ctypes.data_as(ctypes.c_void_p),
        c64.ctypes.data_as(ctypes.c_void_p), s64.shape[0],
        R64.ctypes.data_as(ctypes.c_void_p), t64.ctypes.data_as(ctypes.c_void_p),
        float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy),
        float(cam.k1), float(cam.k2), float(cam.p1), float(cam.p2),
        cam.width, cam.height,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def union_find(n: int, edges: np.ndarray) -> Optional[np.ndarray]:
    """edges: (m, 2) int64 node pairs -> component root label per node."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(edges[:, 0], dtype=np.int64)
    b = np.ascontiguousarray(edges[:, 1], dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    lib.lvba_union_find(
        n,
        a.ctypes.data_as(ctypes.c_void_p),
        b.ctypes.data_as(ctypes.c_void_p),
        a.shape[0],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
