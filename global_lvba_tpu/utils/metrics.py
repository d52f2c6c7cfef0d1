"""Run metrics: per-stage wall/device timers + a registry dumped as JSON.

The reference's observability is ad-hoc std::chrono prints and a VmRSS
probe (SURVEY.md §5); here every pipeline stage records wall time, device
dispatch time (if measured) and arbitrary scalar metrics, and the registry
serializes for the bench/driver."""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, Optional


class MetricsRegistry:
    def __init__(self):
        self.values: Dict[str, float] = {}

    def set(self, key: str, value):
        self.values[key] = value

    def add(self, key: str, value: float):
        self.values[key] = self.values.get(key, 0.0) + value

    def dump(self, path=None) -> str:
        s = json.dumps(self.values, indent=2, default=float)
        if path:
            Path(path).write_text(s)
        return s


class StageTimer:
    """Context-manager timer recording wall time plus memory observability
    per stage (the check_mem analogue the reference sprinkles through the
    solve, /root/reference/include/BALM/bavoxel.hpp:769-795): host VmRSS
    after the stage and the device allocator's cumulative peak — HBM
    limits are a real failure mode here (the W=4096 dense H is 2.4 GB;
    at 8192 it would be 9.7 GB and not fit, hence the compact path)."""

    def __init__(self, registry: Optional[MetricsRegistry] = None):
        self.registry = registry or MetricsRegistry()

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.registry.add(f"time/{name}_s", dt)
            rss = rss_mb()
            if rss >= 0:
                self.registry.set(f"mem/{name}_rss_mb", round(rss, 1))
            hbm = hbm_stats()
            if hbm:
                self.registry.set(
                    f"mem/{name}_hbm_peak_mb",
                    round(hbm.get("peak_bytes_in_use", 0) / 2**20, 1),
                )


def rss_mb() -> float:
    """Resident set size in MB (BALM2::check_mem analogue, bavoxel.hpp:769)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return -1.0


def hbm_stats() -> Dict[str, int]:
    """Device-memory allocator stats for the default device: bytes_in_use
    / peak_bytes_in_use / bytes_limit when the backend exposes them (TPU
    does; CPU returns {}).  The device-side half of check_mem."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        return dict(stats) if stats else {}
    except Exception:
        return {}


def compute_mad(residuals) -> float:
    """Median absolute deviation x 1.4826 (computeMAD, utils.hpp:294-303)."""
    import numpy as np

    r = np.asarray(residuals, dtype=np.float64)
    if r.size == 0:
        return -1.0
    med = np.median(r)
    return float(np.median(np.abs(r - med)) * 1.4826)
