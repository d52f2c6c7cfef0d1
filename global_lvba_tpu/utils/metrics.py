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
    """Context-manager timer recording into a registry."""

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


def compute_mad(residuals) -> float:
    """Median absolute deviation x 1.4826 (computeMAD, utils.hpp:294-303)."""
    import numpy as np

    r = np.asarray(residuals, dtype=np.float64)
    if r.size == 0:
        return -1.0
    med = np.median(r)
    return float(np.median(np.abs(r - med)) * 1.4826)
