"""Collective-traffic audit: parse optimized HLO for cross-device ops.

The multi-chip modes are certified numerically by the virtual-device
dryrun (__graft_entry__.dryrun_multichip), but with one physical chip the
SCALING efficiency can only be projected.  This module turns compiled HLO
(from --xla_dump_to or jit(...).lower().compile().as_text()) into
per-module collective counts/bytes, and projects a communication roofline
against measured per-iteration compute times (BASELINE.md ≥80% multi-host
target).  Collectives inside the LM while/fori loop appear ONCE in the
HLO but execute once per iteration — static counts ARE per-iteration
counts for loop-carried modes (plus a constant prologue).
"""

from __future__ import annotations

import os
import re
from typing import Dict

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "pred": 1, "s8": 1, "u8": 1,
}

# "%all-reduce.5 = f32[48,6]{1,0} all-reduce(" / tuple-shaped results
_COLL_RE = re.compile(
    r"=\s*((?:\([^)]*\))|(?:\S+))\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\("
)
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|pred|s8|u8)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of one HLO shape string (tuples supported)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, int]]:
    """{op_kind: {count, bytes}} over one optimized HLO module."""
    out: Dict[str, Dict[str, int]] = {}
    for m in _COLL_RE.finditer(hlo_text):
        shape, op = m.groups()
        d = out.setdefault(op, {"count": 0, "bytes": 0})
        d["count"] += 1
        d["bytes"] += shape_bytes(shape)
    return out


def audit_dump_dir(dump_dir: str) -> Dict[str, Dict]:
    """Aggregate collective stats per module from an --xla_dump_to dir
    (reads *after_optimizations.txt — the HLO that actually executes)."""
    mods: Dict[str, Dict] = {}
    for fn in sorted(os.listdir(dump_dir)):
        if not fn.endswith("after_optimizations.txt"):
            continue
        with open(os.path.join(dump_dir, fn)) as f:
            txt = f.read()
        name = re.sub(r"^module_\d+\.", "", fn).replace(
            ".before_optimizations.txt", "").replace(
            ".after_optimizations.txt", "")
        stats = collective_stats(txt)
        if not stats:
            continue
        total = sum(s["bytes"] for s in stats.values())
        mods[name] = {"ops": stats, "total_bytes": total}
    return mods


def roofline_projection(
    coll_bytes_per_iter: int,
    compute_ms_per_iter: float,
    n_devices: int,
    ici_gbps: float = 100.0,
    dcn_gbps: float = 25.0,
) -> Dict[str, float]:
    """Project scaling efficiency = t_comp / (t_comp + t_comm) for one
    LM iteration, ring-all-reduce traffic model: each device moves
    ~2·S·(n-1)/n bytes for S bytes of all-reduced payload.

    ici_gbps: effective per-chip ICI all-reduce bandwidth (GB/s) — ~100
    for v5e (4 links x ~45 GB/s/dir, derated); dcn_gbps: per-host DCN.
    compute_ms_per_iter is the MEASURED single-chip figure, i.e. the
    perfect-scaling per-device compute at n devices is compute/n."""
    out = {}
    s = 2.0 * coll_bytes_per_iter * (n_devices - 1) / max(n_devices, 1)
    comp = compute_ms_per_iter / n_devices
    for name, bw in (("ici", ici_gbps), ("dcn", dcn_gbps)):
        t_comm = s / (bw * 1e9) * 1e3  # ms
        out[f"{name}_comm_ms"] = round(t_comm, 4)
        out[f"{name}_efficiency_pct"] = round(
            100.0 * comp / (comp + t_comm), 1)
    out["per_device_compute_ms"] = round(comp, 3)
    return out
