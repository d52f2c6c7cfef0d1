"""Stage-granular checkpoint/resume.

The reference checkpoints implicitly through files: the COLMAP match.db
short-circuits the frontend, depth maps persist to depth/, outputs at the
end (SURVEY.md §5).  Here every pipeline stage saves its arrays as an .npz
under <out_dir>/checkpoints and is skipped on resume — deterministic
restart at stage granularity."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class StageCheckpoint:
    def __init__(self, out_dir, enable: bool = True):
        self.dir = Path(out_dir) / "checkpoints"
        self.enable = enable
        if enable:
            self.dir.mkdir(parents=True, exist_ok=True)

    def path(self, stage: str) -> Path:
        return self.dir / f"{stage}.npz"

    def has(self, stage: str) -> bool:
        return self.enable and self.path(stage).exists()

    def save(self, stage: str, **arrays):
        if not self.enable:
            return
        meta = {}
        np_arrays = {}
        for k, v in arrays.items():
            if isinstance(v, (int, float, str, bool)):
                meta[k] = v
            elif isinstance(v, (list, tuple)) and v and isinstance(v[0], np.ndarray):
                # ragged list of arrays -> indexed entries
                meta[f"__list__{k}"] = len(v)
                for i, a in enumerate(v):
                    np_arrays[f"{k}__{i}"] = np.asarray(a)
            else:
                np_arrays[k] = np.asarray(v)
        np_arrays["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
        # atomic publish: a crash/kill mid-write must never leave a
        # truncated .npz that has() would report as a valid checkpoint
        # (failure-injection test: tests/test_system.py::TestFailureInjection)
        import os

        # name must keep the .npz suffix (savez appends it otherwise)
        tmp = self.dir / f"{stage}.tmp.npz"
        np.savez_compressed(tmp, **np_arrays)
        os.replace(tmp, self.path(stage))

    def load(self, stage: str) -> Dict:
        data = np.load(self.path(stage), allow_pickle=False)
        meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
        out: Dict = {}
        lists = {
            k[len("__list__"):]: int(v) for k, v in meta.items() if k.startswith("__list__")
        }
        list_entry_keys = set()
        for k, n in lists.items():
            out[k] = [data[f"{k}__{i}"] for i in range(n)]
            list_entry_keys.update(f"{k}__{i}" for i in range(n))
        for k, v in meta.items():
            if not k.startswith("__list__"):
                out[k] = v
        for k in data.files:
            if k == "__meta__" or k in list_entry_keys:
                continue
            out[k] = data[k]
        return out
