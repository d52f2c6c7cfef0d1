"""Batched descriptor matching with SiftGPU-equivalent acceptance rules.

The reference calls SiftMatchGPU::GetSiftMatch(distmax=0.7, ratiomax=0.8,
mutual_best=1) per image pair (/root/reference/src/lvba_system.cpp:803).
SiftGPU's criteria on L2-normalized descriptors: the best match's descriptor
ANGLE acos(d·d') must be < distmax, the angle ratio best/second < ratiomax,
and the pair must be mutual nearest neighbors.

Here the (K1, 128) x (128, K2) dot-product matrix is one MXU matmul; top-2
selection, the angle/ratio tests and the mutual-best check are fused
elementwise ops — one device call per pair, batched over pairs when shapes
allow.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnums=(4, 5))
def match_pair(
    d1: jnp.ndarray, v1: jnp.ndarray,
    d2: jnp.ndarray, v2: jnp.ndarray,
    distmax: float = 0.7,
    ratiomax: float = 0.8,
):
    """Match two descriptor sets. Returns (idx2_for_each_1 (K1,), ok (K1,)).

    d1: (K1, 128), d2: (K2, 128) L2-normalized; v1/v2 validity masks.
    """
    sim = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)
    neg = -2.0
    sim = jnp.where(v1[:, None] & v2[None, :], sim, neg)
    # top-2 per row
    top2, idx2 = jax.lax.top_k(sim, 2)
    best, second = top2[:, 0], top2[:, 1]
    ang1 = jnp.arccos(jnp.clip(best, -1.0, 1.0))
    ang2 = jnp.arccos(jnp.clip(second, -1.0, 1.0))
    ok = (ang1 < distmax) & (ang1 < ratiomax * ang2) & v1
    # mutual best: row i's best j must have i as its best row
    best_col = jnp.argmax(sim, axis=0)      # (K2,)
    j = idx2[:, 0]
    mutual = best_col[j] == jnp.arange(d1.shape[0])
    ok = ok & mutual
    return j, ok


def match_pair_arrays(
    d1: np.ndarray, d2: np.ndarray,
    v1: np.ndarray = None, v2: np.ndarray = None,
    distmax: float = 0.7, ratiomax: float = 0.8,
) -> np.ndarray:
    """Host wrapper: returns (m, 2) int32 match indices."""
    if d1.shape[0] == 0 or d2.shape[0] == 0:
        return np.zeros((0, 2), dtype=np.int32)
    v1 = np.ones(d1.shape[0], bool) if v1 is None else v1
    v2 = np.ones(d2.shape[0], bool) if v2 is None else v2
    j, ok = match_pair(
        jnp.asarray(d1, jnp.float32), jnp.asarray(v1),
        jnp.asarray(d2, jnp.float32), jnp.asarray(v2),
        distmax, ratiomax,
    )
    j = np.asarray(j)
    ok = np.asarray(ok)
    i = np.flatnonzero(ok)
    return np.stack([i, j[i]], axis=-1).astype(np.int32)


def match_all_pairs(
    descs: Sequence[np.ndarray],
    valids: Sequence[np.ndarray],
    pairs: Sequence[Tuple[int, int]],
    distmax: float = 0.7,
    ratiomax: float = 0.8,
    min_matches: int = 0,
) -> Dict[Tuple[int, int], np.ndarray]:
    """Match the given image pairs (the reference matches all O(N²) pairs,
    lvba_system.cpp:462-466)."""
    out: Dict[Tuple[int, int], np.ndarray] = {}
    for (i, j) in pairs:
        m = match_pair_arrays(
            descs[i], descs[j], valids[i], valids[j], distmax, ratiomax
        )
        if m.shape[0] > min_matches:
            out[(i, j)] = m
    return out
