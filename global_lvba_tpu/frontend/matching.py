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


def _pallas_match(d1, v1, d2, v2, distmax, ratiomax, tile=256):
    """TPU fast path via the streaming Pallas kernel.

    Rows/cols pad to tile multiples; two bias feature columns push every
    similarity involving a padded/invalid row OR column to <= -3 (< any
    real dot product), symmetric in both streaming passes, so padding and
    rejected SIFT slots can never win the top-2 or steal the mutual test.
    """
    from ..ops.pallas.matcher import top2_similarity

    K1, K2 = d1.shape[0], d2.shape[0]
    K1p = ((K1 + tile - 1) // tile) * tile
    K2p = ((K2 + tile - 1) // tile) * tile
    D = d1.shape[1]
    Dp = ((D + 2 + 127) // 128) * 128

    def prep(d, v, kp):
        out = np.zeros((kp, Dp), dtype=np.float32)
        out[: d.shape[0], :D] = d
        bias = np.full(kp, -3.0, dtype=np.float32)
        bias[: v.shape[0]][v] = 0.0
        return out, bias

    d1p, b1 = prep(d1, v1, K1p)
    d2p, b2 = prep(d2, v2, K2p)
    # sim = d1·d2 + b1 (row bias) + b2 (col bias): unit column on one side,
    # bias value on the other, in both directions
    d1p[:, D] = 1.0
    d2p[:, D] = b2
    d1p[:, D + 1] = b1
    d2p[:, D + 1] = 1.0
    vals, idx, colarg = top2_similarity(
        jnp.asarray(d1p), jnp.asarray(d2p), tm=tile, tn=512
    )
    vals = np.asarray(vals)[:K1]
    idx = np.asarray(idx)[:K1]
    colarg = np.asarray(colarg)
    ang1 = np.arccos(np.clip(vals[:, 0], -1.0, 1.0))
    ang2 = np.arccos(np.clip(vals[:, 1], -1.0, 1.0))
    ok = (ang1 < distmax) & (ang1 < ratiomax * ang2) & v1[:K1]
    ok &= idx < K2
    mutual = colarg[np.clip(idx, 0, K2p - 1)] == np.arange(K1)
    ok &= mutual
    i = np.flatnonzero(ok)
    return np.stack([i, idx[i]], axis=-1).astype(np.int32)


def match_pair_arrays(
    d1: np.ndarray, d2: np.ndarray,
    v1: np.ndarray = None, v2: np.ndarray = None,
    distmax: float = 0.7, ratiomax: float = 0.8,
    use_pallas: bool = None,
) -> np.ndarray:
    """Host wrapper: returns (m, 2) int32 match indices."""
    if d1.shape[0] == 0 or d2.shape[0] == 0:
        return np.zeros((0, 2), dtype=np.int32)
    v1 = np.ones(d1.shape[0], bool) if v1 is None else np.asarray(v1, bool)
    v2 = np.ones(d2.shape[0], bool) if v2 is None else np.asarray(v2, bool)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and min(
            d1.shape[0], d2.shape[0]
        ) >= 256
    if use_pallas:
        return _pallas_match(d1, v1, d2, v2, distmax, ratiomax)
    j, ok = match_pair(
        jnp.asarray(d1, jnp.float32), jnp.asarray(v1),
        jnp.asarray(d2, jnp.float32), jnp.asarray(v2),
        distmax, ratiomax,
    )
    j = np.asarray(j)
    ok = np.asarray(ok)
    i = np.flatnonzero(ok)
    return np.stack([i, j[i]], axis=-1).astype(np.int32)


@partial(jax.jit, static_argnums=(4, 5))
def _vmatch_chunk(ia, ib, d_all, v_all, distmax, ratiomax):
    """One vmapped chunk of pair matches.  Module-level jit so descriptor
    stacks travel as ARGUMENTS: a per-call closure both retraced every
    match_all_pairs call and baked the descriptors in as constants."""
    return jax.vmap(
        lambda a, b: match_pair(
            d_all[a], v_all[a], d_all[b], v_all[b], distmax, ratiomax
        )
    )(ia, ib)


def match_all_pairs(
    descs: Sequence[np.ndarray],
    valids: Sequence[np.ndarray],
    pairs: Sequence[Tuple[int, int]],
    distmax: float = 0.7,
    ratiomax: float = 0.8,
    min_matches: int = 0,
    chunk: int = 16,
) -> Dict[Tuple[int, int], np.ndarray]:
    """Match the given image pairs (the reference matches all O(N²) pairs,
    lvba_system.cpp:462-466).

    Descriptors upload to device once.  When every image carries the same
    (K, D) slot shape (the built-in SIFT path), pairs are matched in
    vmapped chunks — one device dispatch per `chunk` pairs instead of per
    pair, which matters when each dispatch crosses a network tunnel
    (~25 ms floor measured).  Mixed shapes fall back to per-pair calls.
    """
    dev_d = [jax.device_put(jnp.asarray(d, jnp.float32)) for d in descs]
    dev_v = [jax.device_put(jnp.asarray(v)) for v in valids]
    out: Dict[Tuple[int, int], np.ndarray] = {}
    pairs = [
        (i, j) for (i, j) in pairs
        if descs[i].shape[0] > 0 and descs[j].shape[0] > 0
    ]
    same_shape = len({d.shape for d in descs}) == 1 if descs else False
    if same_shape and len(pairs) > 1:
        d_all = jnp.stack(dev_d)
        v_all = jnp.stack(dev_v)
        for s in range(0, len(pairs), chunk):
            block = pairs[s : s + chunk]
            # pad the chunk to a fixed size so one executable serves all
            padded = block + [block[-1]] * (chunk - len(block))
            ia = jnp.asarray([p[0] for p in padded], jnp.int32)
            ib = jnp.asarray([p[1] for p in padded], jnp.int32)
            jj_c, ok_c = _vmatch_chunk(ia, ib, d_all, v_all, distmax,
                                       ratiomax)
            jj_c = np.asarray(jj_c)
            ok_c = np.asarray(ok_c)
            for bi, (i, j) in enumerate(block):
                ii = np.flatnonzero(ok_c[bi])
                m = np.stack([ii, jj_c[bi][ii]], axis=-1).astype(np.int32)
                if m.shape[0] > min_matches:
                    out[(i, j)] = m
        return out
    for (i, j) in pairs:
        jj, ok = match_pair(dev_d[i], dev_v[i], dev_d[j], dev_v[j], distmax, ratiomax)
        jj = np.asarray(jj)
        ok = np.asarray(ok)
        ii = np.flatnonzero(ok)
        m = np.stack([ii, jj[ii]], axis=-1).astype(np.int32)
        if m.shape[0] > min_matches:
            out[(i, j)] = m
    return out
