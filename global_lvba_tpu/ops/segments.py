"""Segment reduction helpers for irregular point->voxel aggregation.

The reference accumulates per-voxel point statistics through pointer-chasing
hash maps and octree nodes (bavoxel.hpp:799-836, 391-418).  The TPU-native
equivalent is: sort points by an integer bin key on the host once per stage,
then reduce on device with `jax.ops.segment_sum` over contiguous segment ids
— all static shapes, no hashing on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Thin wrapper over jax.ops.segment_sum with static num_segments."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def run_lengths(sorted_keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side RLE of a sorted key array.

    Returns (unique_keys, start_offsets, counts); segment id per element is
    np.repeat(arange(len(unique)), counts).
    """
    sorted_keys = np.asarray(sorted_keys)
    if sorted_keys.size == 0:
        return (
            sorted_keys[:0],
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
        )
    change = np.empty(sorted_keys.shape[0], dtype=bool)
    change[0] = True
    np.not_equal(sorted_keys[1:], sorted_keys[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, sorted_keys.shape[0]))
    return sorted_keys[starts], starts.astype(np.int64), counts.astype(np.int64)


def ids_from_counts(counts: np.ndarray) -> np.ndarray:
    """Segment id per element given per-segment counts (host)."""
    return np.repeat(np.arange(counts.shape[0], dtype=np.int32), counts)
