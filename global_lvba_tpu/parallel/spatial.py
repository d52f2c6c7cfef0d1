"""Spatial (Morton-range) map-block parallelism with halo exchange.

SURVEY.md §2.3 item 3: for maps that exceed one host's HBM, the voxel map
is partitioned *spatially* — each device owns a contiguous Morton-code
range of root voxels, so a shard is a compact 3-D region of the map, not
an arbitrary slice of the factor list.  Two pieces:

  * `spatial_partition`: reorder/partition already-built factor buckets by
    the Morton code of their voxel centroid and split into per-device
    contiguous ranges (factors stay local to the shard that owns their
    region; the LM reduction over shards is the same psum as factor DP).
  * `distributed_voxel_moments`: TPU-native *distributed voxelization*.
    Points arrive sharded arbitrarily (by frame/arrival); every device
    bins its local points into per-voxel moment partials (count, Σx, Σxxᵀ
    — the PointCluster statistics, /root/reference/include/BALM/
    tools.hpp:407-466); partials for voxels owned by another device —
    the halo — travel around the device ring via `lax.ppermute` and are
    accumulated by their owner.  This replaces the reference's
    single-process hash map (cut_voxel, bavoxel.hpp:799-836) with a
    fixed-shape, collective-based aggregation.

Morton keys use 10 bits/axis (uint32) on device — 1024³ root voxels per
region — so the path works in the f32/int32 production configuration.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

_MBITS = 10
_MOFF = 1 << (_MBITS - 1)


def _part1by2_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x3FF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
    return x


def morton3(coords: np.ndarray) -> np.ndarray:
    """Integer voxel coords (N, 3) -> 30-bit Morton codes (N,) uint32.

    Coords are offset by 2^(bits-1) so negatives pack; out-of-range raises.
    """
    c = coords.astype(np.int64) + _MOFF
    if np.any((c < 0) | (c >= (1 << _MBITS))):
        raise ValueError("voxel coordinates out of Morton range (10 bits/axis)")
    return (
        (_part1by2_np(c[:, 0]) << np.uint64(2))
        | (_part1by2_np(c[:, 1]) << np.uint64(1))
        | _part1by2_np(c[:, 2])
    ).astype(np.uint32)


def _part1by2_jnp(x):
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton3_device(coords: jnp.ndarray) -> jnp.ndarray:
    """Device variant of morton3 (int32 in, uint32 out)."""
    c = coords.astype(jnp.int32) + _MOFF
    return (
        (_part1by2_jnp(c[..., 0].astype(jnp.uint32)) << 2)
        | (_part1by2_jnp(c[..., 1].astype(jnp.uint32)) << 1)
        | _part1by2_jnp(c[..., 2].astype(jnp.uint32))
    )


# ---------------------------------------------------------------------------
# Factor-bucket spatial partitioning
# ---------------------------------------------------------------------------


def spatial_partition(
    centers: np.ndarray,
    voxel_size: float,
    n_shards: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Assign each voxel (by world centroid) to a Morton-range shard.

    Returns (order, shard_of_voxel): `order` sorts voxels into Morton
    order; splitting the sorted list into `n_shards` equal chunks gives
    each device one contiguous 3-D region (balanced by voxel count).
    """
    coords = np.floor(np.asarray(centers) / voxel_size).astype(np.int64)
    codes = morton3(coords)
    order = np.argsort(codes, kind="stable")
    V = order.shape[0]
    shard_of_sorted = np.minimum(
        (np.arange(V) * n_shards) // max(V, 1), n_shards - 1
    )
    shard_of_voxel = np.empty(V, dtype=np.int32)
    shard_of_voxel[order] = shard_of_sorted.astype(np.int32)
    return order, shard_of_voxel


def partition_buckets_morton(vm, n_shards: int):
    """Reorder every factor bucket of a VoxelMap so voxel rows are grouped
    by Morton-range shard: rows [i*ceil(V/n) : (i+1)*ceil(V/n)) of the
    padded bucket belong to shard i's spatial region.  Padding rows
    (n == 0) are dead weight distributed round-robin.

    The per-bucket voxel centroid is recovered from the per-frame means of
    the bucket itself (world-frame mean over observations at the build
    poses is not stored; the body-frame mean of the densest observation is
    a sufficient spatial proxy for range partitioning)."""
    from ..map.voxelize import PlaneFactorBucket

    out = []
    for b in vm.buckets:
        # proxy centroid: weighted mean of per-frame body means (the
        # partition only needs a stable spatial key, not exact world pos)
        w = b.n / np.maximum(b.n.sum(axis=1, keepdims=True), 1e-9)
        cent = np.einsum("vk,vki->vi", w, b.mu)
        order, _ = spatial_partition(cent, 1.0, n_shards)
        out.append(
            PlaneFactorBucket(
                n=b.n[order], mu=b.mu[order], Pc=b.Pc[order], frame=b.frame[order]
            )
        )
    return out


# ---------------------------------------------------------------------------
# Distributed voxelization with halo exchange (ppermute ring)
# ---------------------------------------------------------------------------


def _local_bin(pts, keys, capacity):
    """Reduce (key -> count, Σx, Σxxᵀ) over local points into `capacity`
    slots, sorted by key; empty slots carry key = 0xFFFFFFFF."""
    order = jnp.argsort(keys)
    sk = keys[order]
    sp = pts[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    )
    seg = jnp.cumsum(first) - 1                   # segment id per point
    cnt = jax.ops.segment_sum(jnp.ones_like(sk, jnp.float32), seg, capacity)
    s = jax.ops.segment_sum(sp, seg, capacity)
    xx = jnp.stack(
        [
            sp[:, 0] * sp[:, 0], sp[:, 0] * sp[:, 1], sp[:, 0] * sp[:, 2],
            sp[:, 1] * sp[:, 1], sp[:, 1] * sp[:, 2], sp[:, 2] * sp[:, 2],
        ],
        axis=-1,
    )
    m = jax.ops.segment_sum(xx, seg, capacity)
    # key per slot: first point of each segment
    slot_key = jax.ops.segment_max(sk.astype(jnp.uint32), seg, capacity)
    slot_key = jnp.where(cnt > 0, slot_key, jnp.uint32(0xFFFFFFFF))
    return slot_key, cnt, s, m


def distributed_voxel_moments(
    points: np.ndarray,      # (N, 3) world points, arbitrary order
    voxel_size: float,
    mesh: Mesh,
    axis: str = "factors",
    capacity: int = 4096,
):
    """Distributed per-voxel moment accumulation with Morton ownership.

    Points are split evenly across devices (arrival order — the realistic
    ingest layout).  Each device bins its points locally, then a ring of
    `ppermute` steps carries every shard's partial table past every owner;
    owners accumulate entries whose Morton code falls in their range.
    Returns host arrays (keys, count, Σx, Σxxᵀ) of the merged map,
    identical to a single-process binning.
    """
    n = mesh.shape[axis]
    N = points.shape[0]
    Np = ((N + n - 1) // n) * n
    pts = np.zeros((Np, 3), np.float32)
    pts[:N] = points
    wmask = np.zeros((Np,), np.float32)
    wmask[:N] = 1.0
    coords = np.floor(pts / voxel_size).astype(np.int64)
    keys = morton3(coords)
    # padded points get the invalid key so they reduce into a dead slot
    keys[N:] = 0xFFFFFFFF

    # Morton ownership ranges: equal key-space split (static)
    # owner(key) = min(key * n // 2^30, n-1)
    key_space = 1 << 30

    pspec = P(axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(pspec, pspec, pspec),
        out_specs=(pspec, pspec, pspec, pspec),
    )
    def run(pts_l, keys_l, w_l):
        # mask padded points into the invalid key
        k_l = jnp.where(w_l > 0, keys_l, jnp.uint32(0xFFFFFFFF))
        slot_key, cnt, s, m = _local_bin(pts_l, k_l, capacity)
        me = jax.lax.axis_index(axis)

        # owner(key) = min(key // ceil(key_space/n), n-1): the divisor is a
        # static Python int, so the arithmetic stays inside uint32 — with
        # jax_enable_x64 off (the f32/int32 production config) a k*n
        # formulation would silently wrap for n >= 8 and scramble the
        # Morton-range ownership (ADVICE r2)
        keys_per_owner = (key_space + n - 1) // n

        def owner(k):
            return jnp.minimum(
                (k // jnp.uint32(keys_per_owner)).astype(jnp.int32), n - 1
            )

        def accumulate(acc, table):
            a_key, a_cnt, a_s, a_m = acc
            t_key, t_cnt, t_s, t_m = table
            mine = (owner(t_key) == me) & (t_key != jnp.uint32(0xFFFFFFFF))
            # append owned entries into the accumulator's free slots via
            # sort-merge: concat + re-reduce by key
            k2 = jnp.concatenate([a_key, jnp.where(mine, t_key, jnp.uint32(0xFFFFFFFF))])
            c2 = jnp.concatenate([a_cnt, jnp.where(mine, t_cnt, 0.0)])
            s2 = jnp.concatenate([a_s, jnp.where(mine[:, None], t_s, 0.0)])
            m2 = jnp.concatenate([a_m, jnp.where(mine[:, None], t_m, 0.0)])
            order = jnp.argsort(k2)
            k2, c2, s2, m2 = k2[order], c2[order], s2[order], m2[order]
            first = jnp.concatenate([jnp.ones((1,), bool), k2[1:] != k2[:-1]])
            seg = jnp.cumsum(first) - 1
            cap2 = a_key.shape[0]
            cc = jax.ops.segment_sum(c2, seg, cap2)
            ss = jax.ops.segment_sum(s2, seg, cap2)
            mm = jax.ops.segment_sum(m2, seg, cap2)
            kk = jax.ops.segment_max(k2, seg, cap2)
            kk = jnp.where(cc > 0, kk, jnp.uint32(0xFFFFFFFF))
            return (kk, cc, ss, mm)

        # start with own owned entries
        zero = (
            jnp.full((capacity,), 0xFFFFFFFF, jnp.uint32),
            jnp.zeros((capacity,), jnp.float32),
            jnp.zeros((capacity, 3), jnp.float32),
            jnp.zeros((capacity, 6), jnp.float32),
        )
        acc = accumulate(zero, (slot_key, cnt, s, m))
        # ring: pass the local partial table around n-1 times
        table = (slot_key, cnt, s, m)
        perm = [(i, (i + 1) % n) for i in range(n)]
        for _ in range(n - 1):
            table = tuple(jax.lax.ppermute(t, axis, perm) for t in table)
            acc = accumulate(acc, table)
        kk, cc, ss, mm = acc
        return kk[None], cc[None], ss[None], mm[None]

    # place inputs sharded
    shard = NamedSharding(mesh, P(axis))
    pts_d = jax.device_put(jnp.asarray(pts), shard)
    keys_d = jax.device_put(jnp.asarray(keys, jnp.uint32), shard)
    w_d = jax.device_put(jnp.asarray(wmask), shard)
    kk, cc, ss, mm = run(pts_d, keys_d, w_d)
    # merge shard tables on host (each voxel appears on exactly one owner)
    kk = np.asarray(kk).reshape(-1)
    cc = np.asarray(cc).reshape(-1)
    ss = np.asarray(ss).reshape(-1, 3)
    mm = np.asarray(mm).reshape(-1, 6)
    # overflow guard: segment_sum silently drops ids >= capacity, so a
    # shard (or an owner's merged table) with more than `capacity` unique
    # voxels would lose moments with no signal.  Every valid point lands in
    # exactly one owned slot, so the accumulated count must equal N.
    total = float(cc.sum(dtype=np.float64))
    if not np.isclose(total, float(N), rtol=0.0, atol=0.5):
        raise ValueError(
            f"distributed_voxel_moments capacity overflow: accumulated "
            f"{total:.0f} of {N} points — a shard exceeded capacity="
            f"{capacity} unique voxels; raise `capacity`"
        )
    live = kk != 0xFFFFFFFF
    order = np.argsort(kk[live], kind="stable")
    return kk[live][order], cc[live][order], ss[live][order], mm[live][order]


def host_voxel_moments(points: np.ndarray, voxel_size: float):
    """Single-process reference binning for validation."""
    coords = np.floor(points / voxel_size).astype(np.int64)
    keys = morton3(coords)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    sp = points[order].astype(np.float64)
    first = np.concatenate([[True], sk[1:] != sk[:-1]])
    starts = np.flatnonzero(first)
    ukeys = sk[starts]
    cnt = np.diff(np.append(starts, sk.shape[0])).astype(np.float64)
    s = np.add.reduceat(sp, starts, axis=0)
    xx = np.stack(
        [
            sp[:, 0] * sp[:, 0], sp[:, 0] * sp[:, 1], sp[:, 0] * sp[:, 2],
            sp[:, 1] * sp[:, 1], sp[:, 1] * sp[:, 2], sp[:, 2] * sp[:, 2],
        ],
        axis=-1,
    )
    m = np.add.reduceat(xx, starts, axis=0)
    return ukeys, cnt, s, m
