"""SIFT frontend stage: image loading, batched extraction, all-pairs match.

The fallback path of extractAndMatchFeaturesGPU (/root/reference/src/
lvba_system.cpp:687-833) when no COLMAP db is usable: extract per image
(cached by timestamp), match every image pair, with SiftGPU-default
acceptance (distmax 0.7, ratio 0.8, mutual best)."""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import LvbaConfig
from ..frontend.matching import match_all_pairs
from ..frontend.sift import SiftParams, extract_sift
from ..utils.progress import progress_bar

log = logging.getLogger("global_lvba_tpu.frontend")


@partial(jax.jit, static_argnums=(1,))
def _batched_extract(stack, params: SiftParams):
    """Batched SIFT extraction through ONE module-level jit: repeat calls
    with equal (batch shape, params) reuse the compiled executable — a
    per-call jit closure retraces the full SIFT graph every invocation."""
    return jax.vmap(lambda im: extract_sift(im, params))(stack)


def load_gray_image(path, width: int, height: int) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    if img.shape[1] != width or img.shape[0] != height:
        img = cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)
    return img.astype(np.float32) / 255.0


def extract_images(
    images: Sequence[np.ndarray],
    params: Optional[SiftParams] = None,
    batch: int = 4,
    device_descs: bool = True,
):
    """Run device SIFT on the images; returns (kps, descs, valids).

    Same-shape images are processed in vmapped batches of `batch` — one
    device program per batch instead of per image.  With
    device_descs=True (default) descriptors and validity masks stay
    DEVICE-resident for the matcher — fetching 2048x128 f32 descriptors
    per image through a tunneled device link costs more than the
    extraction itself; only the (small) keypoint coordinates come home."""
    import jax
    import jax.numpy as jnp

    params = params or SiftParams()
    n = len(images)
    kps: List[np.ndarray] = [None] * n
    descs: List = [None] * n
    valids: List = [None] * n

    done = 0
    i = 0
    while i < n:
        shape = images[i].shape
        j = i
        while j < n and j - i < batch and images[j].shape == shape:
            j += 1
        stack = jnp.asarray(np.stack(images[i:j]), jnp.float32)
        if j - i > 1:
            feats = _batched_extract(stack, params)
        else:
            f = extract_sift(stack[0], params)
            feats = jax.tree_util.tree_map(lambda x: x[None], f)
        xy = np.asarray(feats.xy, np.float32)
        if device_descs:
            # no host fetch of desc/valid at all — each fetched leaf costs
            # a full tunnel round trip per batch
            dd, vv = feats.desc, feats.valid
        else:
            dd = np.asarray(feats.desc, np.float32)
            vv = np.asarray(feats.valid)
        for k in range(i, j):
            kps[k] = xy[k - i]
            descs[k] = dd[k - i]
            valids[k] = vv[k - i]
        done = j
        progress_bar(done, n)
        i = j
    return kps, descs, valids


def extract_images_pipelined(
    paths: Sequence,
    width: int,
    height: int,
    params: Optional[SiftParams] = None,
    batch: int = 4,
    decode_workers: int = 4,
):
    """Pipelined frontend extraction: host-thread image decode overlapped
    with asynchronously-dispatched device extraction batches.

    The pipeline-staging axis of SURVEY.md §2.3 item 4 at the frontend:
    while the device runs extraction batch k, host threads decode the
    images of batch k+1, and NO device->host fetch happens until every
    batch is dispatched (each interim fetch would stall the device queue
    for a full transport round trip).  The last partial batch is padded
    to `batch` so one vmapped executable serves the whole sequence.
    Returns (kps, descs, valids) with descriptors device-resident.
    """
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    params = params or SiftParams()
    n = len(paths)

    feats_batches = []
    with ThreadPoolExecutor(max_workers=decode_workers) as ex:
        futs = [ex.submit(load_gray_image, p, width, height) for p in paths]
        i = 0
        while i < n:
            j = min(i + batch, n)
            stack = np.stack([futs[k].result() for k in range(i, j)])
            if j - i < batch:
                stack = np.concatenate(
                    [stack, np.zeros((batch - (j - i),) + stack.shape[1:],
                                     stack.dtype)]
                )
            feats = _batched_extract(jnp.asarray(stack, jnp.float32), params)
            feats_batches.append((i, j, feats))
            progress_bar(j, n)
            i = j

    kps: List[np.ndarray] = [None] * n
    descs: List = [None] * n
    valids: List = [None] * n
    for (i, j, feats) in feats_batches:
        xy = np.asarray(feats.xy, np.float32)
        for k in range(i, j):
            kps[k] = xy[k - i]
            descs[k] = feats.desc[k - i]
            valids[k] = feats.valid[k - i]
    return kps, descs, valids


def extract_and_match_sift(
    ds,                      # io.dataset.Dataset
    cfg: LvbaConfig,
    params: Optional[SiftParams] = None,
    result_dir=None,
) -> Tuple[List[np.ndarray], Dict[Tuple[int, int], np.ndarray]]:
    """Full frontend from a Dataset: load, extract, match all pairs.

    Returns (keypoints (K, 2) per image restricted to valid slots, matches).
    """
    kps, descs, valids = extract_images_pipelined(
        ds.image_paths, ds.cam.width, ds.cam.height, params
    )
    M = len(kps)
    pairs = [(i, j) for i in range(M) for j in range(i + 1, M)]
    matches = match_all_pairs(descs, valids, pairs)
    # compact to valid keypoints only, remapping match indices
    kps_out: List[np.ndarray] = []
    remaps: List[np.ndarray] = []
    for k in range(M):
        v = np.asarray(valids[k])
        remap = np.full(v.shape[0], -1, np.int64)
        remap[v] = np.arange(v.sum())
        remaps.append(remap)
        kps_out.append(kps[k][v])
    matches_out: Dict[Tuple[int, int], np.ndarray] = {}
    for (i, j), m in matches.items():
        mi = remaps[i][m[:, 0]]
        mj = remaps[j][m[:, 1]]
        ok = (mi >= 0) & (mj >= 0)
        if np.any(ok):
            matches_out[(i, j)] = np.stack([mi[ok], mj[ok]], axis=-1).astype(np.int32)
    if cfg.solver.save_match_images and result_dir is not None:
        # per-pair match visualizations, reference behavior
        # (drawAndSaveMatchesGPU into result/, lvba_system.cpp:823)
        import cv2

        from .outputs import draw_matches

        rdir = Path(result_dir)
        rdir.mkdir(parents=True, exist_ok=True)
        for (i, j), m in matches_out.items():
            img1 = cv2.imread(str(ds.image_paths[i]), cv2.IMREAD_COLOR)
            img2 = cv2.imread(str(ds.image_paths[j]), cv2.IMREAD_COLOR)
            if img1 is None or img2 is None:
                continue
            draw_matches(
                img1, img2, kps_out[i], kps_out[j], m,
                path=rdir / f"matches_{i:04d}_{j:04d}.jpg",
            )
    log.info(
        "[sift] %d images, %d pairs matched, mean kp %.0f",
        M, len(matches_out), np.mean([k.shape[0] for k in kps_out]),
    )
    return kps_out, matches_out
