import numpy as np
import pytest

from global_lvba_tpu.utils.robust import (
    compute_mad,
    pick_largest_cluster_as_inliers,
    preprocess_low_texture_bgr,
)


class TestComputeMAD:
    def test_empty_returns_minus_one(self):
        assert compute_mad([]) == -1.0

    def test_matches_definition(self):
        rng = np.random.default_rng(0)
        r = rng.normal(size=1001)
        # nth_element median == sorted[n//2]
        med = np.sort(r)[r.size // 2]
        mad = np.sort(np.abs(r - med))[r.size // 2] * 1.4826
        assert compute_mad(r) == pytest.approx(mad)

    def test_normal_consistency(self):
        rng = np.random.default_rng(1)
        r = rng.normal(scale=2.5, size=200000)
        assert compute_mad(r) == pytest.approx(2.5, rel=0.02)


class TestPickLargestCluster:
    def test_all_within_returns_all(self):
        pts = np.zeros((5, 3))
        pts += np.linspace(0, 0.05, 5)[:, None]
        out = pick_largest_cluster_as_inliers(pts, [0, 1, 2, 3, 4])
        assert sorted(out.tolist()) == [0, 1, 2, 3, 4]

    def test_single_candidate(self):
        pts = np.zeros((3, 3))
        out = pick_largest_cluster_as_inliers(pts, [2])
        assert out.tolist() == [2]

    def test_bigger_cluster_wins(self):
        pts = np.concatenate([
            np.random.default_rng(2).normal(scale=0.01, size=(8, 3)),
            np.array([[5.0, 5.0, 5.0], [5.01, 5.0, 5.0]]),
        ])
        out = pick_largest_cluster_as_inliers(pts, list(range(10)))
        assert sorted(out.tolist()) == list(range(8))

    def test_smaller_cluster_when_bigger_inconsistent(self):
        rng = np.random.default_rng(3)
        # big cluster is spread over 2 m (inconsistent), small one tight
        big = rng.uniform(-1, 1, size=(7, 3)) * np.array([2.0, 2.0, 2.0])
        small = np.array([[10.0, 0, 0], [10.02, 0, 0]])
        pts = np.concatenate([big, small])
        out = pick_largest_cluster_as_inliers(pts, list(range(9)))
        assert sorted(out.tolist()) == [7, 8]

    def test_no_cluster_consistent_returns_empty(self):
        # two well-separated pairs, each pair internally wider than 0.1 m:
        # 2-means splits into the pairs, both inconsistent -> rule 4
        pts = np.array([
            [0.0, 0, 0], [0.5, 0, 0], [10.0, 0, 0], [10.5, 0, 0],
        ])
        out = pick_largest_cluster_as_inliers(pts, list(range(4)))
        assert out.size == 0


class TestPreprocessLowTexture:
    def test_shape_and_upsample(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(4)
        img = (rng.uniform(100, 140, size=(64, 48, 3))).astype(np.uint8)
        out = preprocess_low_texture_bgr(img)
        assert out.shape == img.shape and out.dtype == np.uint8
        out2 = preprocess_low_texture_bgr(img, enable_x2_upsample=True)
        assert out2.shape == (128, 96, 3)

    def test_contrast_increases_on_low_contrast_input(self):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(5)
        img = (120 + 6 * rng.standard_normal((64, 64, 3))).clip(0, 255)
        img = img.astype(np.uint8)
        out = preprocess_low_texture_bgr(img)
        assert float(out.std()) > float(img.std())
