import numpy as np
import jax.numpy as jnp

from global_lvba_tpu.ops.pallas.matcher import top2_similarity


class TestPallasMatcher:
    def test_interpret_matches_dense(self):
        rng = np.random.default_rng(0)
        d1 = rng.normal(size=(512, 128)).astype(np.float32)
        d2 = rng.normal(size=(1024, 128)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        vals, idx, colarg = top2_similarity(
            jnp.asarray(d1), jnp.asarray(d2), tm=256, tn=512, interpret=True
        )
        sim = d1 @ d2.T
        top2 = np.sort(sim, axis=1)[:, ::-1][:, :2]
        np.testing.assert_allclose(np.asarray(vals), top2, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), sim.argmax(1))
        np.testing.assert_array_equal(np.asarray(colarg), sim.argmax(0))

    def test_non_tile_multiple_columns(self):
        """Regression: K2 = 768 with tn = 512 used to floor-truncate the
        grid and never scan the last 256 columns (advisor round-1 finding);
        tiles must now shrink to divisors so every column is scanned."""
        rng = np.random.default_rng(2)
        d1 = rng.normal(size=(256, 128)).astype(np.float32)
        d2 = rng.normal(size=(768, 128)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
        # plant the global best matches in the would-be-skipped tail block
        d2[700] = d1[3]
        d2[730] = d1[77]
        vals, idx, colarg = top2_similarity(
            jnp.asarray(d1), jnp.asarray(d2), tm=256, tn=512, interpret=True
        )
        sim = d1 @ d2.T
        np.testing.assert_array_equal(np.asarray(idx), sim.argmax(1))
        np.testing.assert_array_equal(np.asarray(colarg), sim.argmax(0))
        assert int(np.asarray(idx)[3]) == 700
        assert int(np.asarray(idx)[77]) == 730

    def test_small_shapes(self):
        rng = np.random.default_rng(1)
        d1 = rng.normal(size=(256, 128)).astype(np.float32)
        d2 = rng.normal(size=(256, 128)).astype(np.float32)
        vals, idx, colarg = top2_similarity(
            jnp.asarray(d1), jnp.asarray(d2), interpret=True
        )
        sim = d1 @ d2.T
        np.testing.assert_allclose(
            np.asarray(vals)[:, 0], sim.max(1), atol=1e-4
        )
