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
