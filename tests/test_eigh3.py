import numpy as np
import jax.numpy as jnp

from global_lvba_tpu.ops.eigh3 import eigh3x3


def rand_sym(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(scale=scale, size=(n, 3, 3))
    return 0.5 * (A + np.swapaxes(A, 1, 2))


class TestEigh3:
    def test_eigenvalues_match_numpy(self):
        A = rand_sym(500)
        lams, U = eigh3x3(jnp.asarray(A))
        lref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(lams), lref, atol=1e-9)

    def test_eigenvectors_are_eigenvectors(self):
        A = rand_sym(500, seed=1)
        lams, U = eigh3x3(jnp.asarray(A))
        lams, U = np.asarray(lams), np.asarray(U)
        for k in range(3):
            res = np.einsum("nij,nj->ni", A, U[:, :, k]) - lams[:, k : k + 1] * U[:, :, k]
            assert np.max(np.abs(res)) < 1e-8

    def test_orthonormal(self):
        A = rand_sym(200, seed=2)
        _, U = eigh3x3(jnp.asarray(A))
        UtU = np.einsum("nij,nik->njk", np.asarray(U), np.asarray(U))
        np.testing.assert_allclose(UtU, np.tile(np.eye(3), (200, 1, 1)), atol=1e-9)

    def test_planar_covariances(self):
        # thin-plane covariances: the regime the BALM factor lives in
        rng = np.random.default_rng(3)
        mats = []
        for _ in range(100):
            Q = np.linalg.qr(rng.normal(size=(3, 3)))[0]
            d = np.array([1e-6 * rng.uniform(0.5, 2), rng.uniform(0.1, 1), rng.uniform(1, 3)])
            mats.append(Q @ np.diag(d) @ Q.T)
        A = np.stack(mats)
        lams, U = eigh3x3(jnp.asarray(A))
        lref, Uref = np.linalg.eigh(A)
        np.testing.assert_allclose(np.asarray(lams), lref, rtol=1e-5, atol=1e-10)
        # min-eigvec matches up to sign
        dots = np.abs(np.einsum("ni,ni->n", np.asarray(U)[:, :, 0], Uref[:, :, 0]))
        assert np.min(dots) > 1 - 1e-6

    def test_degenerate_pair(self):
        # two equal eigenvalues — eigenvectors must stay orthonormal & valid
        Q = np.linalg.qr(np.random.default_rng(4).normal(size=(3, 3)))[0]
        A = Q @ np.diag([1.0, 1.0, 3.0]) @ Q.T
        lams, U = eigh3x3(jnp.asarray(A[None]))
        lams, U = np.asarray(lams)[0], np.asarray(U)[0]
        np.testing.assert_allclose(lams, [1.0, 1.0, 3.0], atol=1e-9)
        res = A @ U - U * lams[None, :]
        assert np.max(np.abs(res)) < 1e-7

    def test_identity_and_zero(self):
        A = np.stack([np.eye(3), np.zeros((3, 3))])
        lams, U = eigh3x3(jnp.asarray(A))
        assert np.all(np.isfinite(np.asarray(U)))
        np.testing.assert_allclose(np.asarray(lams)[0], [1, 1, 1], atol=1e-12)
        np.testing.assert_allclose(np.asarray(lams)[1], [0, 0, 0], atol=1e-12)

    def test_float32(self):
        A = rand_sym(300, seed=5).astype(np.float32)
        lams, U = eigh3x3(jnp.asarray(A))
        assert lams.dtype == jnp.float32
        lref = np.linalg.eigvalsh(A.astype(np.float64))
        np.testing.assert_allclose(np.asarray(lams), lref, atol=2e-5)
