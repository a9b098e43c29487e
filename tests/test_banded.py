"""Banded Cholesky / solves vs dense oracles (ops/banded.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins
from deconv3d_tpu.ops import banded


def _random_banded_spd(rng, L, p):
    """Random SPD matrix with bandwidth exactly ≤ p, returned (dense, bands)."""
    C = rng.standard_normal((L, L))
    A = (C + C.T) / 2
    A[np.abs(np.subtract.outer(np.arange(L), np.arange(L))) > p] = 0.0
    A += np.eye(L) * (2.0 * p + 3.0)  # diagonal dominance ⇒ SPD
    bands = np.zeros((L, p + 1))
    for k in range(p + 1):
        bands[: L - k, k] = np.diag(A, k)
    return A, bands


@pytest.mark.parametrize("L,p", [(12, 2), (30, 4), (17, 1), (9, 0)])
def test_cholesky_and_solves_match_dense(rng, L, p):
    A, bands = _random_banded_spd(rng, L, p)
    R = np.asarray(banded.cholesky_banded(jnp.asarray(bands)))
    Rd = np.zeros((L, L))
    for k in range(p + 1):
        Rd += np.diag(R[: L - k, k], k)
    np.testing.assert_allclose(Rd.T @ Rd, A, rtol=1e-10, atol=1e-9)

    b = rng.standard_normal(L)
    z = np.asarray(banded.solve_transposed_banded(jnp.asarray(R), jnp.asarray(b)))
    np.testing.assert_allclose(Rd.T @ z, b, rtol=1e-9, atol=1e-9)
    x = np.asarray(banded.solve_banded(jnp.asarray(R), jnp.asarray(b)))
    np.testing.assert_allclose(Rd @ x, b, rtol=1e-9, atol=1e-9)


def test_batched_shapes(rng):
    L, p = 20, 3
    denses, bands = zip(*[_random_banded_spd(rng, L, p) for _ in range(6)])
    bands = np.stack(bands).reshape(2, 3, L, p + 1)
    R = np.asarray(banded.cholesky_banded(jnp.asarray(bands)))
    assert R.shape == (2, 3, L, p + 1)
    b = rng.standard_normal((2, 3, L))
    x = np.asarray(banded.solve_banded(jnp.asarray(R), jnp.asarray(b)))
    for i in range(2):
        for j in range(3):
            Rd = np.zeros((L, L))
            for k in range(p + 1):
                Rd += np.diag(R[i, j, : L - k, k], k)
            np.testing.assert_allclose(Rd @ x[i, j], b[i, j], atol=1e-9)


def test_precision_bands_match_dense(rng):
    """A = Mᵀ diag(q) M for the banded LSF matrix."""
    L, lw = 24, 5
    lam = 4750.0 + 1.25 * np.arange(L)
    lsf = ins.GaussianLSF(fwhm=2.0).bank(lam, cdelt=1.25, width=lw)
    q = rng.uniform(0.5, 2.0, (4, L))
    bands = np.asarray(
        banded.precision_bands(jnp.asarray(lsf), jnp.asarray(q))
    )
    M = np.asarray(cv.lsf_matrix(np.asarray(lsf)))
    for i in range(4):
        A = M.T @ (q[i][:, None] * M)
        for k in range(lw):
            np.testing.assert_allclose(
                bands[i, : L - k, k], np.diag(A, k), atol=1e-12,
                err_msg=f"band {k}",
            )
            # beyond-edge entries must be zero
            if k:
                np.testing.assert_allclose(bands[i, L - k :, k], 0.0)


def test_sample_conditional_moments(rng):
    """Sampled mean/cov of N(A⁻¹b, A⁻¹) match the dense analytics."""
    L, p = 10, 3
    A, bands = _random_banded_spd(rng, L, p)
    b = rng.standard_normal(L) * 3
    R = banded.cholesky_banded(jnp.asarray(bands))
    n = 20000
    noise = jnp.asarray(rng.standard_normal((n, L)))
    draws = np.asarray(
        banded.sample_conditional(
            jnp.asarray(R)[None], jnp.asarray(b)[None].repeat(n, 0), noise
        )
    )
    mean_true = np.linalg.solve(A, b)
    cov_true = np.linalg.inv(A)
    err = np.abs(draws.mean(0) - mean_true) / np.sqrt(np.diag(cov_true) / n)
    assert err.max() < 5.0
    cov_emp = np.cov(draws.T)
    np.testing.assert_allclose(cov_emp, cov_true, atol=6 * np.abs(cov_true).max() / np.sqrt(n))


def test_precision_diag_matches_bands(rng):
    L, lw = 17, 5
    lsf = jnp.asarray(rng.random((L, lw)))
    q = jnp.asarray(rng.uniform(0.1, 2.0, (L, 4, 3)))
    got = banded.precision_diag(lsf, q)
    want = jnp.moveaxis(
        banded.precision_bands(lsf, jnp.moveaxis(q, 0, -1))[..., 0], -1, 0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)
