"""ops/truncnorm.py: exact one-sided TN draws at any truncation depth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from deconv3d_tpu.ops.truncnorm import truncated_standard_normal


@pytest.mark.parametrize("alpha", [-3.0, -0.5, 0.0, 1.5, 3.0, 8.0, 50.0,
                                   300.0, 1e4])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_moments_match_analytic(alpha, dtype):
    """Sampled mean/std of TN[alpha, inf) match analytics — including the
    regimes where the probability-space inverse CDF saturates (alpha ≳ 6
    in f32, ≳ 8 in f64: the round-1 clamp produced +10σ junk there)."""
    n = 200_000
    z = np.asarray(truncated_standard_normal(
        jax.random.PRNGKey(0), alpha, (n,), jnp.dtype(dtype)
    ), np.float64)
    assert np.isfinite(z).all()
    assert z.min() >= alpha - 1e-3 * max(1.0, abs(alpha))
    if alpha < 30:
        lam = float(norm.pdf(alpha) / norm.sf(alpha))
        mean_true = lam
        var_true = 1.0 + alpha * lam - lam * lam
    else:
        # 1 + αλ − λ² cancels catastrophically in f64 at large α; use the
        # asymptotic tail moments instead (error O(α⁻⁴))
        mean_true = alpha + 1.0 / alpha - 2.0 / alpha**3
        var_true = 1.0 / alpha**2
    # f32 resolution near huge alpha bounds the achievable tolerance
    tol = 6.0 * np.sqrt(var_true / n) + (
        2e-4 * abs(alpha) if dtype == np.float32 else 0.0
    )
    assert abs(z.mean() - mean_true) < tol, (z.mean(), mean_true)
    # std is meaningless once the conditional width falls below the float's
    # ULP at alpha (z quantizes); that is a representation limit, not bias
    ulp = np.finfo(dtype).eps * max(1.0, abs(alpha))
    if np.sqrt(var_true) > 4 * ulp:
        np.testing.assert_allclose(z.std(), np.sqrt(var_true), rtol=0.05)


def test_quantiles_match_scipy():
    """Full-distribution check at a deep truncation (KS-style, f64)."""
    alpha = 12.0
    n = 100_000
    z = np.asarray(truncated_standard_normal(
        jax.random.PRNGKey(1), alpha, (n,), jnp.float64
    ), np.float64)
    # transform through the true CDF: u must be U(0,1)
    u = 1.0 - np.exp(norm.logsf(z) - norm.logsf(alpha))
    grid = np.linspace(0.05, 0.95, 19)
    emp = np.quantile(u, grid)
    np.testing.assert_allclose(emp, grid, atol=0.01)
