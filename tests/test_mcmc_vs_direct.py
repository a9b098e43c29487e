"""MCMC engines cross-validated against the exact Gaussian posterior.

VERDICT r4 missing #2 / BASELINE.json:5 ("chains statistically matched"):
with the reference unrunnable, the strongest statistical evidence is
internal — the flat-prior posterior is Gaussian with a dense analytic form
at CI scale, so engine moments can be z-tested against EXACT means/vars.

Design: exact-start stationarity test (see benchmarks/mcmc_vs_direct.py's
module docstring).  The miniature field is deliberately nasty — chromatic
Moffat blur with cond(KᵀWK) ≈ 3e10, masked spaxels, per-voxel variance —
which makes within-chain ESS meaningless; chains are therefore STARTED at
iid exact posterior draws (numpy Cholesky of the dense covariance), under
which every chain is stationary from sweep 0 and the C chain-averages give
honest cross-chain standard errors regardless of mixing speed.  A sampler
with the wrong stationary distribution fails; slow mixing cannot produce a
false positive.  The same machinery runs at mid scale on the TPU with
direct-sampler draws as truth (MCMC_VS_DIRECT_r05.json).
"""

import os
import sys

import numpy as np
import pytest

import deconv3d_tpu.sampler as sm
from deconv3d_tpu import Cube

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))
from mcmc_vs_direct import (  # noqa: E402
    add_box_columns, build_field, pooled_mean_z, pooled_var_ratio,
    pooled_var_z, var_dof, with_monitors,
)
from test_sampler import _dense_forward_operator  # noqa: E402


def _make_truth(fwhm, n_chains=8, noise=0.3):
    """Analytic posterior (mean, cov) + exact-draw chain starts."""
    L, Y, X, fsf_size = 24, 10, 10, 5
    cube, inst, sources = build_field(L, Y, X, fsf_size, noise=noise,
                                      fwhm=fwhm)
    cfg = sm.RunConfig(max_iterations=1, seed=0, fsf_size=fsf_size,
                       dtype=np.float64)
    p = sm.make_problem(cube, inst, cfg)
    fsf, lsf = np.asarray(p.fsf), np.asarray(p.lsf)
    K = _dense_forward_operator(L, Y, X, fsf, lsf)
    h = p.f // 2
    w = np.asarray(p.w_pad[:, h:h + Y, h:h + X], np.float64).ravel()
    d = np.asarray(p.data_pad[:, h:h + Y, h:h + X], np.float64).ravel()
    # free voxels: valid spaxels × all λ (masked spaxels are frozen at 0
    # and excluded from the posterior exactly as the samplers freeze them)
    valid = np.asarray(p.valid)[:Y, :X]
    free = np.repeat(valid.ravel()[None], L, axis=0).ravel()
    Kf = K[:, free]
    A = Kf.T @ (w[:, None] * Kf)
    cov = np.linalg.inv(A)
    mean = cov @ (Kf.T @ (w * d))
    # iid exact posterior draws (chain starting points), scattered back
    # into full cubes with frozen voxels at 0
    rng = np.random.default_rng(99)
    Lc = np.linalg.cholesky(cov + 1e-12 * np.eye(cov.shape[0]))
    draws = mean[None] + rng.standard_normal(
        (n_chains, mean.size)) @ Lc.T
    starts = np.zeros((n_chains, L * Y * X), np.float64)
    starts[:, free] = draws
    starts = starts.reshape(n_chains, L, Y, X).astype(np.float32)
    return dict(cube=cube, inst=inst, sources=sources, fsf_size=fsf_size,
                free=free, mean=mean, cov=cov, starts=starts,
                L=L, Y=Y, X=X)


@pytest.fixture(scope="module")
def dense_truth():
    """Heavy blur: cond(KᵀWK) ≈ 3e10 — the bias (mean) test field."""
    return _make_truth(fwhm=0.7)


@pytest.fixture(scope="module")
def dense_truth_mild():
    """Moderate blur: everything mixes in-window — the variance test
    field (sharp z_var needs real within-chain dof, see pooled_var_z)."""
    return _make_truth(fwhm=0.3)


def _monitor_truth(dt, problem, midx, boxes):
    """Exact mean/var of the monitored functionals (incl. box sums)."""
    p = problem
    midx = np.asarray(midx)
    # map padded-grid flat monitor indices -> free-vector positions
    lam = midx // (p.Yc * p.Xc)
    rest = midx % (p.Yc * p.Xc)
    y, x = rest // p.Xc, rest % p.Xc
    full_flat = lam * (dt["Y"] * dt["X"]) + y * dt["X"] + x
    pos_of_full = -np.ones(dt["free"].size, np.int64)
    pos_of_full[np.nonzero(dt["free"])[0]] = np.arange(dt["free"].sum())
    pos = pos_of_full[full_flat]
    assert (pos >= 0).all(), "monitor touched a frozen voxel"
    mu = list(dt["mean"][pos])
    var = list(np.diag(dt["cov"])[pos])
    for b in boxes:
        sel = pos[b]
        mu.append(dt["mean"][sel].sum())
        var.append(float(dt["cov"][np.ix_(sel, sel)].sum()))
    return np.asarray(mu), np.asarray(var)


def _chain_traces(dt, sampler, n_sweeps, coarse_every=None, seed0=300):
    """[C, n, K] exact-start monitor traces (+ box-flux columns)."""
    traces = []
    boxes = problem = None
    for c, start in enumerate(dt["starts"]):
        cfg = sm.RunConfig(max_iterations=n_sweeps, burn_in=0,
                           seed=seed0 + c, sampler=sampler,
                           fsf_size=dt["fsf_size"], initial="data",
                           coarse_every=coarse_every, coarse_mode="global")
        problem, boxes = with_monitors(dt["cube"], dt["inst"], cfg,
                                       dt["sources"], extra=6)
        st = sm.init_state(
            problem, Cube.from_data(start, crval=4750.0, cdelt=1.25))
        r = sm.run_sweeps(problem, st, n_sweeps)
        traces.append(np.asarray(r.monitor_trace))
    return add_box_columns(np.stack(traces), boxes), problem, boxes


@pytest.mark.slow
@pytest.mark.parametrize("sampler,n_sweeps,coarse_every", [
    ("gibbs", 300, None),
    ("mh", 600, None),
    ("mh", 300, 8),     # the coarse passes must preserve the posterior too
])
def test_mcmc_means_match_exact_posterior_heavy_blur(dense_truth, sampler,
                                                     n_sweeps, coarse_every):
    """Bias test on the near-singular field.  Chain means of a Gaussian
    posterior are Gaussian, so the cross-chain t is calibrated at any
    mixing speed; sharp variance assertions are NOT valid here (each slow
    functional's v_c is ~one χ²₁ draw) — those run on the mild field
    below; here the variance check is the gross-scale ratio guard."""
    dt = dense_truth
    tr, p, boxes = _chain_traces(dt, sampler, n_sweeps,
                                 coarse_every=coarse_every)
    mu0, var0 = _monitor_truth(dt, p, p.monitor_idx, boxes)
    z_mean = pooled_mean_z(tr, mu0)
    # 8 chains ⇒ ~7 dof per functional; ~60 functionals.  Under H0
    # max|t₇| stays below 7 w.p. ≫ 99.9%; wrong-posterior bugs measured
    # z in the hundreds on this field.
    assert np.abs(z_mean).max() < 7.0, (np.abs(z_mean).max(), z_mean)
    assert np.quantile(np.abs(z_mean), 0.95) < 4.0, z_mean
    ratio = pooled_var_ratio(tr, mu0, var0)
    # worst case v̄ ~ χ²₈/8 per functional: [0.08, 8] is a >4σ envelope
    assert ratio.min() > 0.08, ratio
    assert ratio.max() < 8.0, ratio


@pytest.mark.slow
@pytest.mark.parametrize("sampler,n_sweeps,min_sharp_frac", [
    ("gibbs", 400, 0.5),
    # random-walk MH decorrelates ~100× slower than exact-conditional
    # gibbs even here; in a CI-sized window only a handful of functionals
    # accumulate ≥64 squared-series dof — the gated scale check still
    # runs on those (plus the full-coverage mean test + ratio guard).
    ("mh", 1200, 0.03),
])
def test_mcmc_moments_match_exact_posterior_mild_blur(dense_truth_mild,
                                                      sampler, n_sweeps,
                                                      min_sharp_frac):
    """Sharp mean AND variance test where within-chain evidence is real
    (moderate conditioning).  A wrong conditional precision or acceptance
    rule shifts z_var directly."""
    dt = dense_truth_mild
    tr, p, boxes = _chain_traces(dt, sampler, n_sweeps)
    mu0, var0 = _monitor_truth(dt, p, p.monitor_idx, boxes)
    z_mean = pooled_mean_z(tr, mu0)
    z_var = pooled_var_z(tr, mu0, var0)
    sharp = var_dof(tr, mu0) >= 64.0
    assert np.abs(z_mean).max() < 7.0, (np.abs(z_mean).max(), z_mean)
    assert np.quantile(np.abs(z_mean), 0.95) < 4.0, z_mean
    assert sharp.mean() >= min_sharp_frac, sharp.mean()
    assert np.abs(z_var[sharp]).max() < 7.0, z_var[sharp]
    assert np.quantile(np.abs(z_var[sharp]), 0.95) < 4.5, z_var[sharp]
    ratio = pooled_var_ratio(tr, mu0, var0)
    assert ratio.min() > 0.08, ratio
    assert ratio.max() < 8.0, ratio


@pytest.mark.slow
def test_direct_draws_match_exact_posterior():
    """The PCG direct sampler vs the dense analytic posterior on the same
    realistic-in-miniature construction (chromatic + masked + weighted),
    at a conditioning where flat-prior CG converges (the heavy-blur
    stall is a documented property, ROADMAP r3 — not retested here)."""
    L, Y, X, fsf_size = 24, 10, 10, 5
    cube, inst, sources = build_field(L, Y, X, fsf_size, noise=0.3,
                                      fwhm=0.3)
    cfg = sm.RunConfig(max_iterations=1, seed=0, fsf_size=fsf_size,
                       dtype=np.float64)
    p = sm.make_problem(cube, inst, cfg)
    K = _dense_forward_operator(L, Y, X, np.asarray(p.fsf),
                                np.asarray(p.lsf))
    h = p.f // 2
    w = np.asarray(p.w_pad[:, h:h + Y, h:h + X], np.float64).ravel()
    d = np.asarray(p.data_pad[:, h:h + Y, h:h + X], np.float64).ravel()
    valid = np.asarray(p.valid)[:Y, :X]
    free = np.repeat(valid.ravel()[None], L, axis=0).ravel()
    Kf = K[:, free]
    A = Kf.T @ (w[:, None] * Kf)
    cov = np.linalg.inv(A)
    mean = cov @ (Kf.T @ (w * d))
    dt = dict(free=free, mean=mean, cov=cov, L=L, Y=Y, X=X)

    n = 192
    cfg = sm.RunConfig(max_iterations=n, burn_in=0, seed=5,
                       sampler="direct", fsf_size=fsf_size,
                       direct_maxiter=5000, direct_tol=1e-6)
    p, boxes = with_monitors(cube, inst, cfg, sources, extra=6)
    mu0, var0 = _monitor_truth(dt, p, p.monitor_idx, boxes)
    r = sm.run_sweeps(p, sm.init_state(p), n)
    assert float(np.asarray(r.accept_trace).min()) == 1.0, "draws unconverged"
    tr = add_box_columns(np.asarray(r.monitor_trace), boxes)
    sig0 = np.sqrt(var0)
    m, s = tr.mean(0), tr.std(0, ddof=1)
    z_mean = (m - mu0) / (sig0 / np.sqrt(n))
    z_std = (s - sig0) / (sig0 / np.sqrt(2.0 * n))
    assert np.abs(z_mean).max() < 5.0, z_mean
    assert np.abs(z_std).max() < 5.0, z_std
