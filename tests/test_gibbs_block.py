"""Blocked-spectrum Gibbs (sampler='gibbs_block', VERDICT r1 next #6).

Three bars: (1) the incremental-state invariant survives blocked commits,
(2) the chain targets the exact posterior (analytic conjugate check),
(3) mixing: ESS/sweep ≥ 5× single-site gibbs on a high-SNR LSF-blurred toy
    (the λ-correlation that throttles any single-site sampler — the
    reference's included — is removed by the joint spectrum draw).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from deconv3d_tpu import Cube, chains as ch
from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm
from test_sampler import _make_toy


def test_block_invariant_and_chi2(rng):
    cube, inst, _ = _make_toy(rng, noise=0.2)
    cfg = sm.RunConfig(max_iterations=40, burn_in=10, seed=6,
                       sampler="gibbs_block", fsf_size=5, lsf_width=5,
                       dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    res = sm.run_sweeps(problem, sm.init_state(problem), 40)
    p, st = problem, res.state
    h = p.f // 2
    conv = cv.convolve_cube(st.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    model = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - st.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
    err = np.abs(np.asarray(model)[w > 0] - np.asarray(conv)[w > 0]).max()
    assert err < 1e-9, err
    np.testing.assert_allclose(
        float(st.chi2), float(sm.full_chi2(problem, st)), rtol=1e-6
    )
    assert np.all(np.asarray(res.accept_trace) == 1.0)


def test_block_matches_analytic_posterior(rng):
    """Independent-spaxel case: the spectrum posterior per spaxel is
    N(A⁻¹ Mᵀ w y, A⁻¹) — compare sampled moments against dense analytics."""
    L, Y, X = 10, 2, 2
    noise = 0.5
    truth = np.zeros((L, Y, X))
    truth[5, 1, 1] = 4.0
    inst = ins.Instrument(fsf=ins.NoFSF(), lsf=ins.GaussianLSF(fwhm=2.0))
    lam = 4750.0 + 1.25 * np.arange(L)
    lsf = inst.lsf.bank(lam, cdelt=1.25, width=5)
    M = np.asarray(cv.lsf_matrix(lsf))
    conv = np.einsum("ml,lyx->myx", M, truth)
    data = conv + noise * rng.standard_normal(conv.shape)
    cube = Cube.from_data(
        data, variance=np.full_like(data, noise**2), crval=4750.0,
        cdelt=1.25, dtype=np.float64,
    )
    cfg = sm.RunConfig(max_iterations=4000, burn_in=500, seed=3,
                       sampler="gibbs_block", lsf_width=5, dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    res = sm.run_sweeps(problem, sm.init_state(problem), 4000)

    A = M.T @ M / noise**2
    cov = np.linalg.inv(A)
    sig = np.sqrt(np.diag(cov))
    pm = np.asarray(sm.posterior_mean(problem, res.state))
    ps = np.asarray(sm.posterior_std(problem, res.state))
    n_eff = 3500.0
    for y in range(Y):
        for x in range(X):
            mean_true = cov @ (M.T @ data[:, y, x]) / noise**2
            z = (pm[:, y, x] - mean_true) / sig
            assert np.abs(z).max() < 5.0 / np.sqrt(n_eff) * np.sqrt(n_eff), z
            assert np.abs(z).mean() < 0.2
            np.testing.assert_allclose(ps[:, y, x], sig, rtol=0.15)


def test_block_ess_beats_single_site(rng):
    """ESS/sweep ≥ 5× single-site gibbs on the high-SNR blurred toy."""
    L, Y, X = 24, 2, 2
    noise = 0.02
    truth = np.zeros((L, Y, X))
    truth[L // 2] = 3.0
    inst = ins.Instrument(fsf=ins.NoFSF(), lsf=ins.GaussianLSF(fwhm=5.0))
    lam = 4750.0 + 1.25 * np.arange(L)
    lsf = inst.lsf.bank(lam, cdelt=1.25, width=13)
    M = np.asarray(cv.lsf_matrix(lsf))
    conv = np.einsum("ml,lyx->myx", M, truth)
    data = conv + noise * rng.standard_normal(conv.shape)
    cube = Cube.from_data(
        data, variance=np.full_like(data, noise**2), crval=4750.0,
        cdelt=1.25, dtype=np.float64,
    )
    n_sweeps, burn = 400, 50
    ess = {}
    for mode in ("gibbs", "gibbs_block"):
        cfg = sm.RunConfig(max_iterations=n_sweeps, burn_in=burn, seed=9,
                           sampler=mode, lsf_width=13, dtype=np.float64,
                           n_monitor=8)
        problem = sm.make_problem(cube, inst, cfg)
        res = sm.run_sweeps(problem, sm.init_state(problem), n_sweeps)
        mon = np.asarray(res.monitor_trace)[burn:]        # [sweeps, K]
        vals = [
            ch.effective_sample_size(mon[None, :, k])
            for k in range(mon.shape[1])
        ]
        ess[mode] = float(np.median(vals))
    ratio = ess["gibbs_block"] / ess["gibbs"]
    assert ratio >= 5.0, (ess, ratio)
