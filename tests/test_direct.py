"""Direct (exact) Gaussian posterior sampler (ops/direct.py) — sampler='direct'.

Pure XLA conv/FFT path, so unlike the Pallas engines everything here runs
in CI: operator adjointness, agreement with the dense normal-equations
oracle, PCG convergence, iid draws matching the analytic posterior with
near-unit ESS, and the Run/chains integration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube
from deconv3d_tpu import chains as ch
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm
from deconv3d_tpu.ops import direct as dr

from test_sampler import _dense_forward_operator, _make_toy


def _problem(rng, L=8, Y=6, X=6, noise=0.5, fsf_fwhm=0.25, lsf_fwhm=1.0,
             fsf_size=3, lsf_width=3, n=200, **cfg_kw):
    truth = np.zeros((L, Y, X))
    truth[L // 2, Y // 2, X // 2] = 4.0
    lam = 4750.0 + 1.25 * np.arange(L)
    fsf = ins.GaussianFSF(fwhm=fsf_fwhm).bank(lam, size=fsf_size,
                                              pixel_scale=0.2)
    lsf = ins.GaussianLSF(fwhm=lsf_fwhm).bank(lam, cdelt=1.25,
                                              width=lsf_width)
    from deconv3d_tpu import convolve as cv

    conv = np.asarray(cv.convolve_cube(
        jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
    data = conv + noise * rng.standard_normal(conv.shape)
    cube = Cube.from_data(data, variance=np.full_like(data, noise**2),
                          crval=4750.0, cdelt=1.25, dtype=np.float64)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=fsf_fwhm),
                          lsf=ins.GaussianLSF(fwhm=lsf_fwhm),
                          pixel_scale=0.2)
    cfg = sm.RunConfig(max_iterations=n, burn_in=0, seed=3,
                       dtype=np.float64, fsf_size=fsf_size,
                       lsf_width=lsf_width, sampler="direct", **cfg_kw)
    p = sm.make_problem(cube, inst, cfg)
    return p, data, fsf, lsf


class TestOperators:
    def test_KT_is_the_adjoint_of_K(self, rng):
        p, *_ = _problem(rng)
        a = jnp.asarray(rng.standard_normal((p.L, p.Y, p.X)))
        b = jnp.asarray(rng.standard_normal((p.L, p.Y, p.X)))
        lhs = float(jnp.sum(dr.apply_K(p, a) * b))
        rhs = float(jnp.sum(a * dr.apply_KT(p, b)))
        assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), 1.0)

    def test_normal_operator_matches_dense_oracle(self, rng):
        p, data, fsf, lsf = _problem(rng)
        K = _dense_forward_operator(p.L, p.Y, p.X, fsf, lsf)
        W = np.eye(p.L * p.Y * p.X) / 0.5**2
        A_dense = K.T @ W @ K
        A = dr.make_normal_operator(p)
        v = rng.standard_normal((p.L, p.Y, p.X))
        got = np.asarray(A(jnp.asarray(v))).ravel()
        want = A_dense @ v.ravel()
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)

    @pytest.mark.parametrize("precond", ["banded", "jacobi"])
    def test_pcg_solves_the_normal_equations(self, rng, precond):
        p, data, fsf, lsf = _problem(rng, direct_precond=precond)
        res = dr.posterior_mean(p)
        assert float(res.rel_residual) <= p.config.direct_tol
        # the solution must satisfy A mu = K^T W d against the dense oracle
        K = _dense_forward_operator(p.L, p.Y, p.X, fsf, lsf)
        W = np.eye(p.L * p.Y * p.X) / 0.5**2
        mean = np.linalg.solve(K.T @ W @ K, K.T @ W @ data.ravel())
        np.testing.assert_allclose(
            np.asarray(res.x).ravel(), mean, rtol=1e-4, atol=1e-5
        )

    def test_banded_preconditioner_beats_jacobi(self, rng):
        """The Fourier-banded preconditioner exists to kill iterations.

        The Fourier model assumes field ≫ kernel; use a 16×16 field with a
        5×5 kernel so the periodic-boundary approximation is meaningful."""
        p, *_ = _problem(rng, Y=16, X=16, fsf_fwhm=0.4, fsf_size=5,
                         lsf_fwhm=2.0, lsf_width=5, direct_maxiter=2000)
        res_b = dr.posterior_mean(p)
        it_banded = int(res_b.iterations)
        assert float(res_b.rel_residual) <= p.config.direct_tol
        p_j = sm.make_problem(
            Cube.from_data(
                np.asarray(p.data_pad[:, p.f // 2 : p.f // 2 + p.Y,
                                      p.f // 2 : p.f // 2 + p.X]),
                variance=np.full((p.L, p.Y, p.X), 0.25),
                crval=4750.0, cdelt=1.25, dtype=np.float64),
            ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.4),
                           lsf=ins.GaussianLSF(fwhm=2.0), pixel_scale=0.2),
            sm.RunConfig(sampler="direct", dtype=np.float64, fsf_size=5,
                         lsf_width=5, direct_precond="jacobi",
                         direct_maxiter=2000),
        )
        it_jacobi = int(dr.posterior_mean(p_j).iterations)
        assert it_banded < it_jacobi / 2, (it_banded, it_jacobi)


@pytest.mark.slow
def test_draws_match_analytic_posterior(rng):
    """iid draws: moments must hit the dense analytic posterior with the
    tight bounds iid statistics allow (no autocorrelation excuses)."""
    n = 400
    p, data, fsf, lsf = _problem(rng, n=n)
    K = _dense_forward_operator(p.L, p.Y, p.X, fsf, lsf)
    W = np.eye(p.L * p.Y * p.X) / 0.5**2
    P = K.T @ W @ K
    cov = np.linalg.inv(P)
    mean = cov @ K.T @ W @ data.ravel()
    sig = np.sqrt(np.diag(cov))

    res = sm.run_sweeps(p, sm.init_state(p), n)
    pm = np.asarray(sm.posterior_mean(p, res.state)).ravel()
    ps = np.asarray(sm.posterior_std(p, res.state)).ravel()
    z = (pm - mean) / (sig / np.sqrt(n))
    # mean of n iid draws: errors are sig/sqrt(n)-scale z-scores
    assert np.abs(z).mean() < 2.0, f"mean|z|={np.abs(z).mean()}"
    assert np.abs(z).max() < 5.0, f"max|z|={np.abs(z).max()}"
    ratio = np.median(ps / sig)
    assert abs(ratio - 1.0) < 0.15, ratio

    # every "sweep" is a fresh sample: flux ESS ~ n (estimator noise floor)
    ess = ch.effective_sample_size(np.asarray(res.flux_trace)[None])
    assert ess > 0.5 * n, ess
    # solver converged on every draw
    assert float(np.asarray(res.accept_trace).min()) == 1.0


def test_state_contract_invariant_and_chi2(rng):
    p, *_ = _problem(rng, n=5)
    res = sm.run_sweeps(p, sm.init_state(p), 5)
    st = res.state
    np.testing.assert_allclose(
        float(st.chi2), float(sm.full_chi2(p, st)), rtol=1e-6
    )
    assert int(st.sweep) == 5
    # segmented == monolithic (key-threaded, deterministic)
    r1 = sm.run_sweeps(p, sm.init_state(p), 2)
    r2 = sm.run_sweeps(p, r1.state, 3)
    np.testing.assert_array_equal(
        np.asarray(r2.state.clean), np.asarray(res.state.clean)
    )


def test_run_facade_and_chains(rng):
    """Run(sampler='direct') end-to-end on a WELL-CONDITIONED toy.

    (On heavily blurred toys the exact flat-prior posterior honestly has
    huge per-voxel variance — the MCMC engines merely under-explore those
    near-null directions — so truth-recovery assertions belong on mild
    blur, where the posterior actually pins the voxels.)"""
    L, Y, X = 8, 6, 6
    truth = np.zeros((L, Y, X))
    truth[4, 3, 3] = 4.0
    from deconv3d_tpu import Run, convolve as cv

    lam = 4750.0 + 1.25 * np.arange(L)
    fsf = ins.GaussianFSF(fwhm=0.25).bank(lam, size=3, pixel_scale=0.2)
    lsf = ins.GaussianLSF(fwhm=1.0).bank(lam, cdelt=1.25, width=3)
    conv = np.asarray(cv.convolve_cube(
        jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
    data = conv + 0.2 * rng.standard_normal(conv.shape)
    cube = Cube.from_data(data, variance=np.full_like(data, 0.04),
                          crval=4750.0, cdelt=1.25, dtype=np.float64)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.25),
                          lsf=ins.GaussianLSF(fwhm=1.0), pixel_scale=0.2)
    run = Run(cube, inst, max_iterations=30, burn_in=0, sampler="direct",
              fsf_size=3, lsf_width=3, dtype=np.float64)
    run.run()
    assert run.problem.config.sampler == "direct"
    m = np.asarray(run.deconvolved_cube().data)
    assert m.shape == truth.shape
    # iid draws on a well-conditioned posterior: voxel recovered tightly
    assert abs(m[4, 3, 3] - truth[4, 3, 3]) < 1.0, m[4, 3, 3]

    mc = ch.run_chains(run.problem, 2, n_sweeps=8)
    d = mc.diagnostics()
    assert np.isfinite(d["rhat_chi2"])


def test_positivity_rejected(rng):
    cube, inst, _ = _make_toy(rng)
    with pytest.raises(ValueError, match="direct"):
        sm.make_problem(
            cube, inst,
            sm.RunConfig(sampler="direct", positivity=True, fsf_size=5,
                         lsf_width=5),
        )


def test_direct_default_burn_in_is_zero():
    """iid draws need no burn-in: the default must not discard half the
    expensive exact samples (ADVICE r2)."""
    cfg = sm.RunConfig(max_iterations=100, sampler="direct")
    assert cfg.resolved_burn_in() == 0
    # explicit burn_in still wins
    cfg2 = sm.RunConfig(max_iterations=100, sampler="direct", burn_in=10)
    assert cfg2.resolved_burn_in() == 10
    # MCMC samplers keep the half-run default
    assert sm.RunConfig(max_iterations=100).resolved_burn_in() == 50


def test_radial_preconditioner_solves_exactly(rng):
    """banded_radial (full-field-scale structure): the posterior mean must
    still satisfy the dense normal equations — binning costs iterations,
    never correctness — and beat jacobi on iteration count."""
    p, data, fsf, lsf = _problem(
        rng, Y=16, X=16, fsf_fwhm=0.4, fsf_size=5, lsf_fwhm=2.0,
        lsf_width=5, direct_maxiter=2000, direct_precond="banded_radial",
    )
    res = dr.posterior_mean(p)
    assert float(res.rel_residual) <= p.config.direct_tol
    K = _dense_forward_operator(p.L, p.Y, p.X, fsf, lsf)
    W = np.eye(p.L * p.Y * p.X) / 0.5**2
    mean = np.linalg.solve(K.T @ W @ K, K.T @ W @ data.ravel())
    # accuracy is set by direct_tol (PCG residual), not by the binning; at
    # rel_residual 1e-6 the solution carries ~1e-4-relative error
    np.testing.assert_allclose(
        np.asarray(res.x).ravel(), mean, rtol=1e-3, atol=1e-4
    )
    p_j = _problem(rng, Y=16, X=16, fsf_fwhm=0.4, fsf_size=5, lsf_fwhm=2.0,
                   lsf_width=5, direct_maxiter=2000,
                   direct_precond="jacobi")[0]
    it_jacobi = int(dr.posterior_mean(p_j).iterations)
    assert int(res.iterations) < it_jacobi / 2, (
        int(res.iterations), it_jacobi
    )


def test_radial_apply_lean_layout_matches(rng, monkeypatch):
    """The memory-lean (λ-chunked, grouped in-place solves) radial layout
    must be numerically identical to the single-shot layout — it exists
    for HBM reasons only (full-field product path OOM'd without it)."""
    p, *_ = _problem(rng, Y=16, X=16, fsf_fwhm=0.4, fsf_size=5,
                     lsf_fwhm=2.0, lsf_width=5,
                     direct_precond="banded_radial")
    state = dr._radial_state(p, 0.0)
    v = jnp.asarray(rng.standard_normal((p.L, p.Y, p.X)))
    ref = np.asarray(dr._radial_apply(p, state, v))
    monkeypatch.setattr(dr, "RADIAL_CHUNK_BYTES", 1)
    monkeypatch.setattr(dr, "RADIAL_CHUNK_L", 3)   # several chunks + remainder
    lean = np.asarray(dr._radial_apply(p, state, v))
    np.testing.assert_allclose(lean, ref, rtol=1e-9, atol=1e-11)


def test_banded_auto_switches_to_radial(rng, monkeypatch):
    p, *_ = _problem(rng)
    monkeypatch.setattr(dr, "BANDED_BYTES_BUDGET", 16)
    calls = {}
    orig = dr._radial_state

    def spy(problem, tau, n_bins=dr.N_RADIAL_BINS):
        calls["radial"] = True
        return orig(problem, tau, n_bins)

    monkeypatch.setattr(dr, "_radial_state", spy)
    dr.make_preconditioner(p, mode="banded")
    assert calls.get("radial")


def test_direct_drops_quad_keeps_mean(rng):
    """HBM: direct problems keep only quad_mean (init jump-scale input)."""
    p, *_ = _problem(rng)
    assert p.quad is None and p.quad_mean is not None
    sm.init_state(p)  # must not touch p.quad


def test_run_map_estimate(rng):
    """Run.map_estimate(): sampler-independent MAP via PCG — must equal
    the MCMC-free posterior_mean solve and recover a well-conditioned
    point source, even on a Run configured for MH sampling."""
    L, Y, X = 8, 6, 6
    truth = np.zeros((L, Y, X))
    truth[4, 3, 3] = 4.0
    from deconv3d_tpu import Run, convolve as cv
    from deconv3d_tpu.ops.direct import posterior_mean

    lam = 4750.0 + 1.25 * np.arange(L)
    fsf = ins.GaussianFSF(fwhm=0.25).bank(lam, size=3, pixel_scale=0.2)
    lsf = ins.GaussianLSF(fwhm=1.0).bank(lam, cdelt=1.25, width=3)
    conv = np.asarray(cv.convolve_cube(
        jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
    data = conv + 0.2 * rng.standard_normal(conv.shape)
    cube = Cube.from_data(data, variance=np.full_like(data, 0.04),
                          crval=4750.0, cdelt=1.25, dtype=np.float64)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.25),
                          lsf=ins.GaussianLSF(fwhm=1.0), pixel_scale=0.2)
    run = Run(cube, inst, max_iterations=10, sampler="mh",
              fsf_size=3, lsf_width=3, dtype=np.float64, direct_tol=1e-10)
    m = run.map_estimate()                        # no .run() needed
    assert isinstance(m, Cube)
    ref = posterior_mean(run.problem, tol=1e-10)
    np.testing.assert_allclose(
        np.asarray(m.data), np.asarray(ref.x), rtol=0, atol=1e-12
    )
    assert abs(float(m.data[4, 3, 3]) - truth[4, 3, 3]) < 1.0
    assert np.asarray(m.wavelengths() == cube.wavelengths()).all()


class TestRidgePrior:
    """prior_precision τ: Gaussian ridge prior c ~ N(0, τ⁻¹I) for direct/MAP.

    Under heavy blur the flat-prior normal operator KᵀWK is near-singular
    and CG stalls at rel≈0.06 in f32 AND f64 with every preconditioner
    (measured on-chip and on CPU, chromatic-Moffat f=9 toy) — the blur-null
    modes are statistically unconstrained.  τ > 0 makes the posterior
    proper and the solve convergent; these tests pin the exactness of the
    modified model against dense oracles.
    """

    def test_operator_and_mean_match_dense_ridge_oracle(self, rng):
        tau = 0.3
        p, data, fsf, lsf = _problem(rng, prior_precision=tau,
                                     direct_tol=1e-10)
        n = p.L * p.Y * p.X
        K = _dense_forward_operator(p.L, p.Y, p.X, fsf, lsf)
        W = np.eye(n) / 0.5**2
        A_dense = K.T @ W @ K + tau * np.eye(n)
        A = dr.make_normal_operator(p)
        v = rng.standard_normal((p.L, p.Y, p.X))
        np.testing.assert_allclose(
            np.asarray(A(jnp.asarray(v))).ravel(), A_dense @ v.ravel(),
            rtol=1e-8, atol=1e-10,
        )
        res = dr.posterior_mean(p)
        assert float(res.rel_residual) <= p.config.direct_tol
        mean = np.linalg.solve(A_dense, K.T @ W @ data.ravel())
        np.testing.assert_allclose(
            np.asarray(res.x).ravel(), mean, rtol=1e-6, atol=1e-8
        )

    @pytest.mark.parametrize("precond", ["banded", "banded_radial", "jacobi"])
    def test_preconditioners_accept_tau(self, rng, precond):
        """+τ must enter every preconditioner mode (it sharpens M⁻¹≈A⁻¹;
        a mode that dropped it would still converge, just slower — so the
        check is the solve itself plus iteration sanity)."""
        tau = 0.5
        p, *_ = _problem(rng, prior_precision=tau, direct_precond=precond,
                         direct_tol=1e-8, direct_maxiter=500)
        res = dr.posterior_mean(p)
        assert float(res.rel_residual) <= 1e-8
        assert int(res.iterations) < 500

    @pytest.mark.slow
    def test_draw_moments_match_ridge_posterior(self, rng):
        """Perturb-and-solve with the prior perturbed too (b += √τ·z₂):
        iid draws from EXACTLY N(A_τ⁻¹KᵀWd, A_τ⁻¹)."""
        tau = 0.5
        n = 400
        p, data, fsf, lsf = _problem(rng, n=n, prior_precision=tau)
        nvox = p.L * p.Y * p.X
        K = _dense_forward_operator(p.L, p.Y, p.X, fsf, lsf)
        W = np.eye(nvox) / 0.5**2
        cov = np.linalg.inv(K.T @ W @ K + tau * np.eye(nvox))
        mean = cov @ K.T @ W @ data.ravel()
        sig = np.sqrt(np.diag(cov))

        res = sm.run_sweeps(p, sm.init_state(p), n)
        pm = np.asarray(sm.posterior_mean(p, res.state)).ravel()
        ps = np.asarray(sm.posterior_std(p, res.state)).ravel()
        z = (pm - mean) / (sig / np.sqrt(n))
        assert np.abs(z).mean() < 2.0, f"mean|z|={np.abs(z).mean()}"
        assert np.abs(z).max() < 5.0, f"max|z|={np.abs(z).max()}"
        ratio = np.median(ps / sig)
        assert abs(ratio - 1.0) < 0.15, ratio
        assert float(np.asarray(res.accept_trace).min()) == 1.0

    def test_ridge_restores_convergence_under_heavy_blur(self, rng):
        """The motivating case: flat prior stalls, a weak ridge converges."""
        kw = dict(Y=16, X=16, L=16, fsf_fwhm=0.9, fsf_size=9,
                  lsf_fwhm=2.0, lsf_width=5, direct_tol=1e-6,
                  direct_maxiter=250)
        p_flat, *_ = _problem(rng, **kw)
        res_flat = dr.posterior_mean(p_flat)
        p_tau, *_ = _problem(rng, prior_precision=1e-2, **kw)
        res_tau = dr.posterior_mean(p_tau)
        assert float(res_tau.rel_residual) <= 1e-6, (
            int(res_tau.iterations), float(res_tau.rel_residual)
        )
        # the flat solve must demonstrate the stall this feature exists for
        assert float(res_flat.rel_residual) > 1e-3, (
            "flat-prior solve converged — tighten the blur in this test"
        )

    def test_prior_rejected_for_mcmc_samplers(self, rng):
        cube, inst, _ = _make_toy(rng)
        for samp in ("mh", "gibbs", "gibbs_block"):
            with pytest.raises(ValueError, match="prior_precision"):
                sm.make_problem(
                    cube, inst,
                    sm.RunConfig(sampler=samp, prior_precision=1.0,
                                 fsf_size=5, lsf_width=5),
                )
        with pytest.raises(ValueError, match="prior_precision"):
            sm.make_problem(
                cube, inst,
                sm.RunConfig(sampler="direct", prior_precision=-1.0,
                             fsf_size=5, lsf_width=5),
            )

    def test_auto_prior_resolution_and_suggestion(self, rng):
        """prior_precision="auto" resolves to rel x mean-weight in
        make_problem; suggest_prior_precision matches and excludes
        masked spaxels from the mean."""
        p, *_ = _problem(rng, prior_precision="auto")
        # _problem noise=0.5 -> w = 1/0.25 = 4 everywhere valid
        assert p.config.prior_precision == pytest.approx(4e-4, rel=1e-5)
        assert dr.suggest_prior_precision(p) == pytest.approx(
            4e-4, rel=1e-5
        )
        # masked spaxels (w=0) must not dilute the mean weight
        from deconv3d_tpu import Cube as _Cube

        L, Y, X = 8, 6, 6
        data = rng.standard_normal((L, Y, X))
        mask = np.zeros((Y, X), bool)
        mask[:3] = True                      # half the spaxels masked
        cube = _Cube.from_data(
            data, variance=np.full_like(data, 0.25), mask=mask,
            crval=4750.0, cdelt=1.25, dtype=np.float64,
        )
        inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.25),
                              lsf=ins.GaussianLSF(fwhm=1.0),
                              pixel_scale=0.2)
        cfg = sm.RunConfig(max_iterations=2, sampler="direct",
                           prior_precision="auto", dtype=np.float64,
                           fsf_size=3, lsf_width=3)
        pm = sm.make_problem(cube, inst, cfg)
        assert pm.config.prior_precision == pytest.approx(4e-4, rel=1e-5)

    def test_auto_prior_restores_convergence(self, rng):
        """The measured tau = 1e-4*wbar default converges where the flat
        prior stalls (same geometry as the stall test above)."""
        kw = dict(Y=16, X=16, L=16, fsf_fwhm=0.9, fsf_size=9,
                  lsf_fwhm=2.0, lsf_width=5, direct_tol=1e-6,
                  direct_maxiter=1000)
        p_auto, *_ = _problem(rng, prior_precision="auto", **kw)
        res = dr.posterior_mean(p_auto)
        assert float(res.rel_residual) <= 1e-6, (
            int(res.iterations), float(res.rel_residual)
        )

    def test_map_estimate_prior_override(self, rng):
        """Ridge MAP on an MCMC-configured Run: the override reaches the
        solve without touching the sampler config."""
        from deconv3d_tpu import Run, convolve as cv

        tau = 0.3
        L, Y, X = 8, 6, 6
        truth = np.zeros((L, Y, X))
        truth[4, 3, 3] = 4.0
        lam = 4750.0 + 1.25 * np.arange(L)
        fsf = ins.GaussianFSF(fwhm=0.25).bank(lam, size=3, pixel_scale=0.2)
        lsf = ins.GaussianLSF(fwhm=1.0).bank(lam, cdelt=1.25, width=3)
        conv = np.asarray(cv.convolve_cube(
            jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
        data = conv + 0.2 * rng.standard_normal(conv.shape)
        cube = Cube.from_data(data, variance=np.full_like(data, 0.04),
                              crval=4750.0, cdelt=1.25, dtype=np.float64)
        inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.25),
                              lsf=ins.GaussianLSF(fwhm=1.0),
                              pixel_scale=0.2)
        run = Run(cube, inst, max_iterations=10, sampler="mh",
                  fsf_size=3, lsf_width=3, dtype=np.float64,
                  direct_tol=1e-10)
        m = run.map_estimate(prior_precision=tau)
        n = L * Y * X
        K = _dense_forward_operator(L, Y, X, fsf, lsf)
        W = np.eye(n) / 0.04
        mean = np.linalg.solve(
            K.T @ W @ K + tau * np.eye(n), K.T @ W @ data.ravel()
        )
        np.testing.assert_allclose(
            np.asarray(m.data).ravel(), mean, rtol=1e-6, atol=1e-8
        )


class TestHostLoopPCG:
    """Host-loop PCG / draw loop (full-field memory layout, ops/direct.py).

    The jitted while_loop PCG program measured 18.2 GB at the full MUSE
    field (memory_analysis on-chip) — the host loop with donated carries is
    how full-field solves/draws fit one chip.  These tests pin its
    EQUALITY to the jitted path on CI-size problems.
    """

    def test_pcg_host_matches_pcg(self, rng):
        p, data, fsf, lsf = _problem(rng, direct_tol=1e-8,
                                     direct_maxiter=400)
        res_jit = dr.posterior_mean(p)
        res_host = dr.posterior_mean_host(p)
        assert float(res_host.rel_residual) <= 1e-8
        # same arithmetic per iteration → same iterate sequence; the only
        # divergence is reduction-order noise across program boundaries
        assert abs(int(res_host.iterations) - int(res_jit.iterations)) <= 1
        np.testing.assert_allclose(
            np.asarray(res_host.x), np.asarray(res_jit.x),
            rtol=1e-6, atol=1e-9,
        )

    def test_pcg_host_with_ridge_and_radial(self, rng):
        p, data, fsf, lsf = _problem(
            rng, Y=16, X=16, fsf_fwhm=0.4, fsf_size=5, lsf_fwhm=2.0,
            lsf_width=5, direct_precond="banded_radial",
            direct_maxiter=2000, prior_precision=0.3,
        )
        res_jit = dr.posterior_mean(p)
        res_host = dr.posterior_mean_host(p)
        assert float(res_host.rel_residual) <= p.config.direct_tol
        np.testing.assert_allclose(
            np.asarray(res_host.x), np.asarray(res_jit.x),
            rtol=1e-5, atol=1e-8,
        )

    def test_precond_tau_gain_cap(self, rng):
        """M-side ridge (direct_precond_tau): resolution rules + the
        solution-invariance contract (τ_m accelerates, never biases)."""
        p, *_ = _problem(rng, prior_precision=0.3)
        tau = dr._tau(p)
        # auto resolved by make_problem to PRECOND_TAU_REL·w̄ (w̄=4.0
        # at this noise), floored by τ at use time
        assert p.config.direct_precond_tau == pytest.approx(
            dr.PRECOND_TAU_REL * 4.0, rel=1e-5)
        assert dr._precond_tau(p, tau) == pytest.approx(
            max(tau, p.config.direct_precond_tau))
        # flat prior: τ_m stays 0 (legacy near-exact preconditioner)
        p_flat, *_ = _problem(rng)
        assert dr._precond_tau(p_flat, 0.0) == 0.0
        # explicit float override honored (max with τ)
        p_ov, *_ = _problem(rng, prior_precision=0.3,
                            direct_precond_tau=7.0)
        assert dr._precond_tau(p_ov, dr._tau(p_ov)) == 7.0
        # solution invariance: a (much) larger τ_m changes iterations,
        # not the converged solution
        res_def = dr.posterior_mean_host(p)
        res_big = dr.pcg_host(
            p_ov, dr.make_normal_operator(p, dr._tau(p))(jnp.ones(
                (p.L, p.Y, p.X), p.config.dtype)), 1e-9, 2000)
        ones = np.ones((p.L, p.Y, p.X))
        np.testing.assert_allclose(np.asarray(res_big.x), ones,
                                   rtol=1e-5, atol=1e-7)
        assert float(res_def.rel_residual) <= p.config.direct_tol

    def test_pcg_host_batch_matches_single_columns(self, rng):
        """K-RHS batched host PCG == K independent pcg_host solves,
        column for column — including a deliberately EASY column (scaled
        preconditioner-friendly rhs) so the per-column convergence mask
        freezes it while the hard columns keep iterating."""
        p, *_ = _problem(rng, direct_tol=1e-8, direct_maxiter=400,
                         prior_precision=0.2)
        keys = jax.random.split(jax.random.PRNGKey(11), 3)
        bs = jnp.stack([dr._b_draw(p, k) for k in keys])
        # column 1: rhs along the operator's stiffest direction — solved
        # in far fewer iterations than the noise-draw columns
        mode = dr._resolve_precond_mode(p, None)
        tau = dr._tau(p)
        A = dr.make_normal_operator(p, tau)
        easy = A(jnp.ones_like(bs[0]))
        bs = bs.at[1].set(easy)
        singles = [dr.pcg_host(p, bs[i], 1e-8, 400) for i in range(3)]
        res = dr.pcg_host_batch(p, bs, 1e-8, 400)
        iters = np.asarray(res.iterations)
        for i, s in enumerate(singles):
            assert abs(int(iters[i]) - int(s.iterations)) <= 1, i
            assert float(res.rel_residual[i]) <= 1e-8
            np.testing.assert_allclose(
                np.asarray(res.x[i]), np.asarray(s.x),
                rtol=1e-6, atol=1e-9,
            )
        # the easy column must have actually frozen early (mask exercised)
        assert int(iters[1]) < int(iters[0])

    def test_host_draw_loop_matches_scan(self, rng):
        """Same RNG splits + same solver ⇒ the same chain, draw for draw."""
        p, *_ = _problem(rng, n=6, direct_tol=1e-9, direct_maxiter=400)
        st0 = sm.init_state(p)
        res_scan = dr.direct_run_sweeps(p, st0, 4)
        res_host = dr.direct_run_sweeps_host(p, sm.init_state(p), 4)
        np.testing.assert_allclose(
            np.asarray(res_host.state.clean),
            np.asarray(res_scan.state.clean), rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(res_host.chi2_trace),
            np.asarray(res_scan.chi2_trace), rtol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(res_host.accept_trace),
            np.asarray(res_scan.accept_trace),
        )
        np.testing.assert_allclose(
            np.asarray(res_host.state.sum_clean),
            np.asarray(res_scan.state.sum_clean), rtol=1e-6, atol=1e-9,
        )
        assert int(res_host.state.sweep) == 4
        assert float(res_host.state.n_kept) == float(res_scan.state.n_kept)

    def test_run_sweeps_routes_to_host_loop(self, rng, monkeypatch):
        """Above the budget run_sweeps must take the host path (and still
        produce the same chain)."""
        import deconv3d_tpu.ops.direct as dmod

        p, *_ = _problem(rng, n=6, direct_tol=1e-9, direct_maxiter=400)
        ref = sm.run_sweeps(p, sm.init_state(p), 3)
        monkeypatch.setattr(dmod, "PCG_WHILE_BYTES_BUDGET", 1)
        calls = {}
        orig = dmod.direct_run_sweeps_host

        def spy(problem, state, n):
            calls["host"] = True
            return orig(problem, state, n)

        monkeypatch.setattr(dmod, "direct_run_sweeps_host", spy)
        res = sm.run_sweeps(p, sm.init_state(p), 3)
        assert calls.get("host")
        np.testing.assert_allclose(
            np.asarray(res.state.clean), np.asarray(ref.state.clean),
            rtol=1e-6, atol=1e-9,
        )

    def test_posterior_mean_auto_routes(self, rng, monkeypatch):
        p, *_ = _problem(rng, direct_tol=1e-8, direct_maxiter=400)
        res_small = dr.posterior_mean_auto(p)
        monkeypatch.setattr(dr, "PCG_WHILE_BYTES_BUDGET", 1)
        res_big = dr.posterior_mean_auto(p)
        np.testing.assert_allclose(
            np.asarray(res_big.x), np.asarray(res_small.x),
            rtol=1e-6, atol=1e-9,
        )


def test_masked_spaxels_frozen_and_ignored(rng):
    """C8 × direct: masked spaxels must (a) stay exactly zero in every
    draw and accumulator, and (b) contribute nothing — the chain is
    bit-identical no matter what garbage the masked spaxel's data holds
    (w=0 there and the free mask projects it out of the solve)."""
    L, Y, X = 8, 6, 6
    my, mx = 1, 4
    mask = np.zeros((Y, X), bool)
    mask[my, mx] = True

    def run_with(masked_value):
        truth = np.zeros((L, Y, X))
        truth[L // 2, Y // 2, X // 2] = 4.0
        lam = 4750.0 + 1.25 * np.arange(L)
        fsf = ins.GaussianFSF(fwhm=0.25).bank(lam, size=3, pixel_scale=0.2)
        lsf = ins.GaussianLSF(fwhm=1.0).bank(lam, cdelt=1.25, width=3)
        from deconv3d_tpu import convolve as cv

        conv = np.asarray(cv.convolve_cube(
            jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
        data = conv + 0.5 * np.random.default_rng(0).standard_normal(
            conv.shape
        )
        data[:, my, mx] = masked_value
        cube = Cube.from_data(
            data, variance=np.full_like(data, 0.25), mask=mask,
            crval=4750.0, cdelt=1.25, dtype=np.float64,
        )
        inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.25),
                              lsf=ins.GaussianLSF(fwhm=1.0),
                              pixel_scale=0.2)
        cfg = sm.RunConfig(max_iterations=6, burn_in=0, seed=3,
                           dtype=np.float64, fsf_size=3, lsf_width=3,
                           sampler="direct", direct_tol=1e-8)
        p = sm.make_problem(cube, inst, cfg)
        return p, dr.direct_run_sweeps(p, sm.init_state(p), 4)

    p1, r1 = run_with(0.0)
    assert not bool(np.asarray(p1.valid)[my, mx])
    assert np.all(np.asarray(r1.accept_trace) == 1.0)
    assert np.all(np.asarray(r1.state.clean)[:, my, mx] == 0.0)
    assert np.all(np.asarray(r1.state.sum_clean)[:, my, mx] == 0.0)

    _, r2 = run_with(1e6)  # garbage behind the mask changes NOTHING
    np.testing.assert_array_equal(
        np.asarray(r1.state.clean), np.asarray(r2.state.clean)
    )
    assert float(r1.state.chi2) == float(r2.state.chi2)


class TestLeanHostLoop:
    """LEAN full-field segment layout (``direct_run_sweeps_host(lean=True)``).

    At 300×300×3681 the PCG needs every byte of HBM (constants 2.8 +
    carries 3.8 + step temps 4.6 GB measured on-chip 2026-08-18) — the
    standing state's clean/resid (2.7 GB) OOM'd the product path.  Lean
    mode consumes them and carries only sum_clean between draws; these
    tests pin its equality to the jitted scan on CI sizes.
    """

    def test_lean_matches_scan(self, rng):
        p, *_ = _problem(rng, n=6, direct_tol=1e-9, direct_maxiter=400)
        res_scan = dr.direct_run_sweeps(p, sm.init_state(p), 4)
        res_lean = dr.direct_run_sweeps_host(
            p, sm.init_state(p), 4, lean=True
        )
        for attr in ("clean", "resid", "sum_clean"):
            np.testing.assert_allclose(
                np.asarray(getattr(res_lean.state, attr)),
                np.asarray(getattr(res_scan.state, attr)),
                rtol=1e-6, atol=1e-9,
            )
        np.testing.assert_allclose(
            np.asarray(res_lean.chi2_trace),
            np.asarray(res_scan.chi2_trace), rtol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(res_lean.accept_trace),
            np.asarray(res_scan.accept_trace),
        )
        np.testing.assert_allclose(
            np.asarray(res_lean.flux_trace),
            np.asarray(res_scan.flux_trace), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(res_lean.monitor_trace),
            np.asarray(res_scan.monitor_trace), rtol=1e-6, atol=1e-12,
        )
        assert int(res_lean.state.sweep) == 4
        assert float(res_lean.state.chi2) == pytest.approx(
            float(res_scan.state.chi2), rel=1e-6
        )
        assert float(res_lean.state.n_accept) == pytest.approx(
            float(res_scan.state.n_accept)
        )
        assert float(res_lean.state.n_kept) == float(res_scan.state.n_kept)

    def test_lean_consumes_incoming_state_and_chains_segments(self, rng):
        """Segmented lean runs thread state exactly like one long segment;
        the incoming segment state is consumed (documented donation)."""
        p, *_ = _problem(rng, n=6, direct_tol=1e-9, direct_maxiter=400)
        res_one = dr.direct_run_sweeps_host(
            p, sm.init_state(p), 4, lean=True
        )
        st = sm.init_state(p)
        res_a = dr.direct_run_sweeps_host(p, st, 2, lean=True)
        assert st.clean.is_deleted() and st.resid.is_deleted()
        res_b = dr.direct_run_sweeps_host(p, res_a.state, 2, lean=True)
        np.testing.assert_allclose(
            np.asarray(res_b.state.clean), np.asarray(res_one.state.clean),
            rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(res_b.state.sum_clean),
            np.asarray(res_one.state.sum_clean), rtol=1e-6, atol=1e-9,
        )
        assert int(res_b.state.sweep) == 4

    def test_lean_tracks_variance(self, rng):
        p, *_ = _problem(rng, n=6, track_variance=True,
                         direct_tol=1e-9, direct_maxiter=400)
        res_scan = dr.direct_run_sweeps(p, sm.init_state(p), 3)
        res_lean = dr.direct_run_sweeps_host(
            p, sm.init_state(p), 3, lean=True
        )
        np.testing.assert_allclose(
            np.asarray(res_lean.state.sum_sq),
            np.asarray(res_scan.state.sum_sq), rtol=1e-6, atol=1e-12,
        )


class TestFullFieldChainsRouting:
    """chains.run_chains at full-field scale (budget-forced): must route
    sampler='direct' through the host-loop/lean layout instead of vmapping
    the monolithic jitted PCG (which measured 18.2 GB on-chip), and must
    reject multi-chain runs there with actionable guidance."""

    def test_single_chain_routes_to_host_loop(self, rng, monkeypatch):
        import deconv3d_tpu.ops.direct as dmod

        p, *_ = _problem(rng, n=6, direct_tol=1e-9, direct_maxiter=400)
        ref = dr.direct_run_sweeps_host(
            p,
            jax.tree_util.tree_map(
                lambda x: x[0], ch.init_chain_states(p, 1)
            ),
            3,
        )
        monkeypatch.setattr(dmod, "PCG_WHILE_BYTES_BUDGET", 1)
        states = ch.init_chain_states(p, 1)
        mc = ch.run_chains(p, 1, n_sweeps=3, states=states)
        assert mc.result.state.clean.shape[0] == 1
        np.testing.assert_allclose(
            np.asarray(mc.result.state.clean[0]),
            np.asarray(ref.state.clean), rtol=1e-6, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(mc.result.chi2_trace[0]),
            np.asarray(ref.chi2_trace), rtol=1e-6,
        )
        # the stacked originals are consumed (documented full-field
        # donation contract — same as the jnp engine's donated path)
        assert states.clean.is_deleted()

    def test_multi_chain_rejected_at_scale(self, rng, monkeypatch):
        import deconv3d_tpu.ops.direct as dmod

        p, *_ = _problem(rng, n=6)
        monkeypatch.setattr(dmod, "PCG_WHILE_BYTES_BUDGET", 1)
        with pytest.raises(ValueError, match="iid"):
            ch.run_chains(p, 2, n_sweeps=2)

    def test_facade_full_field_direct(self, rng, monkeypatch):
        """Run(sampler='direct') with the budget forced tiny: the facade
        must complete segments + save traces through the lean routing."""
        import deconv3d_tpu.ops.direct as dmod
        from deconv3d_tpu import Run

        monkeypatch.setattr(dmod, "PCG_WHILE_BYTES_BUDGET", 1)
        monkeypatch.setattr(dmod, "DIRECT_LEAN_BYTES", 1)
        cube, inst, _ = _make_toy(rng)
        run = Run(cube, inst, max_iterations=4, burn_in=0, seed=2,
                  fsf_size=5, lsf_width=5, dtype=np.float64,
                  sampler="direct", direct_tol=1e-8, direct_maxiter=400)
        run.run()
        assert run.sweeps_done == 4
        assert np.all(np.isfinite(np.asarray(run.states.chi2)))
        assert run.acceptance_rate == 1.0


    def test_multi_chain_shards_per_device_before_rejecting(
        self, rng, monkeypatch
    ):
        """The PCG byte gate is PER-DEVICE: chains shard one-per-device
        over the implicit all-device mesh, so a budget that admits one
        chain per device must not reject n_chains == n_devices (review
        r3 #3); only a genuinely over-budget per-device multiplicity
        raises."""
        import deconv3d_tpu.ops.direct as dmod

        ndev = len(jax.devices())
        if ndev < 2:
            pytest.skip("needs a multi-device backend")
        p, *_ = _problem(rng, n=6, direct_tol=1e-9, direct_maxiter=400)
        bytes1 = dmod._pcg_while_bytes(p)
        monkeypatch.setattr(
            dmod, "PCG_WHILE_BYTES_BUDGET", int(bytes1 * 1.2)
        )
        # one chain per device: admitted (the old gate raised here)
        mc = ch.run_chains(p, ndev, n_sweeps=2)
        assert mc.result.state.clean.shape[0] == ndev
        assert np.all(np.isfinite(np.asarray(mc.result.chi2_trace)))
        # two chains per device: 2x the per-device budget -> rejected
        with pytest.raises(ValueError, match="iid"):
            ch.run_chains(p, 2 * ndev, n_sweeps=2)


def test_radial_bins_validated(rng):
    """direct_radial_bins=0 must raise, not silently become the default
    (review r3)."""
    with pytest.raises(ValueError, match="direct_radial_bins"):
        _problem(rng, direct_radial_bins=0)
    with pytest.raises(ValueError, match="direct_radial_bins"):
        _problem(rng, direct_radial_bins=-4)


def test_precond_state_builder_is_cached(rng):
    """Segmented host-loop runs must reuse the jitted pstate program
    across segments instead of retracing a fresh lambda (review r3)."""
    p, *_ = _problem(rng, n=6, direct_tol=1e-9, direct_maxiter=400)
    states = ch.init_chain_states(p, 1)
    single = jax.tree_util.tree_map(lambda x: x[0], states)
    r1 = dr.direct_run_sweeps_host(p, single, 2)
    n_after_first = dr._precond_state_jit._cache_size()
    r2 = dr.direct_run_sweeps_host(p, r1.state, 2)
    assert dr._precond_state_jit._cache_size() == n_after_first
    assert np.all(np.isfinite(np.asarray(r2.state.chi2)))


class TestDiagScaledPreconditioner:
    """direct_precond_scale: boundary/mask-aware symmetric scaling of the
    Fourier preconditioner (VERDICT r3 next #7 attempt)."""

    @pytest.mark.parametrize("precond", ["banded", "banded_radial"])
    def test_scaled_pcg_reaches_same_solution(self, rng, precond):
        p, data, fsf, lsf = _problem(
            rng, Y=12, X=12, fsf_fwhm=0.4, fsf_size=5, lsf_width=3,
            direct_precond=precond, direct_precond_scale=True,
            direct_maxiter=3000, direct_tol=1e-9,
        )
        res = dr.posterior_mean(p)
        assert float(res.rel_residual) <= p.config.direct_tol
        K = _dense_forward_operator(p.L, p.Y, p.X, fsf, lsf)
        W = np.eye(p.L * p.Y * p.X) / 0.5**2
        mean = np.linalg.solve(K.T @ W @ K, K.T @ W @ data.ravel())
        np.testing.assert_allclose(
            np.asarray(res.x).ravel(), mean, rtol=1e-4, atol=1e-5
        )

    def test_scale_map_shape_and_interior(self, rng):
        """s = 1 in the interior (circulant model exact there), > 1 toward
        boundaries/masks, and masked-heavy fields still produce finite s."""
        mask = np.zeros((16, 16), bool)
        mask[:, :6] = True
        p, *_ = _problem(rng, Y=16, X=16, fsf_fwhm=0.4, fsf_size=5,
                         lsf_width=3, direct_precond_scale=True)
        s = np.asarray(dr._diag_scale_map(p, tau=0.0))
        assert s.shape == (1, p.Y, p.X)
        assert np.all(np.isfinite(s))
        assert np.all(s >= 1.0)
        # corner spaxels see less kernel mass than the centre
        assert s[0, 0, 0] > s[0, p.Y // 2, p.X // 2]

    def test_scaled_state_flows_through_host_pcg(self, rng):
        """The (core, s_map) tuple state must ride the host-loop PCG's
        argument plumbing unchanged."""
        p, *_ = _problem(rng, direct_precond="banded",
                         direct_precond_scale=True)
        b = jnp.asarray(rng.standard_normal((p.L, p.Y, p.X)))
        got = dr.pcg_host(p, b, tol=1e-9, maxiter=2000)
        ref = dr.pcg(dr.make_normal_operator(p), dr.make_preconditioner(p),
                     b * dr._free_mask(p), tol=1e-9, maxiter=2000)
        np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x), rtol=1e-6, atol=1e-8
        )
