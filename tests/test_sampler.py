"""Sampler core tests: incremental invariant, masking, statistics (SURVEY §4)."""

import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm
from deconv3d_tpu import convolve as cv


def _make_toy(rng, L=16, Y=6, X=6, fsf_size=5, lsf_width=5, noise=0.1,
              mask=None, dtype=np.float64, fsf_fwhm=0.5, lsf_fwhm=2.0):
    """Synthetic emission-line cube + instrument (BASELINE config-1 style)."""
    truth = np.zeros((L, Y, X))
    truth[L // 2, Y // 2, X // 2] = 5.0
    truth[L // 3, 1, 1] = 3.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=fsf_fwhm), lsf=ins.GaussianLSF(fwhm=lsf_fwhm),
        pixel_scale=0.2,
    )
    cube0 = Cube.from_data(truth, crval=4750.0, cdelt=1.25, dtype=dtype)
    fsf = inst.fsf.bank(cube0.wavelengths(), size=fsf_size, pixel_scale=0.2)
    lsf = inst.lsf.bank(cube0.wavelengths(), cdelt=1.25, width=lsf_width)
    conv = np.asarray(cv.convolve_cube(jnp.asarray(truth), jnp.asarray(fsf),
                                       jnp.asarray(lsf)))
    data = conv + noise * rng.standard_normal(conv.shape)
    cube = Cube.from_data(
        data, variance=np.full_like(data, noise**2), mask=mask,
        crval=4750.0, cdelt=1.25, dtype=dtype,
    )
    return cube, inst, truth


@pytest.fixture
def toy(rng):
    return _make_toy(rng)


def test_incremental_matches_full_conv(toy):
    """THE invariant (SURVEY §4.2): after many accepted local-patch updates,
    data - resid must equal the full FFT re-convolution of the clean cube."""
    cube, inst, _ = toy
    cfg = sm.RunConfig(max_iterations=40, burn_in=10, seed=1, dtype=np.float64,
                       fsf_size=5, lsf_width=5)
    p = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(p)
    res = sm.run_sweeps(p, state, 40)
    state = res.state
    assert float(state.n_accept) > 0, "nothing accepted; test is vacuous"

    h = p.f // 2
    conv = cv.convolve_cube(state.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    model_from_resid = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - state.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
    np.testing.assert_allclose(
        np.asarray(model_from_resid)[w > 0], np.asarray(conv)[w > 0],
        atol=1e-9,
    )
    # running chi² (Kahan) matches from-scratch chi²
    np.testing.assert_allclose(
        float(state.chi2), float(sm.full_chi2(p, state)), rtol=1e-5
    )


def test_chi2_decreases_from_zero_init(toy):
    cube, inst, _ = toy
    cfg = sm.RunConfig(max_iterations=60, burn_in=30, seed=3,
                       dtype=np.float64, fsf_size=5, lsf_width=5)
    p = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(p)
    chi0 = float(state.chi2)
    res = sm.run_sweeps(p, state, 60)
    assert float(res.state.chi2) < chi0
    # chi2 trace is monotone-ish decreasing at the start and finite
    assert np.isfinite(np.asarray(res.chi2_trace)).all()
    # acceptance rate is sane (not stuck at 0 or 1 after adaptation)
    tail_acc = float(np.mean(np.asarray(res.accept_trace)[-10:]))
    assert 0.05 < tail_acc < 0.9


def test_masked_spaxels_frozen(rng):
    mask = np.zeros((6, 6), dtype=bool)
    mask[2, 3] = True
    mask[0, 0] = True
    cube, inst, _ = _make_toy(rng, mask=mask)
    cfg = sm.RunConfig(max_iterations=30, burn_in=10, seed=5,
                       dtype=np.float64, fsf_size=5, lsf_width=5)
    p = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(p)
    res = sm.run_sweeps(p, state, 30)
    clean = np.asarray(res.state.clean)
    assert (clean[:, 2, 3] == 0).all(), "masked spaxel was updated"
    assert (clean[:, 0, 0] == 0).all()
    assert np.abs(clean[:, 3, 3]).max() > 0, "unmasked spaxels should move"
    # chi² must exclude masked spaxels: weights are zero there
    w = np.asarray(p.w_pad)
    h = p.f // 2
    assert (w[:, h + 2, h + 3] == 0).all()


def test_deterministic_same_seed(toy):
    cube, inst, _ = toy
    cfg = sm.RunConfig(max_iterations=20, seed=7, dtype=np.float64,
                       fsf_size=5, lsf_width=5)
    p = sm.make_problem(cube, inst, cfg)
    r1 = sm.run_sweeps(p, sm.init_state(p), 20)
    r2 = sm.run_sweeps(p, sm.init_state(p), 20)
    np.testing.assert_array_equal(np.asarray(r1.state.clean),
                                  np.asarray(r2.state.clean))
    np.testing.assert_array_equal(np.asarray(r1.chi2_trace),
                                  np.asarray(r2.chi2_trace))


def test_segmented_equals_single_run(toy):
    """Checkpoint/resume correctness: 2×15 sweeps == 30 sweeps bit-for-bit."""
    cube, inst, _ = toy
    cfg = sm.RunConfig(max_iterations=30, burn_in=10, seed=11,
                       dtype=np.float64, fsf_size=5, lsf_width=5)
    p = sm.make_problem(cube, inst, cfg)
    full = sm.run_sweeps(p, sm.init_state(p), 30)
    part = sm.run_sweeps(p, sm.init_state(p), 15)
    part2 = sm.run_sweeps(p, part.state, 15)
    np.testing.assert_array_equal(np.asarray(full.state.clean),
                                  np.asarray(part2.state.clean))
    np.testing.assert_array_equal(np.asarray(full.state.sum_clean),
                                  np.asarray(part2.state.sum_clean))


def test_positivity_constraint(rng):
    """positivity=True: reflective proposals keep the clean cube in the
    positive orthant throughout (and still accept at a healthy rate)."""
    cube, inst, _ = _make_toy(rng, noise=0.2)
    cfg = sm.RunConfig(max_iterations=60, burn_in=20, seed=4,
                       dtype=np.float64, fsf_size=5, lsf_width=5,
                       positivity=True, engine="pallas")  # must fall back
    p = sm.make_problem(cube, inst, cfg)
    assert p.config.engine == "jnp", "positivity requires the jnp engine"
    res = sm.run_sweeps(p, sm.init_state(p), 60)
    assert float(res.state.n_accept) > 0
    assert float(jnp.min(res.state.clean)) >= 0.0


class TestGibbsSampler:
    """sampler='gibbs': exact voxel conditionals, acceptance 1 (rebuild-only
    mode; same posterior as 'mh', far better mixing under blur)."""

    def test_invariant_and_unit_acceptance(self, rng):
        cube, inst, _ = _make_toy(rng)
        cfg = sm.RunConfig(max_iterations=30, burn_in=10, seed=2,
                           dtype=np.float64, fsf_size=5, lsf_width=5,
                           sampler="gibbs")
        p = sm.make_problem(cube, inst, cfg)
        res = sm.run_sweeps(p, sm.init_state(p), 30)
        st = res.state
        # every live voxel updates every sweep
        assert float(st.n_accept) == float(st.n_propose) > 0
        h = p.f // 2
        conv = cv.convolve_cube(st.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
        model = (p.data_pad[:, h : h + p.Y, h : h + p.X]
                 - st.resid[:, h : h + p.Y, h : h + p.X])
        w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
        np.testing.assert_allclose(
            np.asarray(model)[w > 0], np.asarray(conv)[w > 0], atol=1e-9
        )
        np.testing.assert_allclose(
            float(st.chi2), float(sm.full_chi2(p, st)), rtol=1e-5
        )

    @pytest.mark.slow
    def test_posterior_matches_analytic(self, rng):
        """Exact-Gibbs hits the analytic posterior (well-conditioned toy,
        same bar as the MH test but in fewer sweeps — acceptance is 1).
        Under strong blur single-site Gibbs still decorrelates slowly
        (measured std ratio 0.81 at 4k sweeps vs MH's 0.34) — that regime
        is covered by test_mixes_faster_than_mh_under_blur."""
        L, Y, X = 8, 4, 4
        noise = 0.5
        truth = np.zeros((L, Y, X))
        truth[4, 2, 2] = 4.0
        lam = 4750.0 + 1.25 * np.arange(L)
        fsf = ins.GaussianFSF(fwhm=0.25).bank(lam, size=3, pixel_scale=0.2)
        lsf = ins.GaussianLSF(fwhm=1.0).bank(lam, cdelt=1.25, width=3)
        conv = np.asarray(cv.convolve_cube(
            jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
        data = conv + noise * rng.standard_normal(conv.shape)
        cube = Cube.from_data(data, variance=np.full_like(data, noise**2),
                              crval=4750.0, cdelt=1.25, dtype=np.float64)
        K = _dense_forward_operator(L, Y, X, fsf, lsf)
        W = np.eye(L * Y * X) / noise**2
        cov = np.linalg.inv(K.T @ W @ K)
        mean = cov @ K.T @ W @ data.ravel()
        sig = np.sqrt(np.diag(cov))

        inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.25),
                              lsf=ins.GaussianLSF(fwhm=1.0), pixel_scale=0.2)
        n = 3000
        cfg = sm.RunConfig(max_iterations=n, burn_in=500, seed=13,
                           dtype=np.float64, fsf_size=3, lsf_width=3,
                           sampler="gibbs")
        p = sm.make_problem(cube, inst, cfg)
        res = sm.run_sweeps(p, sm.init_state(p), n)
        pm = np.asarray(sm.posterior_mean(p, res.state)).ravel()
        ps = np.asarray(sm.posterior_std(p, res.state)).ravel()
        z = (pm - mean) / sig
        assert np.abs(z).mean() < 0.2, f"mean|z|={np.abs(z).mean()}"
        assert np.abs(z).max() < 1.0, f"max|z|={np.abs(z).max()}"
        assert abs(np.median(ps / sig) - 1.0) < 0.1

    def test_mixes_faster_than_mh_under_blur(self, rng):
        from deconv3d_tpu import chains as ch

        cube, inst, _ = _make_toy(rng, L=8, noise=0.3)   # strong blur toy
        n = 400
        ess = {}
        for samp in ("mh", "gibbs"):
            cfg = sm.RunConfig(max_iterations=n, burn_in=100, seed=6,
                               dtype=np.float64, fsf_size=5, lsf_width=5,
                               sampler=samp)
            p = sm.make_problem(cube, inst, cfg)
            res = sm.run_sweeps(p, sm.init_state(p), n)
            ess[samp] = ch.effective_sample_size(
                np.asarray(res.flux_trace)[None, 100:]
            )
        assert ess["gibbs"] > 2 * ess["mh"], ess


def _dense_forward_operator(L, Y, X, fsf, lsf):
    """Dense K [n,n] of the separable forward model (oracle, small dims)."""
    n = L * Y * X
    mat = cv.lsf_matrix(lsf)
    K = np.zeros((n, n))
    eye = np.zeros((L, Y, X))
    for i in range(n):
        eye.flat[i] = 1.0
        spec = np.einsum("ml,lyx->myx", mat, eye)
        out = np.empty_like(spec)
        for l in range(L):
            k = fsf[l] if fsf.shape[0] > 1 else fsf[0]
            out[l] = scipy.signal.fftconvolve(spec[l], k, mode="same")
        K[:, i] = out.ravel()
        eye.flat[i] = 0.0
    return K


@pytest.mark.slow
def test_posterior_matches_analytic(rng):
    """Statistical bar (SURVEY §4.3): chain moments match the analytic
    Gaussian posterior of the linear model (flat prior).

    Kernel widths are chosen so the posterior is only moderately correlated
    (max off-diagonal ρ ≈ 0.34): this verifies *correctness* (zero bias) with
    tight bounds.  Under heavy blur any single-site sampler — the reference's
    serial scan identically — mixes slowly, and moment checks would measure
    autocorrelation time rather than correctness.
    """
    L, Y, X = 8, 4, 4
    noise = 0.5
    truth = np.zeros((L, Y, X))
    truth[4, 2, 2] = 4.0
    lam = 4750.0 + 1.25 * np.arange(L)
    fsf = ins.GaussianFSF(fwhm=0.25).bank(lam, size=3, pixel_scale=0.2)
    lsf = ins.GaussianLSF(fwhm=1.0).bank(lam, cdelt=1.25, width=3)
    conv = np.asarray(
        cv.convolve_cube(jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf))
    )
    data = conv + noise * rng.standard_normal(conv.shape)
    cube = Cube.from_data(data, variance=np.full_like(data, noise**2),
                          crval=4750.0, cdelt=1.25, dtype=np.float64)

    # analytic posterior: N( (KᵀWK)⁻¹KᵀW d,  (KᵀWK)⁻¹ )
    K = _dense_forward_operator(L, Y, X, fsf, lsf)
    W = np.eye(L * Y * X) / noise**2
    P = K.T @ W @ K
    cov = np.linalg.inv(P)
    mean = cov @ K.T @ W @ data.ravel()
    sig = np.sqrt(np.diag(cov))

    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.25),
                          lsf=ins.GaussianLSF(fwhm=1.0), pixel_scale=0.2)
    n_sweeps = 8000
    cfg = sm.RunConfig(max_iterations=n_sweeps, burn_in=1000, seed=13,
                       dtype=np.float64, fsf_size=3, lsf_width=3)
    p = sm.make_problem(cube, inst, cfg)
    res = sm.run_sweeps(p, sm.init_state(p), n_sweeps)
    post_mean = np.asarray(sm.posterior_mean(p, res.state)).ravel()
    post_std = np.asarray(sm.posterior_std(p, res.state)).ravel()

    z = (post_mean - mean) / sig
    # measured: mean|z|≈0.09, max|z|≈0.35, std ratio ≈0.98 across seeds
    assert np.abs(z).mean() < 0.2, f"posterior mean off: mean|z|={np.abs(z).mean()}"
    assert np.abs(z).max() < 1.0, f"max|z|={np.abs(z).max()}"
    ratio = post_std / sig
    assert abs(np.median(ratio) - 1.0) < 0.1, f"median std ratio {np.median(ratio)}"
    # adapted acceptance sits at the 0.234 target
    acc = float(np.mean(np.asarray(res.accept_trace)[-1000:]))
    assert 0.15 < acc < 0.35


def test_adapt_schedule_shape():
    """Robbins-Monro tail (VERDICT r1 weak #4): full rate during burn-in,
    smooth t^-kappa decay after, frozen when adapt_decay is falsy."""
    cfg = sm.RunConfig(max_iterations=100, burn_in=10, adapt_rate=0.1,
                       adapt_decay=0.7)
    ids = jnp.arange(40, dtype=jnp.int32)
    a = np.asarray(sm.adapt_schedule(ids, cfg))
    assert np.allclose(a[:10], 0.1)
    assert np.isclose(a[10], 0.1)              # t=1 right at the boundary
    post = a[10:]
    assert np.all(np.diff(post) < 0)           # strictly decaying
    assert np.isclose(a[19], 0.1 * 10 ** -0.7, rtol=1e-5)
    frozen = np.asarray(sm.adapt_schedule(
        ids, sm.RunConfig(max_iterations=100, burn_in=10, adapt_decay=None)))
    assert np.allclose(frozen[10:], 0.0)


def test_steady_state_acceptance_near_target(rng):
    """Post-burn-in acceptance must hold the 0.234 target (±0.05 band)."""
    cube, inst, _ = _make_toy(rng, noise=0.2)
    cfg = sm.RunConfig(max_iterations=500, burn_in=100, seed=11,
                       fsf_size=5, lsf_width=5, dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    res = sm.run_sweeps(problem, sm.init_state(problem), 500)
    acc_tail = np.asarray(res.accept_trace)[-200:]
    assert 0.18 < acc_tail.mean() < 0.29, acc_tail.mean()


def test_gibbs_positivity_truncated_normal_moments(rng):
    """gibbs+positivity draws exact one-sided truncated normals: on a
    no-PSF problem the voxel posteriors are independent TN(y_i, var)
    truncated at 0 — sampled moments must match the analytic ones
    (VERDICT r1 next #5)."""
    from scipy.stats import norm

    L, Y, X = 6, 2, 2
    var = 1.0
    # include strongly-truncated (negative y) and barely-truncated voxels
    data = rng.normal(0.0, 1.0, (L, Y, X))
    data[0, 0, 0] = -2.0
    data[1, 0, 0] = 0.3
    data[2, 0, 0] = 3.0
    cube = Cube.from_data(
        data, variance=np.full_like(data, var), crval=4750.0, cdelt=1.25,
        dtype=np.float64,
    )
    inst = ins.Instrument(fsf=ins.NoFSF(), lsf=ins.NoLSF())
    cfg = sm.RunConfig(
        max_iterations=6000, burn_in=500, seed=2, sampler="gibbs",
        positivity=True, dtype=np.float64,
    )
    problem = sm.make_problem(cube, inst, cfg)
    res = sm.run_sweeps(problem, sm.init_state(problem), 6000)

    pm = np.asarray(sm.posterior_mean(problem, res.state))
    ps = np.asarray(sm.posterior_std(problem, res.state))
    sig = np.sqrt(var)
    alpha = -data / sig
    lam = norm.pdf(alpha) / norm.sf(alpha)
    mean_true = data + sig * lam
    var_true = var * (1.0 + alpha * lam - lam**2)
    np.testing.assert_allclose(pm, mean_true, atol=4 * np.sqrt(var_true.max() / 5500))
    np.testing.assert_allclose(ps, np.sqrt(var_true), rtol=0.12)
    # positivity: the chain never leaves the positive orthant
    p = problem
    assert float(np.asarray(res.state.clean)[:, : p.Y, : p.X].min()) >= 0.0
    assert pm.min() >= 0.0


def test_gibbs_positivity_invariant(rng):
    """data − resid == conv(clean) must survive truncated draws too."""
    cube, inst, _ = _make_toy(rng, noise=0.2)
    cfg = sm.RunConfig(max_iterations=40, burn_in=10, seed=6, sampler="gibbs",
                       positivity=True, fsf_size=5, lsf_width=5,
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
    assert float(np.asarray(st.clean)[:, : p.Y, : p.X].min()) >= 0.0
    # from-scratch chi2 agrees with the running one
    np.testing.assert_allclose(
        float(st.chi2), float(sm.full_chi2(problem, st)), rtol=1e-6
    )


import pytest as _pytest


@_pytest.mark.parametrize("mode", ["mh", "gibbs", "gibbs_block"])
def test_lambda_chunked_matches_unchunked(rng, mode):
    """lambda_chunk bounds temporaries for huge fields without changing the
    chain beyond ulp-level einsum rounding (XLA may pick a different
    per-shape reduction order, worth ~1 ulp per contraction — measured
    3.6e-15 over 5 f64 sweeps; the RNG stream and accept logic are
    untouched).  Short runs must agree to tight tolerance in every mode."""
    import dataclasses

    cube, inst, _ = _make_toy(rng, noise=0.2)
    cfg = sm.RunConfig(max_iterations=8, burn_in=2, seed=8, sampler=mode,
                       fsf_size=5, lsf_width=5, dtype=np.float64,
                       lambda_chunk=0)
    problem = sm.make_problem(cube, inst, cfg)
    ref = sm.run_sweeps(problem, sm.init_state(problem), 8)
    for lc in (1, 3, 7):
        p2 = dataclasses.replace(
            problem, config=dataclasses.replace(cfg, lambda_chunk=lc))
        res = sm.run_sweeps(p2, sm.init_state(p2), 8)
        np.testing.assert_allclose(
            np.asarray(res.state.clean), np.asarray(ref.state.clean),
            rtol=0, atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(res.state.resid), np.asarray(ref.state.resid),
            rtol=0, atol=1e-11)
        np.testing.assert_allclose(
            np.asarray(res.chi2_trace), np.asarray(ref.chi2_trace),
            rtol=1e-9)


def test_lambda_chunk_autoselects_for_huge_fields():
    """make_problem must turn chunking on automatically above the slab cap."""
    cfg = sm.RunConfig(fsf_size=5, lsf_width=5)
    # small cube: chunking off
    rng = np.random.default_rng(0)
    data = rng.standard_normal((16, 6, 6))
    cube = Cube.from_data(data, variance=np.ones_like(data),
                          crval=4750.0, cdelt=1.25)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.5),
                          lsf=ins.GaussianLSF(fwhm=2.0))
    p = sm.make_problem(cube, inst, cfg)
    assert p.config.lambda_chunk == 0
    # the auto rule itself (no giant allocation needed to check the math):
    # a full MUSE field slab is ~1.4 GB -> chunk ~ 2^28 / (Yc*Xc*4) planes
    itemsize = 4
    Yc = Xc = 306
    expected = max(1, int(2**28 / (Yc * Xc * itemsize)))
    assert 1 <= expected < 3681
