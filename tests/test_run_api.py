"""Run facade + checkpoint/metrics tests (reference API parity, SURVEY §3)."""

import json

import jax
import os

import numpy as np
import pytest

from deconv3d_tpu import Cube, Run
from deconv3d_tpu import checkpoint as ckpt
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm
from test_sampler import _make_toy


@pytest.fixture
def toy_run(rng):
    cube, inst, truth = _make_toy(rng, noise=0.2)
    return Run(
        cube, inst, max_iterations=60, burn_in=20, seed=3,
        fsf_size=5, lsf_width=5, dtype=np.float64,
    ), truth


def test_run_basic(toy_run):
    run, _ = toy_run
    run.run()
    assert run.sweeps_done == 60
    assert run.chi2 > 0
    assert 0.0 < run.acceptance_rate < 1.0
    dec = run.deconvolved_cube()
    assert dec.shape == run.cube.shape
    conv = run.convolved_cube()
    assert conv.shape == run.cube.shape
    assert run.trace("chi2").shape == (1, 60)


def test_run_recovers_signal(rng):
    """End-to-end config-1 style: recovered cube concentrates flux at truth."""
    cube, inst, truth = _make_toy(
        rng, noise=0.05, fsf_fwhm=0.3, lsf_fwhm=1.2,
    )
    run = Run(cube, inst, max_iterations=400, burn_in=150, seed=1,
              fsf_size=5, lsf_width=5, dtype=np.float64)
    run.run()
    mean = np.asarray(run.deconvolved_cube().data)
    # brightest recovered voxel is the injected one
    assert np.unravel_index(np.abs(mean).argmax(), mean.shape) == (8, 3, 3)
    # chi2/dof is sane
    dof = truth.size
    assert run.chi2 / dof < 2.0


def test_run_from_fits_path(tmp_path, rng):
    cube, inst, _ = _make_toy(rng)
    path = str(tmp_path / "in.fits")
    cube.to_fits(path)
    run = Run(path, inst, max_iterations=10, fsf_size=5, lsf_width=5,
              dtype=np.float64)
    run.run()
    assert run.sweeps_done == 10


def test_run_save_products(tmp_path, toy_run):
    run, _ = toy_run
    run.run()
    base = str(tmp_path / "out")
    run.save(base, plots=True)
    for suffix in ("_clean.fits", "_std.fits", "_convolved.fits",
                   "_traces.npz", "_stats.json", "_chi2.png", "_chain.png",
                   "_images.png"):
        assert os.path.exists(base + suffix), f"missing {suffix}"
    back = Cube.from_fits(base + "_clean.fits")
    assert back.shape == run.cube.shape
    stats = json.load(open(base + "_stats.json"))
    assert stats["sweeps"] == 60
    z = np.load(base + "_traces.npz")
    assert z["chi2"].shape == (1, 60)


def test_run_save_carries_astrometry(tmp_path, rng):
    """Load a MUSE-layout FITS with spatial WCS → Run.save() → every FITS
    product carries the astrometry (VERDICT r3 missing #2)."""
    from deconv3d_tpu.io import fits as fitsio

    cube, inst, _ = _make_toy(rng)
    wcs = {"CRVAL1": 53.16, "CRVAL2": -27.79, "CD1_1": -5.6e-5,
           "CD2_2": 5.6e-5, "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN"}
    path = str(tmp_path / "sky.fits")
    cube.to_fits(path, header_extra=wcs)
    run = Run(path, inst, max_iterations=10, fsf_size=5, lsf_width=5,
              dtype=np.float64)
    run.run()
    base = str(tmp_path / "out")
    run.save(base)
    for suffix in ("_clean.fits", "_std.fits", "_convolved.fits"):
        hdus = fitsio.read(base + suffix)
        dh = [h for h in hdus if h.name == "DATA"][0]
        assert dh.header["CRVAL1"] == pytest.approx(53.16), suffix
        assert dh.header["CTYPE1"] == "RA---TAN", suffix
    # map_estimate's cube carries it too
    assert run.map_estimate().header_dict["CTYPE2"] == "DEC--TAN"


def test_run_segmented_equals_monolithic(rng):
    cube, inst, _ = _make_toy(rng)
    kw = dict(max_iterations=40, burn_in=10, seed=5, fsf_size=5,
              lsf_width=5, dtype=np.float64)
    a = Run(cube, inst, segment_size=7, **kw).run()
    b = Run(cube, inst, **kw).run()
    np.testing.assert_array_equal(
        np.asarray(a.states.clean), np.asarray(b.states.clean)
    )
    np.testing.assert_array_equal(a.trace("chi2"), b.trace("chi2"))


def test_checkpoint_resume_bit_exact(tmp_path, rng):
    cube, inst, _ = _make_toy(rng)
    kw = dict(max_iterations=30, burn_in=10, seed=9, fsf_size=5,
              lsf_width=5, dtype=np.float64)
    path = str(tmp_path / "ck.npz")

    full = Run(cube, inst, **kw).run(30)

    first = Run(cube, inst, checkpoint_path=path, **kw)
    first.run(15)
    # simulate a fresh process: new Run object, resume from checkpoint
    second = Run(cube, inst, checkpoint_path=path, **kw).resume()
    assert second.sweeps_done == 15
    second.run(15)
    np.testing.assert_array_equal(
        np.asarray(full.states.clean), np.asarray(second.states.clean)
    )


def test_checkpoint_rejects_shape_mismatch(tmp_path, rng):
    cube, inst, _ = _make_toy(rng)
    cfg = sm.RunConfig(max_iterations=5, dtype=np.float64, fsf_size=5,
                       lsf_width=5)
    p = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(p)
    path = str(tmp_path / "ck.npz")
    ckpt.save_state(path, state)

    cube2, inst2, _ = _make_toy(rng, Y=12, X=12)
    p2 = sm.make_problem(cube2, inst2, cfg)
    with pytest.raises(ValueError):
        ckpt.load_state(path, sm.init_state(p2))


def test_run_multichain_diagnostics(rng):
    cube, inst, _ = _make_toy(rng, L=8, fsf_fwhm=0.25, lsf_fwhm=1.0)
    run = Run(cube, inst, max_iterations=200, burn_in=50, seed=2,
              n_chains=4, fsf_size=5, lsf_width=5, dtype=np.float64)
    run.run()
    d = run.diagnostics()
    assert d["n_chains"] == 4
    assert "rhat_chi2" in d and np.isfinite(d["rhat_chi2"])
    assert run.trace("chi2").shape == (4, 200)


def test_run_until_rhat_converges(rng):
    """run_until stops early once R̂/ESS targets hold (C9 closed-loop)."""
    cube, inst, _ = _make_toy(rng, L=8, fsf_fwhm=0.25, lsf_fwhm=1.0)
    run = Run(cube, inst, max_iterations=2000, burn_in=30, seed=2,
              n_chains=4, sampler="gibbs", fsf_size=5, lsf_width=5,
              dtype=np.float64)
    d = run.run_until(rhat=1.2, min_ess=20, check_every=50)
    assert d["converged"]
    assert d["rhat_max"] <= 1.2
    assert d["ess_chi2"] >= 20
    assert run.sweeps_done == d["sweeps"] < 2000


def test_run_until_caps_at_max_sweeps(rng):
    cube, inst, _ = _make_toy(rng)
    run = Run(cube, inst, max_iterations=10_000, burn_in=10, seed=7,
              n_chains=2, fsf_size=5, lsf_width=5, dtype=np.float64)
    d = run.run_until(min_ess=1e9, rhat=None, check_every=20, max_sweeps=60)
    assert not d["converged"]
    assert run.sweeps_done == 60


def test_run_until_single_chain_needs_ess(rng):
    cube, inst, _ = _make_toy(rng)
    run = Run(cube, inst, max_iterations=100, burn_in=10, seed=1,
              fsf_size=5, lsf_width=5, dtype=np.float64)
    with pytest.raises(ValueError):
        run.run_until()  # single chain, no min_ess
    d = run.run_until(min_ess=5, check_every=30, max_sweeps=600)
    assert "rhat_max" not in d
    assert d["converged"] or run.sweeps_done == 600


def test_run_metrics_jsonl(tmp_path, rng):
    cube, inst, _ = _make_toy(rng)
    mpath = str(tmp_path / "metrics.jsonl")
    run = Run(cube, inst, max_iterations=20, segment_size=10, seed=1,
              metrics_path=mpath, fsf_size=5, lsf_width=5, dtype=np.float64)
    run.run()
    lines = [json.loads(l) for l in open(mpath)]
    assert len(lines) == 2
    assert lines[-1]["sweep"] == 20
    assert "sweeps_per_sec" in lines[-1]


def test_run_variance_mask_override(rng):
    cube, inst, _ = _make_toy(rng)
    mask = np.zeros((6, 6), dtype=bool)
    mask[1, 1] = True
    var = np.full(cube.shape, 0.5)
    run = Run(cube, inst, variance=var, mask=mask, max_iterations=10,
              fsf_size=5, lsf_width=5, dtype=np.float64)
    run.run()
    assert (np.asarray(run.states.clean)[:, :, 1, 1] == 0).all()


def test_initial_data_nonzero_start(rng):
    """ADVICE r1 (medium): initial='data' must seed chains from the observed
    cube — both through init_state without an explicit cube (the data lives
    in the Problem) and through the Run facade."""
    cube, inst, _ = _make_toy(rng, noise=0.2)
    cfg = sm.RunConfig(max_iterations=10, initial="data",
                       fsf_size=5, lsf_width=5, dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(problem)  # no cube passed — the reported bug path
    p = problem
    clean = np.asarray(state.clean)[:, : p.Y, : p.X]
    assert np.abs(clean).sum() > 0
    np.testing.assert_allclose(clean, np.asarray(cube.data), atol=1e-12)

    run = Run(cube, inst, max_iterations=4, initial="data",
              fsf_size=5, lsf_width=5, dtype=np.float64)
    assert np.abs(np.asarray(run.states.clean)).sum() > 0


def test_checkpoint_extensionless_path(tmp_path, rng):
    """ADVICE r1 (low): save appends .npz, load must find the same file."""
    cube, inst, _ = _make_toy(rng)
    cfg = sm.RunConfig(max_iterations=4, fsf_size=5, lsf_width=5,
                       dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(problem)
    path = str(tmp_path / "ck")  # no extension
    ckpt.save_state(path, state, meta={"k": 1})
    restored, meta = ckpt.load_state(path, state)
    assert meta == {"k": 1}
    np.testing.assert_array_equal(
        np.asarray(restored.clean), np.asarray(state.clean))


def test_run_chains_warns_on_indivisible(rng):
    """VERDICT r1 weak #5: indivisible n_chains must warn, not silently
    fall back to one device."""
    import warnings as _w
    from deconv3d_tpu import chains as ch

    cube, inst, _ = _make_toy(rng)
    cfg = sm.RunConfig(max_iterations=2, fsf_size=5, lsf_width=5,
                       dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ch.run_chains(problem, n_chains=3, n_sweeps=2)  # 3 % 8 != 0
    assert any("not divisible" in str(w.message) for w in rec)


def test_make_problem_exported():
    import deconv3d_tpu as d3d

    assert "make_problem" in d3d.__all__
    assert d3d.make_problem is sm.make_problem


def test_segmented_run_reuses_compiled_executable(rng):
    """ADVICE r1 (low): segments must not retrace the batched runner."""
    from deconv3d_tpu import chains as ch

    cube, inst, _ = _make_toy(rng)
    run = Run(cube, inst, max_iterations=12, burn_in=4, segment_size=4,
              n_chains=2, fsf_size=5, lsf_width=5, dtype=np.float64)
    before = ch._batched_run._cache_size()
    run.run()  # 3 segments of identical shape
    after = ch._batched_run._cache_size()
    assert after - before <= 1


def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    """Orbax backend: bit-exact state round-trip incl. RNG key + meta."""
    cube, inst, _ = _make_toy(rng)
    cfg = sm.RunConfig(max_iterations=6, fsf_size=5, lsf_width=5,
                       dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(problem)
    state = sm.run_sweeps(problem, state, 3).state
    path = str(tmp_path / "ock")
    ckpt.save_state_orbax(path, state, meta={"sweeps_done": 3})
    restored, meta = ckpt.load_state_orbax(path, state)
    assert meta == {"sweeps_done": 3}
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_async(tmp_path, rng):
    cube, inst, _ = _make_toy(rng)
    cfg = sm.RunConfig(max_iterations=4, fsf_size=5, lsf_width=5,
                       dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(problem)
    path = str(tmp_path / "ock_async")
    ckptr = ckpt.save_state_orbax(path, state, meta={"k": 2}, async_=True)
    ckptr.wait_until_finished()
    ckptr.close()
    restored, meta = ckpt.load_state_orbax(path, state)
    assert meta == {"k": 2}
    np.testing.assert_array_equal(
        np.asarray(restored.clean), np.asarray(state.clean))


def test_checkpoint_resume_bit_exact_spatial_mesh(tmp_path, rng):
    """checkpoint/resume THROUGH the facade with a spatial_mesh: the
    sharded sweep's absolute-sweep RNG keying must make a killed-and-
    resumed sharded run land bit-exactly on the uninterrupted one."""
    cube, inst, _ = _make_toy(rng)
    kw = dict(max_iterations=24, burn_in=8, seed=9, fsf_size=5,
              lsf_width=5, dtype=np.float64, spatial_mesh=2)
    path = str(tmp_path / "ck.npz")

    full = Run(cube, inst, **kw).run(24)

    first = Run(cube, inst, checkpoint_path=path, **kw)
    first.run(12)
    second = Run(cube, inst, checkpoint_path=path, **kw).resume()
    assert second.sweeps_done == 12
    second.run(12)
    np.testing.assert_array_equal(
        np.asarray(full.states.clean), np.asarray(second.states.clean)
    )
    np.testing.assert_array_equal(
        np.asarray(full.states.resid), np.asarray(second.states.resid)
    )


def test_direct_lean_facade_checkpoint_resume(tmp_path, rng, monkeypatch):
    """Run(sampler='direct') through the LEAN segment layout (forced via a
    tiny threshold, as at full field): segmented + checkpoint/resume runs
    must land exactly on the uninterrupted run — the lean layout consumes
    incoming states, which is precisely what facade segmenting exercises."""
    import deconv3d_tpu.ops.direct as dmod

    monkeypatch.setattr(dmod, "PCG_WHILE_BYTES_BUDGET", 1)
    monkeypatch.setattr(dmod, "DIRECT_LEAN_BYTES", 1)
    cube, inst, _ = _make_toy(rng)
    kw = dict(max_iterations=8, burn_in=0, seed=4, fsf_size=5,
              lsf_width=5, dtype=np.float64, sampler="direct",
              direct_tol=1e-9, direct_maxiter=400)
    path = str(tmp_path / "ck.npz")

    full = Run(cube, inst, **kw).run(8)

    first = Run(cube, inst, checkpoint_path=path, **kw)
    first.run(4)
    second = Run(cube, inst, checkpoint_path=path, **kw).resume()
    assert second.sweeps_done == 4
    second.run(4)
    np.testing.assert_allclose(
        np.asarray(full.states.clean), np.asarray(second.states.clean),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(full.states.sum_clean),
        np.asarray(second.states.sum_clean), rtol=1e-9, atol=1e-12,
    )


def test_run_until_undersized_window_not_converged(rng):
    """A diagnostic window too short for split-R-hat (<2 samples per
    half) must read as NOT converged — the NaN fallback used to report
    the ideal 1.0 and stop with zero statistical evidence (review r3)."""
    cube, inst, _ = _make_toy(rng)
    run = Run(cube, inst, max_iterations=1000, burn_in=500, seed=5,
              n_chains=2, fsf_size=5, lsf_width=5, dtype=np.float64)
    d = run.run_until(rhat=1.01, check_every=20, max_sweeps=40)
    assert not d["converged"]
    assert d["rhat_max"] == float("inf")
    assert d["rhat_monitor_max"] == float("inf")


def test_convergence_window_rebases_after_resume(tmp_path, rng):
    """burn_in counts absolute sweeps; after a resume the process-local
    trace is shorter than sweeps_done, so the diagnostic window must be
    rebased to trace coordinates instead of indexing with the absolute
    count (review r3)."""
    cube, inst, _ = _make_toy(rng)
    kw = dict(max_iterations=200, burn_in=40, seed=9, n_chains=2,
              fsf_size=5, lsf_width=5, dtype=np.float64)
    path = str(tmp_path / "ck.npz")
    Run(cube, inst, checkpoint_path=path, **kw).run(50)

    second = Run(cube, inst, checkpoint_path=path, **kw).resume()
    second.run(30)                      # local trace n=30, sweeps_done=80
    d = second._convergence_criteria(40)
    # all 30 local samples are post-burn-in: the Stan half-window starts
    # at 15, NOT at the absolute-count clip (n-2 = 28 -> 2-sample window)
    assert d["window"] == [15, 30]
    assert np.isfinite(d["rhat_max"])
