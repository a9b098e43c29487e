"""Spatially-sharded sampling (VERDICT r1 next #4, SURVEY §7 step 7).

Run on the 8-device virtual CPU mesh (conftest).  The strongest check:
because the sharded sweep draws the full proposal tensor on every device
and slices its rows, the sharded chain is draw-for-draw identical to the
single-device jnp engine — clean/residual must match to fp tolerance and
the FSF-patch invariant must hold across shard edges.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from deconv3d_tpu import Cube
from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm
from deconv3d_tpu.parallel.sweep_sharded import (
    overlap_shard, overlap_unshard, run_sweeps_sharded,
)


def _mesh(n=4, axis="sp"):
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def _problem(rng, ny_mult=4, f=5, L=16, nx_cells=2, noise=0.2, **cfg_kw):
    """Geometry with ny divisible by the mesh: Y = ny_mult·f rows."""
    Y, X = ny_mult * f, nx_cells * f
    truth = np.zeros((L, Y, X))
    truth[L // 2, Y // 2, X // 2] = 5.0
    truth[L // 3, 2, 2] = 3.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0),
        pixel_scale=0.2,
    )
    cube0 = Cube.from_data(truth, crval=4750.0, cdelt=1.25, dtype=np.float64)
    fsf = inst.fsf.bank(cube0.wavelengths(), size=f, pixel_scale=0.2)
    lsf = inst.lsf.bank(cube0.wavelengths(), cdelt=1.25, width=5)
    conv = np.asarray(
        cv.convolve_cube(jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf))
    )
    data = conv + noise * rng.standard_normal(conv.shape)
    cube = Cube.from_data(
        data, variance=np.full_like(data, noise**2),
        crval=4750.0, cdelt=1.25, dtype=np.float64,
    )
    cfg = sm.RunConfig(
        max_iterations=30, burn_in=10, seed=4, fsf_size=f, lsf_width=5,
        dtype=np.float64, **cfg_kw,
    )
    return sm.make_problem(cube, inst, cfg)


def test_overlap_shard_roundtrip(rng):
    f, ndev = 5, 4
    resid = jnp.asarray(rng.standard_normal((3, f - 1 + 8 * f, 11)))
    sh = overlap_shard(resid, f, ndev)
    # replicas: block d's tail f-1 rows == block d+1's first f-1 rows
    Hpl = sh.shape[1] // ndev
    BYl = Hpl - (f - 1)
    for d in range(ndev - 1):
        np.testing.assert_array_equal(
            np.asarray(sh[:, d * Hpl + BYl : (d + 1) * Hpl]),
            np.asarray(sh[:, (d + 1) * Hpl : (d + 1) * Hpl + f - 1]),
        )
    np.testing.assert_array_equal(
        np.asarray(overlap_unshard(sh, f, ndev)), np.asarray(resid)
    )


@pytest.mark.parametrize("ndev", [2, 4])
def test_sharded_sweep_matches_single_device(rng, ndev):
    problem = _problem(rng)
    state0 = sm.init_state(problem)
    n_sweeps = 20

    ref = sm.run_sweeps(problem, state0, n_sweeps)
    shd = run_sweeps_sharded(
        problem, state0, n_sweeps, _mesh(ndev)
    )

    # draw-for-draw identical chain (same keys, same accept decisions)
    np.testing.assert_allclose(
        np.asarray(shd.state.clean), np.asarray(ref.state.clean),
        rtol=0, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(shd.state.resid), np.asarray(ref.state.resid),
        rtol=0, atol=1e-9,
    )
    # chi² differs only by summation order
    np.testing.assert_allclose(
        np.asarray(shd.chi2_trace), np.asarray(ref.chi2_trace), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(shd.accept_trace), np.asarray(ref.accept_trace), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(shd.monitor_trace), np.asarray(ref.monitor_trace),
        atol=1e-12,
    )
    assert shd.state.sweep == ref.state.sweep


def test_sharded_invariant_across_edges(rng):
    """data − resid == conv(clean) including rows written via the halo."""
    problem = _problem(rng)
    state0 = sm.init_state(problem)
    shd = run_sweeps_sharded(problem, state0, 30, _mesh(4))
    p, st = problem, shd.state
    h = p.f // 2
    # round-trip through host: the sharded output's device layout trips the
    # CPU FFT thunk (XLA layout RET_CHECK), unrelated to the math under test
    clean = jnp.asarray(np.asarray(st.clean))
    conv = cv.convolve_cube(clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    model = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - st.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
    err = np.abs(np.asarray(model)[w > 0] - np.asarray(conv)[w > 0]).max()
    assert err < 1e-9, err
    assert float(st.n_accept) > 30  # nonvacuous


def test_sharded_requires_divisible_ny(rng):
    problem = _problem(rng, ny_mult=3)  # ny=3 not divisible by 2
    state0 = sm.init_state(problem)
    with pytest.raises(ValueError, match="divisible"):
        run_sweeps_sharded(problem, state0, 2, _mesh(2))


@pytest.mark.parametrize("mode,kw", [
    ("gibbs", {}),
    ("gibbs", {"positivity": True}),
    ("gibbs_block", {}),
    ("mh", {"positivity": True}),
])
def test_sharded_other_samplers_match_single_device(rng, mode, kw):
    """gibbs / truncated-gibbs / blocked / reflective-MH shard identically."""
    problem = _problem(rng, sampler=mode, **kw)
    state0 = sm.init_state(problem)
    n_sweeps = 6
    ref = sm.run_sweeps(problem, state0, n_sweeps)
    shd = run_sweeps_sharded(problem, state0, n_sweeps, _mesh(4))
    np.testing.assert_allclose(
        np.asarray(shd.state.clean), np.asarray(ref.state.clean),
        rtol=0, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(shd.state.resid), np.asarray(ref.state.resid),
        rtol=0, atol=1e-9,
    )
    # chi2 differs only by distributed (psum) summation order
    np.testing.assert_allclose(
        np.asarray(shd.chi2_trace), np.asarray(ref.chi2_trace), rtol=1e-6
    )


def test_sharded_sweep_with_coarse_matches_single_device(rng):
    """coarse_every through the jnp sharded path: the sharded chain stays
    draw-for-draw identical to the single-device engine — fine sweeps
    replicate the proposal tensor, and the interleaved coarse passes use
    the same absolute-sweep keys on the same standard-layout state."""
    problem = _problem(rng, coarse_every=3, coarse_mode="global")
    state0 = sm.init_state(problem)
    ref = sm.run_sweeps(problem, state0, 8)
    shd = run_sweeps_sharded(problem, state0, 8, _mesh(4))
    np.testing.assert_allclose(
        np.asarray(shd.state.clean), np.asarray(ref.state.clean),
        rtol=0, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(shd.state.resid), np.asarray(ref.state.resid),
        rtol=0, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(shd.chi2_trace), np.asarray(ref.chi2_trace), rtol=1e-9
    )
    # nonvacuous: coarse passes actually ran (global draws count L
    # proposals each; 2 boundaries × n_soft patterns in 8 sweeps)
    import dataclasses as dc

    pf = dc.replace(
        problem, config=dc.replace(problem.config, coarse_every=None)
    )
    fine = sm.run_sweeps(pf, state0, 8)
    assert float(shd.state.n_propose) > float(fine.state.n_propose)


def test_run_facade_spatial_mesh(rng):
    """Run(spatial_mesh=...) executes one chain sharded over devices and
    matches the unsharded Run sweep-for-sweep."""
    from deconv3d_tpu import Run

    problem = _problem(rng)  # geometry helper: Y divisible by the mesh
    # rebuild the cube/instrument pair the helper used
    import dataclasses as dc

    f, L = 5, 16
    Y, X = 4 * f, 2 * f
    truth = np.zeros((L, Y, X))
    truth[L // 2, Y // 2, X // 2] = 5.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0),
        pixel_scale=0.2,
    )
    data = truth + 0.2 * rng.standard_normal(truth.shape)
    cube = Cube.from_data(
        data, variance=np.full_like(data, 0.04), crval=4750.0, cdelt=1.25,
        dtype=np.float64,
    )
    kw = dict(max_iterations=10, burn_in=2, seed=4, fsf_size=f, lsf_width=5,
              dtype=np.float64, engine="jnp")
    r_ref = Run(cube, inst, **kw)
    r_ref.run()
    r_shd = Run(cube, inst, spatial_mesh=4, **kw)
    r_shd.run()
    np.testing.assert_allclose(
        np.asarray(r_shd.states.clean), np.asarray(r_ref.states.clean),
        rtol=0, atol=1e-12,
    )
    np.testing.assert_allclose(r_shd.trace("chi2"), r_ref.trace("chi2"),
                               rtol=1e-9)
    assert r_shd.sweeps_done == 10


def test_run_facade_spatial_mesh_engine_resolution(rng, monkeypatch):
    """spatial_mesh × engine (VERDICT r2 weak #2 / ADVICE r2 medium):
    sampler='mh' keeps the kernel engine and routes to the kernel-rate
    sharded sweep; other samplers step down to jnp (keeping quad) instead
    of crashing on quad=None or silently degrading."""
    from deconv3d_tpu import Run

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    f, L = 5, 16
    Y, X = 4 * f, 2 * f
    truth = rng.standard_normal((L, Y, X))
    cube = Cube.from_data(truth, variance=np.ones_like(truth),
                          crval=4750.0, cdelt=1.25)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.5),
                          lsf=ins.GaussianLSF(fwhm=2.0))
    # mh/gibbs: kernel-rate path (engine kept, low-rank factors present)
    for smp in ("mh", "gibbs"):
        r = Run(cube, inst, spatial_mesh=4, engine="pallas_tiled",
                sampler=smp, max_iterations=4, fsf_size=f, lsf_width=5)
        assert r._spatial_kernel and r.problem.fsf_spec is not None, smp
        assert r.problem.config.engine == "pallas_tiled", smp
    # unsupported modes: jnp step-down, quad kept
    for smp, kw in (("gibbs_block", {}), ("mh", {"positivity": True})):
        r = Run(cube, inst, spatial_mesh=4, engine="auto", sampler=smp,
                max_iterations=4, fsf_size=f, lsf_width=5, **kw)
        assert r.problem.config.engine == "jnp", smp
        assert r.problem.quad is not None, smp


def test_run_facade_spatial_mesh_kernel_rate_end_to_end(rng):
    """Run(spatial_mesh) on an mh kernel-engine problem drives the
    kernel-rate sharded sweep (jnp interior stand-in on CPU)."""
    from deconv3d_tpu import Run

    f, L = 5, 16
    Y, X = 4 * f, 2 * f
    truth = rng.standard_normal((L, Y, X)).astype(np.float32)
    cube = Cube.from_data(truth, variance=np.ones_like(truth),
                          crval=4750.0, cdelt=1.25)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.5),
                          lsf=ins.GaussianLSF(fwhm=2.0))
    r = Run(cube, inst, spatial_mesh=2, engine="pallas_tiled",
            max_iterations=4, burn_in=1, fsf_size=f, lsf_width=5)
    assert r._spatial_kernel
    r.run()
    assert r.sweeps_done == 4
    assert np.isfinite(r.chi2)
    assert float(np.asarray(r.states.n_accept).sum()) > 0


def test_run_facade_chains_times_spatial(rng):
    """Run(n_chains=2, spatial_mesh=<2-D mesh>) routes the chains ×
    kernel-rate spatial composition; invalid combinations raise."""
    import pytest
    from jax.sharding import Mesh

    from deconv3d_tpu import Run

    f, L = 5, 16
    Y, X = 4 * f, 2 * f
    truth = rng.standard_normal((L, Y, X)).astype(np.float32)
    cube = Cube.from_data(truth, variance=np.ones_like(truth),
                          crval=4750.0, cdelt=1.25)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.5),
                          lsf=ins.GaussianLSF(fwhm=2.0))
    mesh2d = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                  ("chains", "sp"))
    r = Run(cube, inst, spatial_mesh=mesh2d, n_chains=2,
            engine="pallas_tiled", max_iterations=4, burn_in=1,
            fsf_size=f, lsf_width=5)
    assert r._spatial_chains
    r.run()
    assert r.sweeps_done == 4
    assert np.isfinite(r.chi2)
    assert np.asarray(r.states.clean).shape[0] == 2
    assert float(np.asarray(r.states.n_accept).sum()) > 0
    with pytest.raises(ValueError, match="composition"):
        Run(cube, inst, spatial_mesh=mesh2d, n_chains=3,
            max_iterations=4, fsf_size=f, lsf_width=5)


def test_sharded_sweep_rejects_tiled_problem(rng, monkeypatch):
    """A pallas_tiled Problem (quad=None) must raise a clear error, not an
    AttributeError deep inside shard_map."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    truth = rng.standard_normal((16, 20, 10)).astype(np.float32)
    cube = Cube.from_data(truth, variance=np.ones_like(truth),
                          crval=4750.0, cdelt=1.25)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.5),
                          lsf=ins.GaussianLSF(fwhm=2.0))
    p = sm.make_problem(cube, inst, sm.RunConfig(
        engine="pallas_tiled", fsf_size=5, lsf_width=5, max_iterations=4))
    assert p.quad is None
    state0 = sm.init_state(p)
    with pytest.raises(ValueError, match="pallas_tiled"):
        run_sweeps_sharded(p, state0, 2, _mesh(2))


def test_run_facade_spatial_mesh_rejects_multichain(rng):
    from deconv3d_tpu import Run

    truth = rng.standard_normal((8, 20, 10))
    cube = Cube.from_data(truth, variance=np.ones_like(truth),
                          crval=4750.0, cdelt=1.25, dtype=np.float64)
    inst = ins.Instrument(fsf=ins.GaussianFSF(fwhm=0.5),
                          lsf=ins.GaussianLSF(fwhm=2.0))
    with pytest.raises(ValueError, match="n_chains"):
        Run(cube, inst, spatial_mesh=2, n_chains=4, max_iterations=4)
