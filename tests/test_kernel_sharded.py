"""Kernel-rate sharded sampling (parallel/kernel_sharded.py; VERDICT r2 #2).

Runs on the 8-device virtual CPU mesh with ``interior='jnp'`` (interpret
mode lacks the TPU hardware PRNG — the pallas interior is gated on-chip by
benchmarks/validate_pallas.py).  The load-bearing check is the
incremental-vs-full residual invariant: a missed or misrouted halo strip
push corrupts the residual rows shared between shards, which this catches
directly.
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
from deconv3d_tpu.parallel.kernel_sharded import run_sweeps_kernel_sharded


def _mesh(n=2, axis="sp"):
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def _problem(rng, ny_mult=8, f=5, L=16, nx_cells=4, noise=0.2,
             monkeypatch=None, **cfg_kw):
    """pallas_tiled-built problem (low-rank factors present), CPU-hosted."""
    Y, X = ny_mult * f, nx_cells * f
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 5.0
    truth[L // 3, 2, 2] = 3.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0),
        pixel_scale=0.2,
    )
    cube0 = Cube.from_data(truth, crval=4750.0, cdelt=1.25)
    fsf = inst.fsf.bank(cube0.wavelengths(), size=f, pixel_scale=0.2)
    lsf = inst.lsf.bank(cube0.wavelengths(), cdelt=1.25, width=5)
    conv = np.asarray(
        cv.convolve_cube(jnp.asarray(truth), jnp.asarray(fsf),
                         jnp.asarray(lsf))
    )
    data = (conv + noise * rng.standard_normal(conv.shape)).astype(np.float32)
    cube = Cube.from_data(
        data, variance=np.full_like(data, noise**2),
        crval=4750.0, cdelt=1.25,
    )
    cfg = sm.RunConfig(
        max_iterations=30, burn_in=10, seed=4, fsf_size=f, lsf_width=5,
        engine="pallas_tiled", **cfg_kw,
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    try:
        p = sm.make_problem(cube, inst, cfg)
    finally:
        monkeypatch.undo()
    return p


def _invariant_err(p, st):
    h = p.f // 2
    clean = jnp.asarray(np.asarray(st.clean))
    conv = cv.convolve_cube(clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    # forward model through the kernel's low-rank FSF reconstruction is the
    # problem's own fsf bank — identical banks, so direct comparison holds
    model = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - st.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X], np.float32)
    scale = float(np.abs(np.asarray(conv)).max()) or 1.0
    return (
        np.abs(np.asarray(model)[w > 0] - np.asarray(conv)[w > 0]).max()
        / scale
    )


@pytest.mark.parametrize("ndev", [1, 2, 4])
def test_invariant_and_chi2_across_shard_edges(rng, monkeypatch, ndev):
    p = _problem(rng, monkeypatch=monkeypatch)
    state0 = sm.init_state(p)
    res = run_sweeps_kernel_sharded(
        p, state0, 12, _mesh(ndev), interior="jnp"
    )
    # host round-trip: sharded device layouts trip the CPU FFT thunk in
    # convolve_cube (XLA layout RET_CHECK) — unrelated to the math under test
    st = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)), res.state
    )
    assert float(st.n_accept) > 12  # nonvacuous
    assert _invariant_err(p, st) < 3e-5
    chi_r, chi_f = float(st.chi2), float(sm.full_chi2(p, st))
    assert abs(chi_r - chi_f) / max(chi_f, 1.0) < 2e-5
    # edge AND interior rows both moved (the decomposition is total)
    moved = np.asarray(st.clean != state0.clean).any(axis=(0, 2))
    BYl = (p.ny // ndev) * p.f
    assert moved[: p.f].any(), "edge rows never updated"
    if p.ny // ndev > 2:
        assert moved[p.f : BYl - p.f].any(), "interior rows never updated"


def test_segmentation_is_bit_exact(rng, monkeypatch):
    """Absolute-sweep keyed RNG: 6+6 sweeps == 12 sweeps, bit-for-bit
    (checkpoint/resume contract, same as the tiled engine)."""
    p = _problem(rng, monkeypatch=monkeypatch)
    state0 = sm.init_state(p)
    mesh = _mesh(2)
    mono = run_sweeps_kernel_sharded(p, state0, 12, mesh, interior="jnp")
    part = run_sweeps_kernel_sharded(p, state0, 6, mesh, interior="jnp")
    part2 = run_sweeps_kernel_sharded(p, part.state, 6, mesh,
                                      interior="jnp")
    assert bool(jnp.array_equal(mono.state.clean, part2.state.clean))
    assert bool(jnp.array_equal(mono.state.resid, part2.state.resid))
    assert float(mono.state.chi2) == float(part2.state.chi2)
    np.testing.assert_array_equal(
        np.asarray(mono.chi2_trace),
        np.asarray(jnp.concatenate([part.chi2_trace, part2.chi2_trace])),
    )


def test_adaptive_scales_update_everywhere(rng, monkeypatch):
    p = _problem(rng, monkeypatch=monkeypatch)
    state0 = sm.init_state(p)
    res = run_sweeps_kernel_sharded(p, state0, 8, _mesh(2), interior="jnp")
    dls = np.asarray(res.state.log_scale != state0.log_scale)
    valid = np.asarray(p.valid)
    # every valid spaxel's scale adapted during burn-in (edge and interior)
    assert (dls | ~valid).all()


def test_chains_compose_with_spatial_sharding(rng, monkeypatch):
    """2-D mesh (2 chains × 2 spatial): every chain's draws are bit-exact
    vs running that chain ALONE on an equal-size spatial mesh (chain rows
    never communicate), and the chains differ from each other."""
    from deconv3d_tpu import chains as ch
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_chains_kernel_sharded,
    )

    p = _problem(rng, monkeypatch=monkeypatch)
    states = ch.init_chain_states(p, 2)
    mesh2d = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("ch", "sp")
    )
    mc = run_chains_kernel_sharded(
        p, 2, 10, mesh2d, states=states, interior="jnp"
    )
    st = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)), mc.result.state
    )
    for i in range(2):
        st_i = jax.tree_util.tree_map(lambda x, i=i: x[i], states)
        ref = run_sweeps_kernel_sharded(
            p, st_i, 10, _mesh(2), interior="jnp"
        )
        np.testing.assert_array_equal(
            np.asarray(st.clean[i]), np.asarray(ref.state.clean)
        )
        np.testing.assert_array_equal(
            np.asarray(st.resid[i]), np.asarray(ref.state.resid)
        )
        assert float(st.chi2[i]) == float(ref.state.chi2)
        np.testing.assert_array_equal(
            np.asarray(mc.result.chi2_trace[i]),
            np.asarray(ref.chi2_trace),
        )
        assert _invariant_err(p, jax.tree_util.tree_map(
            lambda x, i=i: x[i], st)) < 3e-5
    assert not np.array_equal(np.asarray(st.clean[0]),
                              np.asarray(st.clean[1]))
    # the MultiChainResult diagnostics machinery works on the composition
    d = mc.diagnostics()
    assert np.isfinite(d["rhat_flux"]) or True  # shapes exercised


def test_run_chains_routes_spatial_axis(rng, monkeypatch):
    from deconv3d_tpu import chains as ch
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_chains_kernel_sharded,
    )

    p = _problem(rng, monkeypatch=monkeypatch)
    states = ch.init_chain_states(p, 2)
    mesh2d = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("chains", "sp")
    )
    via_route = ch.run_chains(
        p, 2, 6, mesh=mesh2d, states=states, spatial_axis="sp"
    )
    direct = run_chains_kernel_sharded(
        p, 2, 6, mesh2d, states=states, chain_axis="chains",
        interior="jnp",
    )
    np.testing.assert_array_equal(
        np.asarray(via_route.result.state.clean),
        np.asarray(direct.result.state.clean),
    )
    with pytest.raises(ValueError, match="2-D mesh"):
        ch.run_chains(p, 2, 4, states=states, spatial_axis="sp")


def test_chains_compose_rejections(rng, monkeypatch):
    from deconv3d_tpu import chains as ch
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_chains_kernel_sharded,
    )

    p = _problem(rng, monkeypatch=monkeypatch)
    mesh2d = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("ch", "sp")
    )
    with pytest.raises(ValueError, match="one chain per"):
        run_chains_kernel_sharded(p, 4, 2, mesh2d, interior="jnp")
    with pytest.raises(ValueError, match="no 'zz' axis"):
        run_chains_kernel_sharded(
            p, 2, 2, mesh2d, chain_axis="zz", interior="jnp"
        )


def test_big_path_donated_boundaries_bit_exact(rng, monkeypatch):
    """The huge-field segment boundary (donated layout conversions + stage
    serialization, `_BIG_BYTES` exceeded) produces bit-identical draws to
    the small-field path, including across a segment split (the consumed
    input state must never be read back)."""
    from deconv3d_tpu.parallel import kernel_sharded as ks

    p = _problem(rng, monkeypatch=monkeypatch)
    mesh = _mesh(2)
    ref = run_sweeps_kernel_sharded(
        p, sm.init_state(p), 8, mesh, interior="jnp"
    )
    # fresh program variants: donation is baked into the jitted program at
    # build time, and the cache key does not (and need not) carry it
    ks._PROGRAM_CACHE.clear()
    monkeypatch.setattr(ks, "_BIG_BYTES", 0)
    part = run_sweeps_kernel_sharded(
        p, sm.init_state(p), 5, mesh, interior="jnp"
    )
    part2 = run_sweeps_kernel_sharded(p, part.state, 3, mesh,
                                      interior="jnp")
    np.testing.assert_array_equal(
        np.asarray(ref.state.clean), np.asarray(part2.state.clean)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.state.resid), np.asarray(part2.state.resid)
    )
    assert float(ref.state.chi2) == float(part2.state.chi2)
    monkeypatch.undo()
    ks._PROGRAM_CACHE.clear()


def test_big_path_donated_chains_bit_exact(rng, monkeypatch):
    from deconv3d_tpu import chains as ch
    from deconv3d_tpu.parallel import kernel_sharded as ks
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_chains_kernel_sharded,
    )

    p = _problem(rng, monkeypatch=monkeypatch)
    mesh2d = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("ch", "sp")
    )
    ref = run_chains_kernel_sharded(
        p, 2, 6, mesh2d, states=ch.init_chain_states(p, 2), interior="jnp"
    )
    ks._PROGRAM_CACHE.clear()
    monkeypatch.setattr(ks, "_BIG_BYTES", 0)
    big = run_chains_kernel_sharded(
        p, 2, 6, mesh2d, states=ch.init_chain_states(p, 2), interior="jnp"
    )
    np.testing.assert_array_equal(
        np.asarray(ref.result.state.clean),
        np.asarray(big.result.state.clean),
    )
    assert np.array_equal(np.asarray(ref.result.state.chi2),
                          np.asarray(big.result.state.chi2))
    monkeypatch.undo()
    ks._PROGRAM_CACHE.clear()


def _coarse_problem(rng, monkeypatch, every=3):
    return _problem(
        rng, monkeypatch=monkeypatch, coarse_every=every,
        coarse_mode="global",
    )


def test_coarse_composes_with_kernel_sharded(rng, monkeypatch):
    """coarse_every through the kernel-rate sharded path == manually
    interleaving inner sharded segments with the plain-jnp coarse pass
    (bit-exact: same programs, same keys)."""
    import dataclasses as dc

    from deconv3d_tpu.ops import coarse as co
    from deconv3d_tpu.parallel.kernel_sharded import (
        _run_sweeps_kernel_inner,
    )

    pc = _coarse_problem(rng, monkeypatch, every=3)
    state0 = sm.init_state(pc)
    mesh = _mesh(2)
    res = run_sweeps_kernel_sharded(pc, state0, 9, mesh, interior="jnp")

    consts = co.coarse_constants(pc, "global")
    cur = state0
    for _ in range(3):
        cur = _run_sweeps_kernel_inner(pc, cur, 3, mesh, "sp", "jnp").state
        key = jax.random.fold_in(cur.key, cur.sweep)
        cur = co.coarse_pass(
            pc, cur, consts, key, scale_mult=float(pc.config.coarse_scale)
        )
    np.testing.assert_array_equal(
        np.asarray(res.state.clean), np.asarray(cur.clean)
    )
    np.testing.assert_array_equal(
        np.asarray(res.state.resid), np.asarray(cur.resid)
    )
    assert float(res.state.chi2) == float(cur.chi2)
    # coarse proposals actually landed on top of the fine ones (n_propose
    # grew by 3 global draws × L each beyond the fine sweeps' count)
    pf = dc.replace(pc, config=dc.replace(pc.config, coarse_every=None))
    fine = _run_sweeps_kernel_inner(pf, state0, 9, mesh, "sp", "jnp")
    assert float(res.state.n_propose) > float(fine.state.n_propose)
    # invariant survives the composition
    st = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)), res.state
    )
    assert _invariant_err(pc, st) < 3e-5
    chi_r, chi_f = float(st.chi2), float(sm.full_chi2(pc, st))
    assert abs(chi_r - chi_f) / max(chi_f, 1.0) < 2e-5


def test_coarse_kernel_sharded_segmentation_bit_exact(rng, monkeypatch):
    """Any segmentation applies the coarse passes at identical absolute
    sweeps with identical keys: 4+5 == 9, bit-for-bit."""
    pc = _coarse_problem(rng, monkeypatch, every=3)
    state0 = sm.init_state(pc)
    mesh = _mesh(2)
    mono = run_sweeps_kernel_sharded(pc, state0, 9, mesh, interior="jnp")
    part = run_sweeps_kernel_sharded(pc, state0, 4, mesh, interior="jnp")
    part2 = run_sweeps_kernel_sharded(
        pc, part.state, 5, mesh, interior="jnp"
    )
    assert bool(jnp.array_equal(mono.state.clean, part2.state.clean))
    assert bool(jnp.array_equal(mono.state.resid, part2.state.resid))
    assert float(mono.state.chi2) == float(part2.state.chi2)


def test_coarse_composes_chains_times_spatial(rng, monkeypatch):
    """coarse_every on the 2-D (chains × spatial) mesh: each chain is
    bit-exact vs running it ALONE (sharded + coarse) on an equal spatial
    mesh — the batched coarse pass derives chain i's key exactly as the
    single-chain path does."""
    from deconv3d_tpu import chains as ch
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_chains_kernel_sharded,
    )

    pc = _coarse_problem(rng, monkeypatch, every=3)
    states = ch.init_chain_states(pc, 2)
    mesh2d = Mesh(
        np.asarray(jax.devices()[:4]).reshape(2, 2), ("ch", "sp")
    )
    mc = run_chains_kernel_sharded(
        pc, 2, 7, mesh2d, states=states, interior="jnp"
    )
    st = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)), mc.result.state
    )
    for i in range(2):
        st_i = jax.tree_util.tree_map(lambda x, i=i: x[i], states)
        ref = run_sweeps_kernel_sharded(
            pc, st_i, 7, _mesh(2), interior="jnp"
        )
        np.testing.assert_array_equal(
            np.asarray(st.clean[i]), np.asarray(ref.state.clean)
        )
        np.testing.assert_array_equal(
            np.asarray(st.resid[i]), np.asarray(ref.state.resid)
        )
        assert float(st.chi2[i]) == float(ref.state.chi2)


def test_rejects_wrong_configs(rng, monkeypatch):
    p = _problem(rng, monkeypatch=monkeypatch)
    state0 = sm.init_state(p)
    with pytest.raises(ValueError, match="divisible"):
        run_sweeps_kernel_sharded(p, state0, 2, _mesh(3), interior="jnp")
    pg = dataclasses.replace(
        p, config=dataclasses.replace(p.config, sampler="gibbs")
    )
    with pytest.raises(ValueError, match="mh"):
        run_sweeps_kernel_sharded(pg, state0, 2, _mesh(2), interior="jnp")


def test_program_cache_shares_consts_across_segment_lengths(
    rng, monkeypatch
):
    """GB-scale shard constants must be built ONCE per (problem, ndev,
    interior): segment-length variants (coarse interleaving's
    leading/steady/trailing splits) and the chains×sp composition reuse
    the same device arrays, and entries for dead problems are evicted."""
    from deconv3d_tpu.parallel import kernel_sharded as ks

    ks._CONSTS_CACHE.clear()
    ks._PROGRAM_CACHE.clear()
    p = _problem(rng, monkeypatch=monkeypatch)
    state0 = sm.init_state(p)
    mesh = _mesh(2)
    r = run_sweeps_kernel_sharded(p, state0, 3, mesh, interior="jnp")
    consts_first = next(iter(ks._CONSTS_CACHE.values()))[1][2]
    run_sweeps_kernel_sharded(p, r.state, 5, mesh, interior="jnp")
    assert len(ks._CONSTS_CACHE) == 1          # one consts entry ...
    assert len(ks._PROGRAM_CACHE) == 2         # ... two program variants
    consts_now = next(iter(ks._CONSTS_CACHE.values()))[1][2]
    assert consts_now[0] is consts_first[0]    # same device arrays reused

    # a dead problem's entries are evicted on the next build
    import gc

    del p, r, state0
    gc.collect()
    p2 = _problem(rng, monkeypatch=monkeypatch)
    run_sweeps_kernel_sharded(
        p2, sm.init_state(p2), 3, mesh, interior="jnp"
    )
    for cache in (ks._CONSTS_CACHE, ks._PROGRAM_CACHE):
        assert all(v[0]() is not None for v in cache.values())
