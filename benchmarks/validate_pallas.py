"""TPU validation of the fused Pallas sweep kernel (run on real hardware).

The CPU test suite cannot exercise the compiled kernel (interpret mode has
no hardware PRNG), so this script IS the kernel's correctness gate — run it
on the attached TPU after touching ops/pallas_sweep.py:

    python benchmarks/validate_pallas.py

Checks, per configuration:
  1. incremental-vs-full invariant: data − resid == conv(clean) (≤ 3e-5
     relative to the data scale after hundreds of accepted patch updates),
  2. running chi² (sum of emitted Δchi²) == from-scratch chi² (≤ 1e-5 rel),
  3. determinism: same seed ⇒ identical chains,
  4. statistical: posterior moments on the conjugate toy match the analytic
     Gaussian posterior (same bar as tests/test_sampler.py).
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube, instruments as ins, sampler as sm
from deconv3d_tpu import convolve as cv


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}  {name}  {detail}")
    return ok


def invariant_case(fsf, lsf, fsf_size, lsf_width, L, Y, X, var, n_sweeps,
                   seed=1, sampler="mh", engine="pallas", tile=None):
    rng = np.random.default_rng(0)
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 5.0
    inst = ins.Instrument(fsf=fsf, lsf=lsf)
    data = truth + np.sqrt(var) * rng.standard_normal((L, Y, X)).astype(
        np.float32
    )
    cube = Cube.from_data(
        data, variance=np.full_like(data, var), crval=4750.0, cdelt=1.25
    )
    cfg = sm.RunConfig(
        max_iterations=n_sweeps, burn_in=n_sweeps // 4, seed=seed,
        fsf_size=fsf_size, lsf_width=lsf_width, engine=engine,
        sampler=sampler, tile=tile,
    )
    p = sm.make_problem(cube, inst, cfg)
    res = sm.run_sweeps(p, sm.init_state(p), n_sweeps)
    st = res.state
    h = p.f // 2
    conv = cv.convolve_cube(st.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    model = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - st.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
    scale = float(np.abs(np.asarray(conv)).max()) or 1.0
    inv_err = np.abs(np.asarray(model)[w > 0] - np.asarray(conv)[w > 0]).max()
    chi_r, chi_f = float(st.chi2), float(sm.full_chi2(p, st))
    ok = check(
        f"invariant  L={L} {type(fsf).__name__[:6]} var={var} {sampler} "
        f"{engine}{tile or ''}",
        inv_err / scale < 3e-5 and abs(chi_r - chi_f) / max(chi_f, 1.0) < 2e-5,
        f"resid_err={inv_err:.2e} chi2_rel={(chi_r - chi_f) / chi_f:+.2e} "
        f"acc={float(st.n_accept):.0f}",
    )
    ok &= check(
        "  nonvacuous", float(st.n_accept) > n_sweeps,
        f"accepts={float(st.n_accept):.0f}",
    )
    # determinism
    res2 = sm.run_sweeps(p, sm.init_state(p), n_sweeps)
    ok &= check(
        "  deterministic",
        bool(jnp.array_equal(res.state.clean, res2.state.clean)),
    )
    return ok


def statistical_case(engine="pallas", tile=None, sampler="mh"):
    import scipy.signal

    rng = np.random.default_rng(42)
    L, Y, X = 8, 4, 4
    noise = 0.5
    truth = np.zeros((L, Y, X))
    truth[4, 2, 2] = 4.0
    lam = 4750.0 + 1.25 * np.arange(L)
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.25), lsf=ins.GaussianLSF(fwhm=1.0)
    )
    cfg = sm.RunConfig(max_iterations=8000, burn_in=1000, seed=13,
                       fsf_size=3, lsf_width=3, engine=engine, tile=tile,
                       sampler=sampler)
    p0 = sm.make_problem(
        Cube.from_data(truth, variance=np.full_like(truth, noise**2),
                       crval=4750.0, cdelt=1.25),
        inst, cfg,
    )
    # forward-model with the problem's own (reconstructed) banks
    fsf, lsf = np.asarray(p0.fsf), np.asarray(p0.lsf)
    conv = np.asarray(
        cv.convolve_cube(jnp.asarray(truth, jnp.float32),
                         jnp.asarray(fsf), jnp.asarray(lsf))
    )
    data = (conv + noise * rng.standard_normal(conv.shape)).astype(np.float32)
    cube = Cube.from_data(data, variance=np.full_like(data, noise**2),
                          crval=4750.0, cdelt=1.25)
    p = sm.make_problem(cube, inst, cfg)

    # dense analytic posterior (with the problem's exact banks and weights)
    n = L * Y * X
    mat = cv.lsf_matrix(lsf)
    K = np.zeros((n, n))
    eye = np.zeros((L, Y, X))
    for i in range(n):
        eye.flat[i] = 1.0
        spec = np.einsum("ml,lyx->myx", mat, eye)
        out = np.empty_like(spec)
        for l in range(L):
            out[l] = scipy.signal.fftconvolve(spec[l], fsf[l], mode="same")
        K[:, i] = out.ravel()
        eye.flat[i] = 0.0
    w = np.asarray(p.w_pad[:, p.f // 2 : p.f // 2 + Y,
                           p.f // 2 : p.f // 2 + X]).ravel()
    P = K.T @ (w[:, None] * K)
    cov = np.linalg.inv(P)
    mean = cov @ K.T @ (w * data.ravel())
    sig = np.sqrt(np.diag(cov))

    res = sm.run_sweeps(p, sm.init_state(p), 8000)
    pm = np.asarray(sm.posterior_mean(p, res.state)).ravel()
    ps = np.asarray(sm.posterior_std(p, res.state)).ravel()
    z = (pm - mean) / sig
    ratio = np.median(ps / sig)
    return check(
        f"statistical (conjugate toy) {engine}{tile or ''} {sampler}",
        np.abs(z).mean() < 0.2 and np.abs(z).max() < 1.0
        and abs(ratio - 1.0) < 0.1,
        f"mean|z|={np.abs(z).mean():.3f} max|z|={np.abs(z).max():.3f} "
        f"std_ratio={ratio:.3f}",
    )


def tiled_masked_case():
    """Masked spaxels through the tiled kernel: frozen at zero, invariant
    holds, and the masked region contributes nothing to chi²."""
    rng = np.random.default_rng(9)
    L, Y, X = 64, 20, 20
    var = 0.04
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 5.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0)
    )
    data = truth + np.sqrt(var) * rng.standard_normal((L, Y, X)).astype(
        np.float32
    )
    mask = np.zeros((Y, X), bool)
    mask[0:6, 0:6] = True                          # corner block masked
    cube = Cube.from_data(
        data, variance=np.full_like(data, var), mask=mask,
        crval=4750.0, cdelt=1.25,
    )
    cfg = sm.RunConfig(
        max_iterations=80, burn_in=20, seed=2, fsf_size=5, lsf_width=5,
        engine="pallas_tiled", tile=(2, 2),
    )
    p = sm.make_problem(cube, inst, cfg)
    res = sm.run_sweeps(p, sm.init_state(p), 80)
    st = res.state
    frozen = np.asarray(st.clean[:, 0:6, 0:6])
    ok = check(
        "tiled masked spaxels frozen", float(np.abs(frozen).max()) == 0.0
    )
    h = p.f // 2
    conv = cv.convolve_cube(st.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    model = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - st.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
    scale = float(np.abs(np.asarray(conv)).max()) or 1.0
    err = np.abs(np.asarray(model)[w > 0] - np.asarray(conv)[w > 0]).max()
    ok &= check(
        "  masked invariant", err / scale < 3e-5, f"err={err:.2e}"
    )
    ok &= check("  nonvacuous", float(st.n_accept) > 80)
    return ok


def tiled_segmentation_case(sampler="mh"):
    """HBM-tiled kernel: segmented == monolithic, bit-exact (resume path)."""
    rng = np.random.default_rng(5)
    L, Y, X = 64, 20, 20
    var = 0.04
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 5.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0)
    )
    data = truth + np.sqrt(var) * rng.standard_normal((L, Y, X)).astype(
        np.float32
    )
    cube = Cube.from_data(
        data, variance=np.full_like(data, var), crval=4750.0, cdelt=1.25
    )
    cfg = sm.RunConfig(
        max_iterations=6, burn_in=2, seed=11, fsf_size=5, lsf_width=5,
        engine="pallas_tiled", tile=(2, 2), sampler=sampler,
    )
    p = sm.make_problem(cube, inst, cfg)
    assert p.config.engine == "pallas_tiled", p.config.engine
    mono = sm.run_sweeps(p, sm.init_state(p), 6)
    part = sm.run_sweeps(p, sm.init_state(p), 3)
    part2 = sm.run_sweeps(p, part.state, 3)
    ok = check(
        f"tiled segmented == monolithic ({sampler})",
        bool(jnp.array_equal(mono.state.clean, part2.state.clean))
        and bool(jnp.array_equal(mono.state.resid, part2.state.resid))
        and float(mono.state.chi2) == float(part2.state.chi2),
    )
    return ok


def multichain_case(n_chains=8, sampler="mh", n_sweeps=100):
    """Batched-chains kernel (config #3): per-chain invariant + determinism
    + distinct chains, through the chains layer's grouped kernel path."""
    from deconv3d_tpu import chains as chn

    rng = np.random.default_rng(3)
    L, Y, X = 16, 6, 6
    var = 0.01
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 5.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0)
    )
    data = truth + np.sqrt(var) * rng.standard_normal((L, Y, X)).astype(
        np.float32
    )
    cube = Cube.from_data(
        data, variance=np.full_like(data, var), crval=4750.0, cdelt=1.25
    )
    cfg = sm.RunConfig(
        max_iterations=n_sweeps, burn_in=n_sweeps // 4, seed=7,
        fsf_size=5, lsf_width=5, engine="pallas", sampler=sampler,
    )
    p = sm.make_problem(cube, inst, cfg)
    states = chn.init_chain_states(p, n_chains)
    mc = chn.run_chains(p, n_chains, n_sweeps=n_sweeps, states=states)
    st = mc.result.state
    h = p.f // 2
    ok = True
    worst = 0.0
    for i in range(n_chains):
        conv = cv.convolve_cube(st.clean[i][:, : p.Y, : p.X], p.fsf, p.lsf)
        model = (
            p.data_pad[:, h : h + p.Y, h : h + p.X]
            - st.resid[i][:, h : h + p.Y, h : h + p.X]
        )
        w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
        scale = float(np.abs(np.asarray(conv)).max()) or 1.0
        err = np.abs(
            np.asarray(model)[w > 0] - np.asarray(conv)[w > 0]
        ).max() / scale
        worst = max(worst, err)
        chi_r, chi_f = float(st.chi2[i]), float(sm.full_chi2(p, jax.tree_util.tree_map(lambda x: x[i], st)))
        ok &= err < 3e-5 and abs(chi_r - chi_f) / max(chi_f, 1.0) < 2e-5
    ok = check(
        f"multichain invariant  {n_chains} chains {sampler}",
        ok, f"worst_resid_err={worst:.2e}",
    )
    # chains must be DISTINCT samples
    ok &= check(
        "  chains distinct",
        not bool(jnp.array_equal(st.clean[0], st.clean[1])),
    )
    # determinism of the whole batched run
    mc2 = chn.run_chains(p, n_chains, n_sweeps=n_sweeps,
                         states=chn.init_chain_states(p, n_chains))
    ok &= check(
        "  deterministic",
        bool(jnp.array_equal(st.clean, mc2.result.state.clean)),
    )
    return ok


def kernel_sharded_case(L=512, Y=60, X=60, n_timed=32, sampler="mh"):
    """Kernel-rate sharded sweep (parallel/kernel_sharded.py), single-shard
    degenerate case on the real chip: pallas interior + jnp edge pass +
    (self-)halo exchange.  Checks the invariant, chi² consistency,
    determinism, and throughput vs the unsharded tiled engine."""
    import time

    from jax.sharding import Mesh
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_sweeps_kernel_sharded,
    )

    rng = np.random.default_rng(21)
    var = 0.25
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 8.0
    inst = ins.Instrument(
        fsf=ins.MoffatFSF(fwhm=0.66, beta=2.6, lambda_ref=4800.0,
                          fwhm_slope=-3e-5),
        lsf=ins.MUSELSF(),
    )
    data = truth + np.sqrt(var) * rng.standard_normal((L, Y, X)).astype(
        np.float32
    )
    cube = Cube.from_data(
        data, variance=np.full_like(data, var), crval=4750.0, cdelt=1.25
    )
    cfg = sm.RunConfig(
        max_iterations=200, burn_in=50, seed=3, fsf_size=9, lsf_width=7,
        engine="pallas_tiled", sampler=sampler,
    )
    p = sm.make_problem(cube, inst, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))

    state0 = sm.init_state(p)
    res = run_sweeps_kernel_sharded(p, state0, 4, mesh)        # compile
    jax.block_until_ready(res.state.clean)
    res = run_sweeps_kernel_sharded(p, res.state, n_timed, mesh)
    jax.block_until_ready(res.state.clean)
    t0 = time.perf_counter()
    res = run_sweeps_kernel_sharded(p, res.state, n_timed, mesh)
    jax.block_until_ready(res.state.clean)
    rate_sh = n_timed / (time.perf_counter() - t0)

    st = res.state
    h = p.f // 2
    conv = cv.convolve_cube(st.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    model = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - st.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X], np.float32)
    scale = float(np.abs(np.asarray(conv)).max()) or 1.0
    inv_err = np.abs(np.asarray(model)[w > 0] - np.asarray(conv)[w > 0]).max()
    chi_r, chi_f = float(st.chi2), float(sm.full_chi2(p, st))
    ok = check(
        f"kernel-sharded invariant  L={L} {Y}x{X} 1-shard {sampler}",
        inv_err / scale < 3e-5 and abs(chi_r - chi_f) / max(chi_f, 1.0) < 2e-5,
        f"resid_err={inv_err:.2e} chi2_rel={(chi_r - chi_f) / chi_f:+.2e} "
        f"acc={float(st.n_accept):.0f}",
    )
    # determinism incl. segmentation (absolute-sweep RNG)
    r1 = run_sweeps_kernel_sharded(p, state0, 8, mesh)
    r2a = run_sweeps_kernel_sharded(p, state0, 4, mesh)
    r2b = run_sweeps_kernel_sharded(p, r2a.state, 4, mesh)
    ok &= check(
        "  segmented == monolithic",
        bool(jnp.array_equal(r1.state.clean, r2b.state.clean)),
    )

    if sampler != "mh":
        return ok
    # unsharded tiled engine, production segmenting — the rate baseline
    ru = sm.run_sweeps(p, sm.init_state(p), n_timed)
    jax.block_until_ready(ru.state.clean)
    t0 = time.perf_counter()
    ru = sm.run_sweeps(p, ru.state, n_timed)
    jax.block_until_ready(ru.state.clean)
    rate_un = n_timed / (time.perf_counter() - t0)
    ok &= check(
        "  single-shard rate vs unsharded tiled",
        rate_sh > 0.5 * rate_un,
        f"sharded={rate_sh:.1f}/s unsharded={rate_un:.1f}/s "
        f"ratio={rate_sh / rate_un:.2f}",
    )
    return ok


def direct_sharded_case(L=64, Y=24, X=24, n_draws=3):
    """GSPMD-sharded direct sampler with PRODUCTION defaults on the chip.

    The CPU mesh cannot cover this program: Y-sharded rfft2 operands inside
    the jit trip the CPU fft_thunk layout RET_CHECK, so the CPU tests force
    ``direct_precond='jacobi'`` (tests/test_direct_sharded.py) — this case
    is the only execution of the production combination (banded_radial
    preconditioner's FFT solves + the backend-auto conv path) through
    ``run_direct_sweeps_sharded``'s sharded jit.  A 1-device mesh is the
    degenerate topology the chip affords; GSPMD still lays the program out
    through the sharding machinery (out_shardings, placed operands).
    Checks: chain equality vs the unsharded engine, solver convergence, and
    the residual invariant.
    """
    from jax.sharding import Mesh
    from deconv3d_tpu.parallel.direct_sharded import (
        run_direct_sweeps_sharded,
    )

    rng = np.random.default_rng(31)
    var = 0.25
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 8.0
    # Moderate blur (the tests' convergent regime): under a heavy chromatic
    # Moffat (fwhm 0.66, f=9) the flat-prior normal operator is near-
    # singular and CG stalls at rel≈0.06 regardless of preconditioner or
    # precision (measured f32 AND f64) — the documented hard regime where
    # the convergence flag rides the accept trace.  This case validates
    # the sharded PROGRAM, so it uses a well-posed instrument.
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.4), lsf=ins.GaussianLSF(fwhm=2.0)
    )
    data = truth + np.sqrt(var) * rng.standard_normal((L, Y, X)).astype(
        np.float32
    )
    cube = Cube.from_data(
        data, variance=np.full_like(data, var), crval=4750.0, cdelt=1.25
    )
    cfg = sm.RunConfig(
        max_iterations=2 * n_draws, seed=7, fsf_size=5, lsf_width=5,
        sampler="direct", direct_precond="banded_radial",
        direct_tol=1e-5, direct_maxiter=2000,
    )
    p = sm.make_problem(cube, inst, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    st0 = sm.init_state(p)

    res_sh = run_direct_sweeps_sharded(p, st0, n_draws, mesh)
    jax.block_until_ready(res_sh.state.clean)
    res_un = sm.run_sweeps(p, st0, n_draws)
    jax.block_until_ready(res_un.state.clean)

    # same chain (RNG keys are sharding-independent); floats match to
    # solver tolerance — both runs solve to direct_tol from the same b.
    c_sh = np.asarray(res_sh.state.clean)
    c_un = np.asarray(res_un.state.clean)
    scale = float(np.abs(c_un).max()) or 1.0
    diff = float(np.abs(c_sh - c_un).max()) / scale
    conv_flags = np.asarray(res_sh.accept_trace)
    ok = check(
        f"direct-sharded production precond  L={L} {Y}x{X} 1-dev mesh",
        diff < 5e-4 and bool(conv_flags.min() >= 1.0),
        f"vs_unsharded={diff:.2e} converged={conv_flags.tolist()}",
    )
    # residual invariant: direct recomputes resid from scratch every draw,
    # so data − resid must equal conv(clean) to solver tolerance.
    st = res_sh.state
    h = p.f // 2
    conv = cv.convolve_cube(st.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    model = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - st.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X], np.float32)
    cscale = float(np.abs(np.asarray(conv)).max()) or 1.0
    inv_err = np.abs(np.asarray(model)[w > 0] - np.asarray(conv)[w > 0]).max()
    ok &= check(
        "  invariant", inv_err / cscale < 3e-5, f"resid_err={inv_err:.2e}"
    )
    return ok


def main():
    assert jax.default_backend() == "tpu", "run on the TPU"
    ok = True
    # Gaussian (rank-1 exact), small
    ok &= invariant_case(ins.GaussianFSF(fwhm=0.5), ins.GaussianLSF(fwhm=2.0),
                         5, 5, 16, 6, 6, 0.01, 200)
    # chromatic Moffat (rank>1), wavelength-dependent LSF, masked-free
    ok &= invariant_case(
        ins.MoffatFSF(fwhm=0.66, beta=2.6, lambda_ref=4800.0,
                      fwhm_slope=-3e-5),
        ins.MUSELSF(), 9, 7, 64, 12, 12, 0.25, 100,
    )
    # exact-Gibbs mode in the fused kernel (all λ phases per slab visit)
    ok &= invariant_case(ins.GaussianFSF(fwhm=0.5), ins.GaussianLSF(fwhm=2.0),
                         5, 5, 16, 6, 6, 0.01, 100, sampler="gibbs")
    ok &= invariant_case(
        ins.MoffatFSF(fwhm=0.66, beta=2.6, lambda_ref=4800.0,
                      fwhm_slope=-3e-5),
        ins.MUSELSF(), 9, 7, 64, 12, 12, 0.25, 60, sampler="gibbs",
    )
    ok &= multichain_case(8, "mh")
    ok &= multichain_case(8, "gibbs", n_sweeps=60)
    ok &= statistical_case()
    # ---- HBM-tiled kernel (ops/pallas_tiled.py): multi-tile geometries ----
    # f=5 with nx_t=2 exercises the 16-misaligned window base (xoff=10, 30).
    ok &= invariant_case(
        ins.GaussianFSF(fwhm=0.5), ins.GaussianLSF(fwhm=2.0),
        5, 5, 64, 20, 20, 0.04, 150, engine="pallas_tiled", tile=(2, 2),
    )
    # chromatic Moffat (rank>1) through the tiled path, 1-spaxel tiles
    ok &= invariant_case(
        ins.MoffatFSF(fwhm=0.66, beta=2.6, lambda_ref=4800.0,
                      fwhm_slope=-3e-5),
        ins.MUSELSF(), 9, 7, 64, 15, 15, 0.25, 80,
        engine="pallas_tiled", tile=(1, 1),
    )
    ok &= tiled_segmentation_case()
    ok &= tiled_masked_case()
    ok &= statistical_case(engine="pallas_tiled", tile=(1, 2))
    # ---- exact-Gibbs through the tiled kernel (fori_loop λ-phase loop) ----
    ok &= invariant_case(
        ins.GaussianFSF(fwhm=0.5), ins.GaussianLSF(fwhm=2.0),
        5, 5, 64, 20, 20, 0.04, 100, sampler="gibbs",
        engine="pallas_tiled", tile=(2, 2),
    )
    ok &= invariant_case(
        ins.MoffatFSF(fwhm=0.66, beta=2.6, lambda_ref=4800.0,
                      fwhm_slope=-3e-5),
        ins.MUSELSF(), 9, 7, 64, 15, 15, 0.25, 60, sampler="gibbs",
        engine="pallas_tiled", tile=(1, 1),
    )
    ok &= tiled_segmentation_case(sampler="gibbs")
    ok &= statistical_case(engine="pallas_tiled", tile=(1, 2),
                           sampler="gibbs")
    # ---- kernel-rate sharded sweep (single-shard degenerate on-chip) ----
    ok &= kernel_sharded_case()
    ok &= kernel_sharded_case(L=128, Y=40, X=40, n_timed=8, sampler="gibbs")
    # ---- GSPMD direct sampler, production preconditioner (TPU-only) ----
    ok &= direct_sharded_case()
    print("ALL PASS" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
