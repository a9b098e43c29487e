"""Cross-validate the MCMC engines against exact direct draws (VERDICT r4 #3).

BASELINE.json:5 requires "chains statistically matched to the reference
sampler"; with the reference unrunnable (mount empty every round), the
strongest evidence this environment permits is internal: the `direct`
sampler produces INDEPENDENT exact draws from the same flat-prior Gaussian
posterior the MCMC engines target (dense-oracle-tested at toy scale in
tests/test_direct.py), so its sample moments are ground truth with known
iid standard errors.

Statistical design — exact-start stationarity test.  Blur makes the
posterior ill-conditioned (cond(KᵀWK) ~ 1e8+ even at moderate footprints),
so within-chain ESS cannot certify mixing in any affordable window, and
z-tests built on ESS-based standard errors are invalid exactly where the
engines are most at risk.  Instead, each MCMC chain is STARTED at an
independent exact posterior draw: under H0 (the chain targets the same
posterior) every chain is stationary from sweep 0, so

  * each chain's time-average of f(x) is an unbiased estimate of E[f]
    REGARDLESS of mixing speed, and the C chain-averages are iid
    ⇒ cross-chain standard errors are honest;
  * each chain's time-average of (f(x) − μ₀)², with μ₀ the exact mean,
    is an unbiased estimate of Var[f] (using μ₀, not the chain's own
    mean, removes the slow-mixing bias of the sample variance).

A sampler whose stationary distribution is wrong (bad acceptance algebra,
wrong conditional precision, a coarse pass that breaks detailed balance)
drifts away from the exact moments and fails the z-test; slow mixing alone
cannot produce a false positive.  Power: detects mean biases ≳ 2·σ_post/√C.

Functionals: monitor voxels in a box around each source + scattered valid
voxels + the two box-flux sums (the full-field drives' recovery metric).

    python benchmarks/mcmc_vs_direct.py    # writes MCMC_VS_DIRECT_r05.json

A CI-scale version (analytic dense truth instead of direct draws) runs in
tests/test_mcmc_vs_direct.py.
"""

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube, instruments as ins, sampler as sm


# ---------------------------------------------------------------------------
# Exact-start pooled z-statistics
# ---------------------------------------------------------------------------

def pooled_mean_z(chain_traces, mu0, mu0_se=None):
    """z-scores of the pooled chain mean against the exact mean.

    chain_traces: [C, n, K], each chain started at an iid exact draw.
    mu0 [K]: exact reference mean; mu0_se [K]: its standard error (None or
    0 for analytic truth).  Cross-chain se — no ESS estimate anywhere.
    """
    cm = chain_traces.mean(axis=1)                       # [C, K]
    C = cm.shape[0]
    pooled = cm.mean(axis=0)
    se = cm.std(axis=0, ddof=1) / np.sqrt(C)
    if mu0_se is not None:
        se = np.sqrt(se**2 + np.asarray(mu0_se) ** 2)
    return (pooled - mu0) / np.maximum(se, 1e-30)


def pooled_var_z(chain_traces, mu0, var0, var0_se=None):
    """z-scores of the pooled second moment about μ₀ against Var₀.

    CAVEAT (calibration): for a functional the chain barely moves, each
    chain's time-average of (f−μ₀)² is ≈ ONE χ²₁ draw, so the cross-chain
    t-statistic is heavy-tailed, not normal — |z| ~ 10 occurs under H0.
    Sharp assertions on z_var are only valid where the squared series has
    real within-chain evidence; gate with :func:`var_dof` (the mean test
    needs no gate — chain means of a Gaussian posterior are Gaussian).
    """
    v = ((chain_traces - mu0) ** 2).mean(axis=1)          # [C, K]
    C = v.shape[0]
    pooled = v.mean(axis=0)
    se = v.std(axis=0, ddof=1) / np.sqrt(C)
    if var0_se is not None:
        se = np.sqrt(se**2 + np.asarray(var0_se) ** 2)
    return (pooled - var0) / np.maximum(se, 1e-30)


def pooled_var_ratio(chain_traces, mu0, var0):
    """Pooled second moment about μ₀ over Var₀ [K] — the gross-scale
    variance guard that stays valid for arbitrarily slow functionals
    (each chain's v_c has expectation Var₀; worst-case v̄ ~ χ²_C/C)."""
    v = ((chain_traces - mu0) ** 2).mean(axis=1).mean(axis=0)
    return v / np.maximum(var0, 1e-30)


def var_dof(chain_traces, mu0):
    """Total within-chain ESS of the squared series per functional [K] —
    the evidence gate for sharp z_var assertions (≥ ~64 ⇒ near-normal)."""
    from deconv3d_tpu import chains as chn

    sq = (np.asarray(chain_traces) - mu0) ** 2            # [C, n, K]
    C, _, K = sq.shape
    return np.asarray([
        sum(max(chn.effective_sample_size(sq[c, :, k]), 1.0)
            for c in range(C))
        for k in range(K)
    ])


def summarize(z_mean, z_var=None, ratio=None, sharp=None):
    out = {
        "max_abs_z_mean": round(float(np.max(np.abs(z_mean))), 2),
        "q95_abs_z_mean": round(float(np.quantile(np.abs(z_mean), 0.95)), 2),
    }
    if ratio is not None:
        out["var_ratio_range"] = [round(float(ratio.min()), 3),
                                  round(float(ratio.max()), 3)]
    if z_var is not None and sharp is not None:
        out["n_var_sharp"] = int(sharp.sum())
        if sharp.any():
            zs = np.abs(z_var[sharp])
            out["max_abs_z_var_sharp"] = round(float(zs.max()), 2)
            out["q95_abs_z_var_sharp"] = round(
                float(np.quantile(zs, 0.95)), 2)
    return out


# ---------------------------------------------------------------------------
# Problem construction (shared with the CI-scale test)
# ---------------------------------------------------------------------------

def build_field(L, Y, X, fsf_size, seed=0, noise=1.0, fwhm=0.5,
                fwhm_slope=-3e-5, gaussian=False):
    """Chromatic-blur field with mask + per-voxel variance + two sources."""
    rng = np.random.default_rng(seed)
    truth = np.zeros((L, Y, X), np.float32)
    s1 = (L // 3, Y // 3, X // 3)
    s2 = (2 * L // 3, 2 * Y // 3, 2 * X // 3)
    truth[s1] = 60.0
    truth[s2] = 40.0
    # per-voxel variance: smooth ×2 spatial gradient (C2: weighted chi²)
    sig = noise * (1.0 + np.linspace(0, 1, X, dtype=np.float32))[None, None]
    var = np.broadcast_to(sig**2, truth.shape).astype(np.float32).copy()
    # mask a corner block + a stripe (C8)
    mask = np.zeros((Y, X), bool)
    mask[: Y // 8, : X // 8] = True
    mask[Y // 2, :] = True
    if gaussian:
        fsf = ins.GaussianFSF(fwhm=fwhm)
    else:
        fsf = ins.MoffatFSF(fwhm=fwhm, beta=2.5, fwhm_slope=fwhm_slope,
                            lambda_ref=4750.0 + 1.25 * L / 2)
    inst = ins.Instrument(fsf=fsf, lsf=ins.MUSELSF(), pixel_scale=0.2)
    cfg0 = sm.RunConfig(max_iterations=1, seed=0, fsf_size=fsf_size)
    c0 = Cube.from_data(truth, variance=var, crval=4750.0, cdelt=1.25)
    p0 = sm.make_problem(c0, inst, cfg0)
    import deconv3d_tpu.convolve as cv
    obs = np.asarray(cv.convolve_cube(jnp.asarray(truth), p0.fsf, p0.lsf))
    data = obs + np.sqrt(var) * rng.standard_normal(truth.shape).astype(
        np.float32)
    cube = Cube.from_data(data, variance=var, mask=mask,
                          crval=4750.0, cdelt=1.25)
    return cube, inst, (s1, s2)


def monitor_for(problem, sources, half=1, lhalf=1, extra=8):
    """Monitor indices: a box around each source + scattered valid voxels.

    Returns (idx array, list of per-box column slices for box-flux sums).
    """
    p = problem
    valid = np.asarray(p.valid)
    idx, boxes = [], []
    for (l0, y0, x0) in sources:
        start = len(idx)
        for dl in range(-lhalf, lhalf + 1):
            for dy in range(-half, half + 1):
                for dx in range(-half, half + 1):
                    y, x = y0 + dy, x0 + dx
                    if 0 <= y < p.Y and 0 <= x < p.X and valid[y, x]:
                        idx.append(((l0 + dl) % p.L) * p.Yc * p.Xc
                                   + y * p.Xc + x)
        boxes.append(slice(start, len(idx)))
    rng = np.random.default_rng(11)
    vy, vx = np.nonzero(valid[: p.Y, : p.X])
    pick = rng.choice(len(vy), size=extra, replace=False)
    for j in pick:
        idx.append(int(rng.integers(0, p.L)) * p.Yc * p.Xc
                   + vy[j] * p.Xc + vx[j])
    return jnp.asarray(np.asarray(idx, np.int32)), boxes


def with_monitors(cube, inst, cfg, sources, **kw):
    p = sm.make_problem(cube, inst, cfg)
    midx, boxes = monitor_for(p, sources, **kw)
    return dataclasses.replace(p, monitor_idx=midx), boxes


def add_box_columns(trace, boxes):
    """Append per-box flux sums as extra columns of the [..., n, K] trace."""
    cols = [trace] + [trace[..., b].sum(axis=-1, keepdims=True)
                      for b in boxes]
    return np.concatenate(cols, axis=-1)


# ---------------------------------------------------------------------------
# Drives
# ---------------------------------------------------------------------------

def direct_truth(cube, inst, sources, n_draws, fsf_size, maxiter, tol=1e-5,
                 seg=16):
    """N iid exact draws: reference moments + their standard errors.

    Chunked into ``seg``-draw segments with a host sync between: one
    200-draw scan is a ~40-minute single device program, long enough to
    trip the tunneled backend (measured UNAVAILABLE fault, 2026-08-20).
    """
    cfg = sm.RunConfig(max_iterations=n_draws, burn_in=0, seed=42,
                       sampler="direct", fsf_size=fsf_size,
                       direct_maxiter=maxiter, direct_tol=tol)
    p, boxes = with_monitors(cube, inst, cfg, sources)
    t0 = time.time()
    st = sm.init_state(p)
    mons, accs = [], []
    done = 0
    while done < n_draws:
        k = min(seg, n_draws - done)
        r = sm.run_sweeps(p, st, k)
        st = r.state
        jax.block_until_ready(st.clean)
        mons.append(np.asarray(r.monitor_trace))
        accs.append(np.asarray(r.accept_trace))
        done += k
        print(f"  direct {done}/{n_draws} "
              f"({done / (time.time() - t0):.2f} draws/s)", flush=True)
    dt = time.time() - t0
    conv = float(np.concatenate(accs).mean())
    if conv < 1.0:
        raise RuntimeError(
            f"only {conv:.0%} of direct draws converged (maxiter={maxiter}) "
            "— ground truth would be biased; raise maxiter")
    tr = add_box_columns(np.concatenate(mons, axis=0), boxes)
    N = tr.shape[0]
    mu0 = tr.mean(0)
    s0 = tr.std(0, ddof=1)
    var0 = s0**2
    return dict(trace=tr, boxes=boxes, seconds=dt, mu0=mu0,
                mu0_se=s0 / np.sqrt(N),
                var0=var0, var0_se=var0 * np.sqrt(2.0 / (N - 1)))


def exact_start_cubes(cube, inst, sources, n_chains, fsf_size, maxiter,
                      tol=1e-5, seed0=1000):
    """n_chains independent exact posterior draws as full cubes (chain
    starting points), via one-draw direct runs."""
    starts = []
    for c in range(n_chains):
        cfg = sm.RunConfig(max_iterations=1, burn_in=0, seed=seed0 + c,
                           sampler="direct", fsf_size=fsf_size,
                           direct_maxiter=maxiter, direct_tol=tol)
        p = sm.make_problem(cube, inst, cfg)
        r = sm.run_sweeps(p, sm.init_state(p), 1)
        if float(np.asarray(r.accept_trace).min()) < 1.0:
            raise RuntimeError(f"start draw {c} unconverged")
        starts.append(np.asarray(r.state.clean[:, : p.Y, : p.X]))
    return starts


def exact_start_traces(cube, inst, sources, sampler, n_sweeps, fsf_size,
                       starts, coarse_every=None, seed0=2000):
    """[C, n, K] monitor traces of C chains started at exact draws."""
    traces = []
    boxes = None
    t0 = time.time()
    for c, start in enumerate(starts):
        cfg = sm.RunConfig(max_iterations=n_sweeps, burn_in=0,
                           seed=seed0 + c, sampler=sampler,
                           fsf_size=fsf_size, initial="data",
                           coarse_every=coarse_every, coarse_mode="global")
        p, boxes = with_monitors(cube, inst, cfg, sources)
        st = sm.init_state(
            p, Cube.from_data(start, crval=4750.0, cdelt=1.25))
        r = sm.run_sweeps(p, st, n_sweeps)
        traces.append(np.asarray(r.monitor_trace))
    tr = add_box_columns(np.stack(traces), boxes)
    return tr, time.time() - t0


def main():
    L, Y, X, fsf_size = 512, 64, 64, 13
    n_direct, n_chains, maxiter = 200, 8, 4000
    cube, inst, sources = build_field(L, Y, X, fsf_size)
    out = {"geometry": [L, Y, X], "fsf_size": fsf_size,
           "n_direct": n_direct, "n_chains": n_chains,
           "device": str(jax.devices()[0])}

    gt = direct_truth(cube, inst, sources, n_direct, fsf_size, maxiter)
    out["direct_seconds"] = round(gt["seconds"], 1)
    out["n_functionals"] = int(gt["mu0"].shape[0])
    print("direct ground truth:", gt["trace"].shape,
          f"{gt['seconds']:.0f}s", flush=True)

    starts = exact_start_cubes(cube, inst, sources, n_chains, fsf_size,
                               maxiter)
    print("start draws ready", flush=True)

    cases = [
        ("gibbs", "gibbs", 1500, None),
        ("mh", "mh", 4000, None),
        ("mh_coarse8", "mh", 1500, 8),
    ]
    for label, samp, n, every in cases:
        tr, dtm = exact_start_traces(cube, inst, sources, samp, n,
                                     fsf_size, starts, coarse_every=every)
        z_mean = pooled_mean_z(tr, gt["mu0"], gt["mu0_se"])
        z_var = pooled_var_z(tr, gt["mu0"], gt["var0"], gt["var0_se"])
        ratio = pooled_var_ratio(tr, gt["mu0"], gt["var0"])
        sharp = var_dof(tr, gt["mu0"]) >= 64.0
        out[label] = summarize(z_mean, z_var, ratio, sharp)
        out[label]["n_sweeps"] = n
        out[label]["seconds"] = round(dtm, 1)
        print(label, out[label], flush=True)

    with open("MCMC_VS_DIRECT_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
