"""The judge's canonical blurred-field drive as a recorded artifact.

VERDICT r3 weak #6 → r4 weak #2: MUSE defaults (f=17 Moffat) on a 24×24
field — the blur-dominated regime.  Round 4 recorded single-seed box-flux
point values with no uncertainties, which made the recovery claims
unadjudicable.  This round every flow carries:

  * ``posterior_std``: std of the box-flux functional over the post-burn
    chain trace (the box monitors are traced per sweep), i.e. the chain's
    own estimate of the flat-prior posterior width;
  * ``se_mean``: MC standard error of the recovered value (trace std/√ESS);
  * ``z_vs_injected``: (recovered − 100) / √(posterior_std² + se_mean²) —
    the full-field drives' z-score convention;
  * ``seeds``: the recovered value per chain seed (fixed data), with the
    cross-seed mean ± std.

Flows (the r5 retuned default at this size is PLAIN mh — coarse passes
measured 0.08–0.5× wall-clock ESS/s here, COARSE_REGIMES_r05.json):

  * default Run flow (mh, plain after the r5 retune)
  * mh + coarse_every=8 (the r4 default, kept for contrast)
  * sampler='gibbs' (plain) and gibbs + coarse8 (r4's 155/100 case)
  * map_estimate(prior_precision='auto')  — the deterministic answer

    python benchmarks/canonical_recovery.py     # writes CANONICAL_r05.json
"""

import dataclasses
import json
import time

import numpy as np

import jax.numpy as jnp

import deconv3d_tpu as d3d
from deconv3d_tpu import chains as chn


def build():
    truth = np.zeros((64, 24, 24), np.float32)
    truth[30, 12, 12] = 100.0
    cube = d3d.Cube.from_data(truth, crval=4750.0, cdelt=1.25)
    muse = d3d.MUSE()
    observed = muse.convolve(cube)
    noisy = d3d.Cube.from_data(
        np.asarray(observed.data)
        + np.random.default_rng(0).normal(0, 0.05, truth.shape).astype(
            np.float32
        ),
        variance=np.full(truth.shape, 0.05**2, np.float32),
        crval=4750.0, cdelt=1.25,
    )
    return noisy, muse, truth


BOX_L = (24, 37)   # ±2 LSF widths around the injected λ=30


def box_flux(mean, f):
    h = f // 2
    return float(np.asarray(mean)[BOX_L[0]:BOX_L[1], 12 - h:12 + h + 1,
                                  12 - h:12 + h + 1].sum())


def _box_monitor_idx(problem):
    """Monitor indices covering the SAME box box_flux() integrates."""
    p = problem
    h = p.f // 2
    idx = [
        lam * p.Yc * p.Xc + y * p.Xc + x
        for lam in range(*BOX_L)
        for y in range(12 - h, 12 + h + 1)
        for x in range(12 - h, 12 + h + 1)
    ]
    return jnp.asarray(np.asarray(idx, np.int32))


def run_flow(noisy, muse, seed, sampler="mh", coarse_every=None,
             max_iterations=2000, burn_in=None):
    kw = dict(max_iterations=max_iterations, seed=seed, sampler=sampler)
    if burn_in is not None:
        kw["burn_in"] = burn_in
    if coarse_every is not None:
        kw["coarse_every"] = coarse_every
    run = d3d.Run(noisy, muse, **kw)
    # trace the box functional itself (posterior-width evidence)
    run.problem = dataclasses.replace(
        run.problem, monitor_idx=_box_monitor_idx(run.problem))
    run.run()
    mean = run.deconvolved_cube()
    flux = box_flux(mean.data, run.problem.f)
    # post-burn-in box-flux trace → posterior std + MC error of the mean
    burn = run.config.resolved_burn_in()
    mon = run.trace("monitor")                  # [1, n, K]
    n = mon.shape[1]
    start = max(burn - (run.sweeps_done - n), 0)
    box_tr = mon[0, start:, :].sum(axis=1)
    post_std = float(box_tr.std(ddof=1))
    ess = max(float(chn.effective_sample_size(box_tr)), 2.0)
    se_mean = post_std / np.sqrt(ess)
    return run, flux, post_std, se_mean, ess


def main():
    noisy, muse, truth = build()
    out = {"injected": 100.0, "cases": []}

    flows = [
        # label, sampler, coarse_every(None=auto), iters, burn, n_seeds
        ("default_mh (plain after r5 retune)", "mh", None, 2000, None, 5),
        ("mh_coarse8 (r4 default)", "mh", 8, 2000, None, 3),
        ("gibbs_plain", "gibbs", None, 800, 400, 5),
        ("gibbs_coarse8", "gibbs", 8, 800, 400, 3),
    ]
    for label, sampler, every, iters, burn, n_seeds in flows:
        fluxes, t0 = [], time.time()
        post_std = se_mean = ess = None
        run = None
        for s in range(n_seeds):
            run, flux, post_std, se_mean, ess = run_flow(
                noisy, muse, seed=1 + s, sampler=sampler,
                coarse_every=every, max_iterations=iters, burn_in=burn)
            fluxes.append(round(flux, 2))
        dt = (time.time() - t0) / n_seeds
        rec = float(np.mean(fluxes))
        sig = float(np.sqrt(post_std**2 + se_mean**2))
        case = {
            "label": label,
            "coarse_every": run.config.coarse_every,
            "box_flux_recovered": round(rec, 2),
            "seeds": fluxes,
            "seed_spread_std": round(float(np.std(fluxes, ddof=1)), 2),
            "posterior_std": round(post_std, 2),
            "se_mean": round(se_mean, 2),
            "box_ess": round(ess, 1),
            "z_vs_injected": round((rec - 100.0) / sig, 2),
            "chi2_per_dof": round(run.chi2 / truth.size, 5),
            "seconds_per_run": round(dt, 1),
        }
        out["cases"].append(case)
        print(json.dumps(case), flush=True)

    # deterministic MAP (ridge): the recommended point estimate at this
    # size (the init-time warning routes here).  No chain ⇒ the error bar
    # is the data-noise constraint on the box functional: the box flux is
    # blur-preserved, so σ ≈ noise·√(box data voxels).
    t0 = time.time()
    run = d3d.Run(noisy, muse, max_iterations=2000, seed=1)
    mp = run.map_estimate(prior_precision="auto")
    d = np.asarray(mp.data)
    f = run.problem.f
    peak = tuple(int(i) for i in np.unravel_index(np.abs(d).argmax(),
                                                  d.shape))
    n_box = (BOX_L[1] - BOX_L[0]) * (2 * (f // 2) + 1) ** 2
    case = {
        "label": "map_estimate_auto_ridge",
        "box_flux_recovered": round(box_flux(mp.data, f), 2),
        "data_noise_sigma_box": round(0.05 * float(np.sqrt(n_box)), 2),
        "peak_voxel": peak,
        "peak_at_truth": peak == (30, 12, 12),
        "seconds": round(time.time() - t0, 1),
    }
    out["cases"].append(case)
    print(json.dumps(case), flush=True)

    with open("CANONICAL_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
