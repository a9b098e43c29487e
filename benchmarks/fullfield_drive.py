"""Config #4 drive: Run a full MUSE field (300×300×3681) on one chip.

BASELINE.json:10 — "up to full MUSE fields".  This script builds a synthetic
emission-line field ON DEVICE (host→device through the tunneled PJRT link is
~7 MB/s; a 1.3 GB cube would take minutes), runs warm-up + a long timed
steady-state window through the auto-selected engine (HBM-tiled Pallas
kernel on TPU, ops/pallas_tiled.py), and writes FULLFIELD_r0N.json next to
the repo root.

Round-3 shape (VERDICT r2 weak #3 / next #1 and #4): the data is the
CONVOLVED truth plus noise (so chi²/DOF has a meaningful noise floor and
point-source recovery is checkable), the drive runs ≥1000 sweeps with a
real burn-in, and ``--sampler gibbs`` exercises the tiled kernel's
exact-Gibbs mode at full-field scale.

    python benchmarks/fullfield_drive.py --sweeps 1000 --burn 300
    python benchmarks/fullfield_drive.py --sampler gibbs --sweeps 300

Round-2 history: the jnp λ-chunked fallback measured 0.032 sweeps/s; the
tiled kernel (1.95 sweeps/s MH) is the fix.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube, instruments as ins, sampler as sm
from deconv3d_tpu import convolve as cv

SOURCES = [
    (1800, 150, 150, 50.0), (900, 80, 220, 30.0), (2900, 240, 40, 40.0),
]


def build_field(inst, L=3681, Y=300, X=300, noise=1.0, seed=0):
    """data = conv(truth) + noise, built on device; returns (cube, truth_amp)."""
    truth = jnp.zeros((L, Y, X), jnp.float32)
    for (lam, y, x, amp) in SOURCES:
        truth = truth.at[lam, y, x].add(amp)
    lamgrid = 4750.0 + 1.25 * np.arange(L)
    fsf = jnp.asarray(inst.fsf.bank(lamgrid, size=None,
                                    pixel_scale=inst.pixel_scale))
    lsf = jnp.asarray(inst.lsf.bank(lamgrid, cdelt=1.25, width=None))
    conv = cv.convolve_cube(truth, fsf, lsf)
    key = jax.random.PRNGKey(seed)
    data = conv + noise * jax.random.normal(key, (L, Y, X), jnp.float32)
    var = jnp.full((L, Y, X), noise**2, jnp.float32)
    return Cube.from_data(data, variance=var, crval=4750.0, cdelt=1.25)


def recovery_check(problem, state):
    """CONVOLVED posterior-mean box fluxes vs the DATA's (z-scored).

    The deconvolved box flux is dominated by blur-null posterior modes;
    and the truth box flux is itself buried under the box's ±√N·σ noise
    (±130 for a 61×17×17 box at σ=1 against amp≈50 sources).  What a
    correct sampler MUST reproduce is the data's box flux: the posterior
    of the model concentrates on the data projection for well-constrained
    functionals, so z = (model − data)/√(Σ var) must be O(1).  The truth
    flux is reported for context only.
    """
    h = problem.f // 2
    lw = int(problem.lsf.shape[1])

    def boxes(conv):
        vals = []
        for (lam, y, x, amp) in SOURCES:
            lo, hi = max(0, lam - 2 * lw), min(problem.L, lam + 2 * lw + 1)
            sl = (slice(lo, hi), slice(max(0, y - h), y + h + 1),
                  slice(max(0, x - h), x + h + 1))
            vals.append(float(jnp.sum(conv[sl])))
        return vals

    # STAGED on huge fields: each conv's FFT temporaries are several GB,
    # so run them one at a time with a sync (and free) between
    truth = jnp.zeros((problem.L, problem.Y, problem.X), jnp.float32)
    for (lam, y, x, amp) in SOURCES:
        truth = truth.at[lam, y, x].add(amp)
    truth_fluxes = boxes(cv.convolve_cube(truth, problem.fsf, problem.lsf))
    del truth
    pm = sm.posterior_mean(problem, state)
    jax.block_until_ready(pm)
    gots = boxes(cv.convolve_cube(pm, problem.fsf, problem.lsf))
    del pm
    hh = problem.f // 2
    data_in = problem.data_pad[:, hh : hh + problem.Y, hh : hh + problem.X]
    data_fluxes = boxes(data_in)
    w_in = problem.w_pad[:, hh : hh + problem.Y, hh : hh + problem.X]
    var_in = jnp.where(w_in > 0, 1.0 / jnp.maximum(w_in, 1e-30), 0.0)
    sig_boxes = [float(jnp.sqrt(v)) for v in boxes(var_in)]
    out = []
    for (lam, y, x, amp), got, dbox, tbox, sig in zip(
        SOURCES, gots, data_fluxes, truth_fluxes, sig_boxes
    ):
        out.append({
            "injected": amp,
            "box_flux_model": round(got, 3),
            "box_flux_data": round(dbox, 3),
            "box_flux_truth": round(tbox, 3),
            "box_noise_sigma": round(sig, 2),
            "z_model_vs_data": round((got - dbox) / max(sig, 1e-9), 3),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=1000,
                    help="timed post-burn-in sweeps")
    ap.add_argument("--burn", type=int, default=300)
    ap.add_argument("--sampler", default="mh", choices=["mh", "gibbs"])
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--coarse-every", type=int, default=0,
                    help="interleave a global coarse pattern pass every N "
                    "sweeps (ops/coarse.py mode='global')")
    ap.add_argument("--spatial-shards", type=int, default=0,
                    help="run the sweep through the kernel-rate band "
                    "decomposition (parallel/kernel_sharded.py) on a mesh "
                    "of this many devices; 1 = single-device band layout "
                    "(measures the band structure's dclean-streaming "
                    "amortisation at full field)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    tag = "_coarse" if args.coarse_every else ""
    if args.spatial_shards:
        tag += f"_sh{args.spatial_shards}"
    out_path = args.out or (
        f"FULLFIELD_r04{tag}.json" if args.sampler == "mh"
        else f"FULLFIELD_r04_{args.sampler}{tag}.json"
    )

    inst = ins.MUSE()
    t0 = time.time()
    holder = [build_field(inst)]
    n_dof = int(np.prod(holder[0].shape))
    cfg = sm.RunConfig(
        max_iterations=args.burn + args.sweeps,
        burn_in=args.burn,
        seed=0,
        sampler=args.sampler,
        engine=args.engine,
        coarse_every=args.coarse_every or None,
        coarse_mode="global",
        track_variance=False,   # HBM: one clean-cube buffer saved
    )
    # hand the ONLY reference over: make_problem releases the input cube's
    # ~2.8 GB (data+variance) mid-build, which the gibbs relayout stages
    # need as headroom on a full field
    problem = sm.make_problem(holder.pop(), inst, cfg)
    print(
        f"problem built in {time.time()-t0:.0f}s  engine={problem.config.engine}"
        f" tile={problem.config.tile} f={problem.f} ny×nx={problem.ny}×{problem.nx}"
        f" sampler={args.sampler}",
        flush=True,
    )

    if args.spatial_shards:
        from jax.sharding import Mesh
        from deconv3d_tpu.parallel.kernel_sharded import (
            run_sweeps_kernel_sharded,
        )

        mesh = Mesh(
            np.asarray(jax.devices()[: args.spatial_shards]), ("sp",)
        )

        def _sweeps(st, n):
            return run_sweeps_kernel_sharded(problem, st, n, mesh)
    else:

        def _sweeps(st, n):
            return sm.run_sweeps(problem, st, n)

    t0 = time.time()
    state = sm.init_state(problem)
    jax.block_until_ready(state.resid)
    chi2_init = float(state.chi2)
    print(f"init_state in {time.time()-t0:.0f}s chi2={chi2_init:.4g}",
          flush=True)

    # One segment-cap batch per run_sweeps call, blocking between calls:
    # on this remote/async backend an unbounded dispatch queue keeps
    # several segments' working sets live at once and can OOM a run whose
    # standing footprint (~7.4 GiB) is otherwise comfortable.  This is
    # also exactly the production cadence (Run.run segments + checkpoint).
    cap = 1
    if problem.config.engine == "pallas_tiled":
        from deconv3d_tpu.ops.pallas_tiled import _max_segment

        cap = _max_segment(problem)
    t0 = time.time()
    res = _sweeps(state, cap)
    del state
    jax.block_until_ready(res.state.clean)
    print(f"warmup ({cap} sweeps, incl. compile) {time.time()-t0:.0f}s",
          flush=True)

    # ---- burn-in (untimed beyond the log line) ----
    chi2_traj = [(0, chi2_init / n_dof)]
    t0 = time.time()
    done = cap
    while done < args.burn:
        res = _sweeps(res.state, cap)
        jax.block_until_ready(res.state.chi2)
        done += cap
        if done % (20 * cap) < cap:
            chi2_traj.append((done, float(res.state.chi2) / n_dof))
    print(f"burn-in to sweep {done} in {time.time()-t0:.0f}s "
          f"chi2/dof={float(res.state.chi2)/n_dof:.4f}", flush=True)

    # ---- timed steady-state window ----
    n_timed = max(cap, (args.sweeps // cap) * cap)
    acc_trace = []
    mon_trace = []
    t0 = time.time()
    done_t = 0
    while done_t < n_timed:
        res = _sweeps(res.state, cap)
        jax.block_until_ready(res.state.chi2)
        done_t += cap
        acc_trace.append(np.asarray(res.accept_trace))
        mon_trace.append(np.asarray(res.monitor_trace))
        if done_t % (100 * cap) < cap:
            chi2_traj.append(
                (done + done_t, float(res.state.chi2) / n_dof)
            )
            print(f"  sweep {done + done_t}  chi2/dof="
                  f"{float(res.state.chi2)/n_dof:.4f}  "
                  f"acc={float(np.mean(acc_trace[-1])):.3f}  "
                  f"{done_t/(time.time()-t0):.2f} sweeps/s", flush=True)
    jax.block_until_ready(res.state.clean)
    dt = time.time() - t0
    sweeps_per_sec = n_timed / dt
    st = res.state
    chi_r = float(st.chi2)
    chi_f = float(sm.full_chi2(problem, st))
    acc_window = float(np.mean(np.concatenate(acc_trace)))

    # mean per-voxel ESS over the monitored voxels in the timed window —
    # the mixing metric coarse passes exist to improve (Geyer, 1 chain)
    from deconv3d_tpu.chains import effective_sample_size

    mon = np.concatenate(mon_trace, axis=0)        # [n_timed, K]
    voxel_ess = [
        float(effective_sample_size(mon[None, :, k]))
        for k in range(mon.shape[1])
    ]
    voxel_ess = [e for e in voxel_ess if np.isfinite(e)]
    ess_mean = float(np.mean(voxel_ess)) if voxel_ess else float("nan")

    # free everything the recovery convolutions don't need (their FFT
    # temporaries need several GB of headroom on a full field)
    import dataclasses as _dc

    problem = _dc.replace(
        problem, quad_tiled=None, qvox_tiled=None, quad=None, qvox=None,
        chol=None,   # data_pad/w_pad stay: the recovery z-score reads them
    )
    st = _dc.replace(
        st, resid=jnp.zeros((1, 1, 1), jnp.float32),
        sum_sq=jnp.zeros((1, 1, 1), jnp.float32),
    )
    res = None
    jax.block_until_ready(st.clean)
    try:
        recovery = recovery_check(problem, st)
    except Exception as e:  # never lose the perf numbers to the check
        recovery = [{"error": f"{type(e).__name__}: {str(e)[:200]}"}]
    out = {
        "sampler": args.sampler,
        "fullfield_sweeps_per_sec": round(sweeps_per_sec, 4),
        "proposals_per_sec": round(sweeps_per_sec * problem.n_valid, 1),
        "voxel_updates_per_sec": round(
            sweeps_per_sec * problem.n_valid
            * (problem.L if args.sampler == "gibbs" else 1), 1
        ),
        "seconds_per_sweep": round(dt / n_timed, 3),
        "timed_sweeps": n_timed,
        "burn_in": args.burn,
        "chi2": chi_r,
        "chi2_per_dof": round(chi_r / n_dof, 5),
        "chi2_per_dof_trajectory": [
            [s, round(c, 4)] for s, c in chi2_traj
        ],
        "chi2_consistency": abs(chi_r - chi_f) / max(abs(chi_f), 1.0),
        "coarse_every": args.coarse_every,
        "monitor_voxel_ess_mean": round(ess_mean, 2),
        "monitor_voxel_ess_per_sec": round(ess_mean / dt, 4),
        "acceptance_steady_state": round(acc_window, 4),
        "acceptance_cumulative": float(st.n_accept)
        / max(float(st.n_propose), 1.0),
        "point_source_recovery": recovery,
        "engine": problem.config.engine,
        "spatial_shards": args.spatial_shards,
        "tile": list(problem.config.tile or ()),
        "footprint": problem.f,
    }
    print(json.dumps(out), flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
