"""Wall-clock ESS/s of the global coarse passes across regimes (VERDICT r4 #1).

BENCH_r04 measured the auto-enabled coarse passes at 0.33× voxel-ESS/s on
the exact geometry that triggers them (f=17 on 24×24), while the proven
4.5× ESS/s win (FULLFIELD_r03_coarse.json) lives at full field where the
old `f >= min(Y,X)//2` trigger can never fire.  This script produces the
decision data: monitor-voxel ESS/s AND box-flux ESS/s, with and without
coarse passes, for mh and gibbs, across three geometries — plus a cost
decomposition of one pass (jitted pass wall time vs the interleaver's
per-segment host syncs) so the retune targets the real cost, not a guess.

Writes COARSE_REGIMES_r05.json.  Run on the TPU (the default platform).
"""

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube, chains as chn, instruments as ins, sampler as sm


def box_monitor_idx(problem, lam0, y0, x0, half=2, lhalf=2):
    """Flat monitor indices covering a (2lhalf+1)×(2half+1)² box."""
    p = problem
    idx = []
    for dl in range(-lhalf, lhalf + 1):
        for dy in range(-half, half + 1):
            for dx in range(-half, half + 1):
                idx.append((lam0 + dl) * p.Yc * p.Xc + (y0 + dy) * p.Xc
                           + (x0 + dx))
    return jnp.asarray(np.asarray(idx, np.int32))


def ess_metrics(res, dt):
    """(mean per-voxel ESS/s, box-flux ESS/s, sweeps/s) from one window."""
    mon = np.asarray(res.monitor_trace)          # [n, K]
    per_vox = [chn.effective_sample_size(mon[:, k]) for k in range(mon.shape[1])]
    box = mon.sum(axis=1)                        # exact box flux per sweep
    return (
        float(np.mean(per_vox)) / dt,
        float(chn.effective_sample_size(box)) / dt,
        mon.shape[0] / dt,
    )


def drive(problem, n_warm, n_timed):
    st = sm.init_state(problem)
    r = sm.run_sweeps(problem, st, n_warm)
    jax.block_until_ready(r.state.clean)
    r = sm.run_sweeps(problem, r.state, n_timed)   # compile timed length
    jax.block_until_ready(r.state.clean)
    t0 = time.perf_counter()
    r = sm.run_sweeps(problem, r.state, n_timed)
    jax.block_until_ready(r.state.clean)
    return r, time.perf_counter() - t0


def one_pass_seconds(problem, state):
    """Wall time of ONE jitted coarse pass (constants cached, warm)."""
    from deconv3d_tpu.ops.coarse import coarse_constants, coarse_pass

    consts = coarse_constants(problem, "global")
    key = jax.random.PRNGKey(3)
    s = coarse_pass(problem, state, consts, key)     # compile
    jax.block_until_ready(s.resid)
    n = 8
    t0 = time.perf_counter()
    for i in range(n):
        s = coarse_pass(problem, s, consts, jax.random.fold_in(key, i))
    jax.block_until_ready(s.resid)
    return (time.perf_counter() - t0) / n


def regime(name, L, Y, X, n_warm, n_timed, seed=0, noise=0.05, amp=100.0):
    rng = np.random.default_rng(seed)
    truth = np.zeros((L, Y, X), np.float32)
    lam0, y0, x0 = L // 2, Y // 2, X // 2
    truth[lam0, y0, x0] = amp
    inst = ins.MUSE()
    data = truth + noise * rng.standard_normal((L, Y, X)).astype(np.float32)
    cube = Cube.from_data(data, variance=np.full_like(data, noise**2),
                          crval=4750.0, cdelt=1.25)
    out = {"geometry": [L, Y, X], "n_timed": n_timed}
    for sampler in ("mh", "gibbs"):
        for label, every in (("plain", None), ("coarse8", 8), ("coarse32", 32)):
            cfg = sm.RunConfig(max_iterations=10_000, burn_in=n_warm, seed=0,
                               sampler=sampler, coarse_every=every,
                               coarse_mode="global")
            p = sm.make_problem(cube, inst, cfg)
            p = dataclasses.replace(
                p, monitor_idx=box_monitor_idx(p, lam0, y0, x0))
            r, dt = drive(p, n_warm, n_timed)
            vox, box, sps = ess_metrics(r, dt)
            out[f"{sampler}_{label}"] = {
                "voxel_ess_per_s": round(vox, 3),
                "box_flux_ess_per_s": round(box, 3),
                "sweeps_per_s": round(sps, 1),
                "seconds": round(dt, 2),
            }
            if label == "plain":
                out[f"{sampler}_pass_seconds"] = round(
                    one_pass_seconds(p, r.state), 4)
        for label in ("coarse8", "coarse32"):
            c, pl = out[f"{sampler}_{label}"], out[f"{sampler}_plain"]
            out[f"{sampler}_{label}"]["vs_plain_voxel"] = round(
                c["voxel_ess_per_s"] / max(pl["voxel_ess_per_s"], 1e-12), 3)
            out[f"{sampler}_{label}"]["vs_plain_box"] = round(
                c["box_flux_ess_per_s"] / max(pl["box_flux_ess_per_s"], 1e-12),
                3)
        print(name, sampler, {k: v for k, v in out.items()
                              if k.startswith(sampler)}, flush=True)
    return out


def main():
    results = {"device": str(jax.devices()[0])}
    results["canonical_24x24"] = regime("canonical", 64, 24, 24,
                                        n_warm=512, n_timed=1024)
    results["subcube_30x30"] = regime("subcube", 600, 30, 30,
                                      n_warm=512, n_timed=1024)
    results["mid_120x120"] = regime("mid", 600, 120, 120,
                                    n_warm=256, n_timed=512)
    with open("COARSE_REGIMES_r05.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
