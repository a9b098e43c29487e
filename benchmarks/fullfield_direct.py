"""Full-field direct (exact iid) draw measurement — VERDICT r2 next #6.

Measures the perturb-and-solve PCG at MUSE full-field geometry
(300×300×3681) with the radially-binned Fourier-banded preconditioner
(ops/direct.py auto-selects it above BANDED_BYTES_BUDGET).

Memory: the monolithic jitted while_loop PCG program measured 18.2 GB
total here (memory_analysis: 11.5 cube-size temps + arguments + output)
and OOMs the chip's ~15 GiB usable HBM — so this script exercises the
HOST-LOOP layout (``pcg_host`` / ``direct_run_sweeps_host``, donated
carries, peak = one iteration's transients) that ``run_sweeps``
auto-selects above ``PCG_WHILE_BYTES_BUDGET``.  That makes this benchmark
a drive of the real product path, not a special-cased harness.

Statistics: with the reference-parity FLAT prior the full-field normal
operator is near-singular under the MUSE Moffat blur (blur-null modes are
statistically unconstrained) — CG is expected to stall above tol; the
measurement records that honestly AND measures the ridge-prior
configuration (``prior_precision``) that makes full-field exact draws a
converged, usable product.

    python benchmarks/fullfield_direct.py [--y 300] [--l 3681] [--tol 1e-5]

Writes FULLFIELD_r03_direct.json: seconds/draw, iterations, rel_residual,
per prior configuration, plus a product-path run_sweeps draw.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube, instruments as ins, sampler as sm
from deconv3d_tpu.ops import direct as dr


def measure_draw(p, seed, label):
    """One full draw (b build + host-loop PCG): seconds, iterations, rel."""
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    b = dr._b_draw(p, key)
    jax.block_until_ready(b)
    res = dr.pcg_host(p, b, p.config.direct_tol, p.config.direct_maxiter)
    jax.block_until_ready(res.x)
    dt = time.time() - t0
    out = {
        "label": label,
        # keep full precision: draws_per_sec divides by this, and a fast
        # smoke-geometry draw rounds to 0.0 at 2 decimals
        "seconds_per_draw": round(dt, 6),
        "iterations": int(res.iterations),
        "rel_residual": float(res.rel_residual),
        "converged": bool(float(res.rel_residual) <= p.config.direct_tol),
        "prior_precision": float(p.config.prior_precision),
    }
    print(json.dumps(out), flush=True)
    del b, res
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--y", type=int, default=300)
    ap.add_argument("--l", type=int, default=3681)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--maxiter", type=int, default=600)
    ap.add_argument("--tau", type=float, default=1e-3,
                    help="ridge precision of the converged configuration")
    ap.add_argument("--batch", action="store_true",
                    help="measure the K-RHS batched host PCG instead of "
                         "the scaled/flat extras: K=1 (pcg_host) vs K=2 "
                         "(pcg_host_batch) draws/s table (VERDICT r4 #5)")
    ap.add_argument("--out", default="FULLFIELD_r04_direct.json")
    args = ap.parse_args()
    L, Y, X = args.l, args.y, args.y

    inst = ins.MUSE()
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (L, Y, X), jnp.float32)
    data = data.at[L // 2, Y // 2, X // 2].add(50.0)
    var = jnp.full((L, Y, X), 1.0, jnp.float32)
    holder = [Cube.from_data(data, variance=var, crval=4750.0, cdelt=1.25)]
    del data, var
    cube = holder.pop()

    results = {"geometry": [L, Y, X], "direct_tol": args.tol,
               "direct_maxiter": args.maxiter, "draws": []}

    # --- ridge configuration (the converged product path) ----------------
    t0 = time.time()
    cfg = sm.RunConfig(
        sampler="direct", track_variance=False,
        direct_tol=args.tol, direct_maxiter=args.maxiter,
        prior_precision=args.tau,
    )
    p = sm.make_problem(cube, inst, cfg)
    print(f"problem built in {time.time()-t0:.0f}s (quad dropped: "
          f"{p.quad is None})", flush=True)
    measure_draw(p, 1, "ridge_warmup(compile)")
    results["draws"].append(measure_draw(p, 2, "ridge"))

    if args.batch:
        # --- K-RHS batched draws (VERDICT r4 #5): mid-size measured
        # 1.17x per draw at K=2 (BATCHED_DIRECT_r05.json); here the
        # question is whether the batched carries + transients fit the
        # chip at full field, and if so whether the win transfers.
        base = results["draws"][-1]["seconds_per_draw"]
        results["batched"] = [
            {"K": 1, "seconds_per_draw": base, "speedup_per_draw": 1.0}
        ]
        for K in (2,):
            try:
                keys = jax.random.split(jax.random.PRNGKey(40), K)
                bs = jnp.stack([dr._b_draw(p, k) for k in keys])
                jax.block_until_ready(bs)
                res = dr.pcg_host_batch(
                    p, bs, args.tol, args.maxiter)  # compile + run
                jax.block_until_ready(res.x)
                del res, bs
                keys = jax.random.split(jax.random.PRNGKey(41), K)
                bs = jnp.stack([dr._b_draw(p, k) for k in keys])
                jax.block_until_ready(bs)
                t0 = time.time()
                res = dr.pcg_host_batch(p, bs, args.tol, args.maxiter)
                jax.block_until_ready(res.x)
                dt = time.time() - t0
                case = {
                    "K": K,
                    "iterations": [int(i) for i in
                                   np.asarray(res.iterations)],
                    "rel_residual": [float(f"{r:.2e}") for r in
                                     np.asarray(res.rel_residual)],
                    "seconds_total": round(dt, 2),
                    "seconds_per_draw": round(dt / K, 2),
                    "speedup_per_draw": round(base / (dt / K), 3),
                }
                del res, bs
            except Exception as e:  # RESOURCE_EXHAUSTED is a result here
                case = {"K": K, "error": type(e).__name__,
                        "message": str(e)[:300]}
            results["batched"].append(case)
            print(json.dumps(case), flush=True)
        results["note"] = (
            "one draw = one FULL unit of ESS (iid exact sampling); "
            "batched = K RHS through one host-loop PCG sharing the "
            "operator/preconditioner constants and the latency-bound "
            "banded scans."
        )
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(json.dumps(results), flush=True)
        return

    # --- VERDICT r3 next #7 attempt: boundary/mask-aware diagonal scaling
    # of the radial preconditioner.  Same problem constants; only the
    # preconditioner state changes — measure iterations + s/draw head-on.
    import dataclasses as _dc

    p_scaled = _dc.replace(
        p, config=_dc.replace(p.config, direct_precond_scale=True)
    )
    measure_draw(p_scaled, 1, "ridge_scaled_warmup(compile)")
    results["draws"].append(measure_draw(p_scaled, 2, "ridge_scaled"))
    del p_scaled

    # --- product path: run_sweeps auto-routes to the host loop ------------
    state = sm.init_state(p)
    res = sm.run_sweeps(p, state, 1)
    jax.block_until_ready(res.state.chi2)
    t0 = time.time()
    res = sm.run_sweeps(p, res.state, 1)
    jax.block_until_ready(res.state.chi2)
    results["run_sweeps_seconds_per_draw"] = round(time.time() - t0, 2)
    results["run_sweeps_converged"] = bool(
        float(np.asarray(res.accept_trace)[-1]) == 1.0
    )
    results["chi2"] = float(res.state.chi2)
    print(json.dumps({
        "run_sweeps_seconds_per_draw":
            results["run_sweeps_seconds_per_draw"],
        "converged": results["run_sweeps_converged"],
    }), flush=True)
    del state, res
    del p  # both problems alive would double the 3 GB of cube constants

    # --- flat prior (reference parity): expected to stall — record it ----
    cfg_flat = sm.RunConfig(
        sampler="direct", track_variance=False,
        direct_tol=args.tol, direct_maxiter=args.maxiter,
    )
    p_flat = sm.make_problem(cube, inst, cfg_flat)
    results["draws"].append(measure_draw(p_flat, 3, "flat_prior"))

    ridge = next(d for d in results["draws"] if d["label"] == "ridge")
    results["draws_per_sec"] = round(
        1.0 / max(ridge["seconds_per_draw"], 1e-9), 5
    )
    results["note"] = (
        "one draw = one FULL unit of ESS (iid exact sampling); compare "
        "against MCMC ESS/s, not sweeps/s.  flat_prior records the "
        "documented near-singular stall; ridge (prior_precision) is the "
        "converged configuration."
    )
    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
