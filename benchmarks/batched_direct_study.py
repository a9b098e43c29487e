"""Do K simultaneous direct draws beat K sequential ones? (VERDICT r4 #5)

The direct sampler's throughput is the full-field science rate (0.022
ESS/s vs gibbs 0.006), so the question is whether batching K RHS through
one PCG — sharing the operator/preconditioner constants and amortising
per-iteration fixed costs — cuts seconds/draw.

Mechanism: ``jax.vmap`` over the whole ``pcg`` while_loop.  vmap of a
while_loop runs until EVERY column's cond is false with per-column masked
updates — exactly the shared-iteration block solve (total iterations =
max over columns, which for iid draws of one operator is ≈ the common
iteration count).  A win requires the BATCHED iteration to cost less than
K× a single iteration, i.e. the per-column stages (plane FFTs, banded
triangular solves, elementwise) must currently underuse the chip.

This study measures that at a mid-size geometry first (decisive and
cheap); the full-field HBM budget only allows K=2 (carries are 3 cubes
per column + constants), so if mid-size scaling is linear the full-field
exercise is pointless and is recorded as a negative.

    python benchmarks/batched_direct_study.py [--y 120] [--l 600]

Writes BATCHED_DIRECT_r05.json.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube, instruments as ins, sampler as sm
from deconv3d_tpu.ops import direct as dr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--y", type=int, default=120)
    ap.add_argument("--l", type=int, default=600)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--maxiter", type=int, default=600)
    args = ap.parse_args()

    L, Y, X = args.l, args.y, args.y
    rng = np.random.default_rng(0)
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 50.0
    data = truth + rng.standard_normal((L, Y, X)).astype(np.float32)
    cube = Cube.from_data(data, variance=np.ones_like(data),
                          crval=4750.0, cdelt=1.25)
    inst = ins.MUSE()
    cfg = sm.RunConfig(sampler="direct", prior_precision=1e-3,
                       direct_tol=args.tol, direct_maxiter=args.maxiter,
                       seed=0)
    p = sm.make_problem(cube, inst, cfg)
    A = dr.make_normal_operator(p)
    Minv = dr.make_preconditioner(p)

    out = {"geometry": [L, Y, X], "device": str(jax.devices()[0]),
           "cases": []}
    for K in (1, 2, 4):
        keys = jax.random.split(jax.random.PRNGKey(7), K)
        bs = jax.jit(jax.vmap(dr._b_draw, in_axes=(None, 0)))(p, keys)
        solve = jax.jit(jax.vmap(
            lambda bb: dr.pcg(A, Minv, bb, args.tol, args.maxiter)
        ))
        res = solve(bs)                      # compile + run
        jax.block_until_ready(res.x)
        t0 = time.time()
        res = solve(bs)
        jax.block_until_ready(res.x)
        dt = time.time() - t0
        case = {
            "K": K,
            "iterations": [int(i) for i in np.asarray(res.iterations)],
            "rel_residual": [float(f"{r:.2e}")
                             for r in np.asarray(res.rel_residual)],
            "seconds_total": round(dt, 3),
            "seconds_per_draw": round(dt / K, 3),
        }
        out["cases"].append(case)
        print(json.dumps(case), flush=True)

    base = out["cases"][0]["seconds_per_draw"]
    for case in out["cases"]:
        case["speedup_per_draw"] = round(base / case["seconds_per_draw"], 3)
    with open("BATCHED_DIRECT_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
