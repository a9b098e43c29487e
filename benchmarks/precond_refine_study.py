"""Headroom study for radial-bin refinement of the direct preconditioner.

VERDICT r3 next #7 named "per-bin power refinement near the stiff |k| end"
as the remaining untried lever for cutting the full-field exact draw below
40 s.  Refinement can only pay if the BINNING (bin-mean power vs per-k
power) is what costs CG iterations.  The in-tree dense 'banded' mode IS the
exact per-k preconditioner (zero intra-bin spread — the limit of any
refinement scheme), so the decisive measurement is cheap: at a mid-size
geometry with the realistic MUSE blur + field boundary, compare iterations

    banded (exact per-k)  vs  banded_radial at 64 / 256 / 1024 bins.

If exact-per-k needs the same iterations as 256 bins, no bin-allocation
scheme can beat 256 bins on iterations and the refinement lever is dead
(consistent with the r3 bin-count study: 64 bins -> same iterations,
1024 -> stall from faithfully inverting near-null modes where the
periodic-model boundary mismatch lives).

    python benchmarks/precond_refine_study.py [--y 120] [--l 600]

Prints one JSON line per configuration.
"""

import argparse
import json
import time

import numpy as np

import jax

from deconv3d_tpu import Cube, instruments as ins, sampler as sm
from deconv3d_tpu.ops import direct as dr


def measure(p, label):
    A = dr.make_normal_operator(p)
    Minv = dr.make_preconditioner(p)
    b = dr._b_draw(p, jax.random.PRNGKey(7))
    solve = jax.jit(
        lambda bb: dr.pcg(A, Minv, bb, p.config.direct_tol,
                          p.config.direct_maxiter)
    )
    res = solve(b)  # compile + run
    jax.block_until_ready(res.x)
    t0 = time.time()
    res = solve(b)
    jax.block_until_ready(res.x)
    out = {
        "label": label,
        "iterations": int(res.iterations),
        "rel_residual": float(res.rel_residual),
        "converged": bool(float(res.rel_residual) <= p.config.direct_tol),
        "seconds_per_solve": round(time.time() - t0, 3),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--y", type=int, default=120)
    ap.add_argument("--l", type=int, default=600)
    ap.add_argument("--tol", type=float, default=1e-5)
    args = ap.parse_args()

    L, Y, X = args.l, args.y, args.y
    rng = np.random.default_rng(0)
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 50.0
    data = truth + rng.standard_normal((L, Y, X)).astype(np.float32)
    cube = Cube.from_data(data, variance=np.ones_like(data),
                          crval=4750.0, cdelt=1.25)
    inst = ins.MUSE()

    cases = [
        ("banded_exact_per_k", dict(direct_precond="banded")),
        ("radial_64", dict(direct_precond="banded_radial",
                           direct_radial_bins=64)),
        ("radial_256", dict(direct_precond="banded_radial",
                            direct_radial_bins=256)),
        ("radial_1024", dict(direct_precond="banded_radial",
                             direct_radial_bins=1024)),
    ]
    rows = []
    for label, kw in cases:
        cfg = sm.RunConfig(sampler="direct", prior_precision=1e-3,
                           direct_tol=args.tol, direct_maxiter=600,
                           seed=0, **kw)
        p = sm.make_problem(cube, inst, cfg)
        rows.append(measure(p, label))

    out = {"geometry": [L, Y, X], "device": str(jax.devices()[0]),
           "tol": args.tol, "maxiter": 600, "prior_precision": 1e-3,
           "cases": rows}
    with open("PRECOND_REFINE_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
