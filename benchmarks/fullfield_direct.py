"""Full-field direct (exact iid) draw measurement — VERDICT r2 next #6.

Measures the perturb-and-solve PCG at MUSE full-field geometry
(300×300×3681) with the radially-binned Fourier-banded preconditioner
(ops/direct.py auto-selects it above BANDED_BYTES_BUDGET).  To keep the
peak HBM inside ~15 GiB the script skips the SamplerState machinery and
drives the solver directly: the CG state (5 cube-size vectors) plus the
problem constants is the footprint; make_problem drops quad for direct.

    python benchmarks/fullfield_direct.py [--y 300] [--l 3681] [--tol 1e-5]

Writes FULLFIELD_r03_direct.json: seconds/draw, iterations, rel_residual,
preconditioner mode, draws/s.
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
    ap.add_argument("--y", type=int, default=300)
    ap.add_argument("--l", type=int, default=3681)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--maxiter", type=int, default=600)
    ap.add_argument("--out", default="FULLFIELD_r03_direct.json")
    args = ap.parse_args()
    L, Y, X = args.l, args.y, args.y

    inst = ins.MUSE()
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (L, Y, X), jnp.float32)
    data = data.at[L // 2, Y // 2, X // 2].add(50.0)
    var = jnp.full((L, Y, X), 1.0, jnp.float32)
    holder = [Cube.from_data(data, variance=var, crval=4750.0, cdelt=1.25)]
    del data, var

    t0 = time.time()
    cfg = sm.RunConfig(
        sampler="direct", track_variance=False,
        direct_tol=args.tol, direct_maxiter=args.maxiter,
    )
    p = sm.make_problem(holder.pop(), inst, cfg)
    print(f"problem built in {time.time()-t0:.0f}s (quad dropped: "
          f"{p.quad is None})", flush=True)

    # Two memory rules learned on-chip: (1) build the operator AND
    # preconditioner INSIDE the jit with the problem as an ARGUMENT —
    # closing over the device arrays turns ~4.4 GB into HLO constants
    # whose folding effectively hangs XLA; (2) split the b-build from the
    # solve and hand the solve a data-free problem — the PCG body's peak
    # (3 carry cubes + operator/preconditioner temporaries) is what must
    # fit HBM, and data_pad's 1.5 GB OOM'd it at full field.
    import dataclasses as _dc

    @jax.jit
    def build_b(problem, k):
        w = dr._w_in(problem)
        h = problem.f // 2
        d = problem.data_pad[:, h : h + problem.Y, h : h + problem.X]
        z = jax.random.normal(k, d.shape, dtype=jnp.float32)
        return dr.apply_KT(problem, d * w + jnp.sqrt(w) * z) * dr._free_mask(
            problem
        )

    @jax.jit
    def solve(problem, b):
        A = dr.make_normal_operator(problem)
        Minv = dr.make_preconditioner(problem)
        return dr.pcg(A, Minv, b, args.tol, args.maxiter)

    p_solve = _dc.replace(p, data_pad=jnp.zeros((1, 1, 1), jnp.float32))

    def draw(k):
        b = build_b(p, k)
        jax.block_until_ready(b)
        return solve(p_solve, b)

    t0 = time.time()
    res = draw(jax.random.PRNGKey(1))
    jax.block_until_ready(res.x)
    t_first = time.time() - t0
    print(f"draw 1 (incl. compile): {t_first:.0f}s  it={int(res.iterations)}"
          f"  rel={float(res.rel_residual):.2e}", flush=True)

    t0 = time.time()
    res2 = draw(jax.random.PRNGKey(2))
    jax.block_until_ready(res2.x)
    t_draw = time.time() - t0

    out = {
        "geometry": [L, Y, X],
        "seconds_per_draw": round(t_draw, 2),
        "draws_per_sec": round(1.0 / t_draw, 5),
        "iterations": int(res2.iterations),
        "rel_residual": float(res2.rel_residual),
        "converged": bool(float(res2.rel_residual) <= args.tol),
        "direct_tol": args.tol,
        "direct_maxiter": args.maxiter,
        "preconditioner": "banded_radial(auto)" if (
            Y * (X // 2 + 1) * L * int(p.lsf.shape[1]) * 4
            > dr.BANDED_BYTES_BUDGET
        ) else "banded",
        "note": (
            "one draw = one FULL unit of ESS (iid exact sampling); compare "
            "against MCMC ESS/s, not sweeps/s"
        ),
    }
    print(json.dumps(out), flush=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
