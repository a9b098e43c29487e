"""Stage-level profile of one direct-draw PCG iteration (ROADMAP r4 #5).

Times the three components of a CG iteration separately at a chosen
geometry (default: full MUSE field 300x300x3681):

  * A(p)      — the normal operator (K then K^T: LSF band + depthwise FSF
                conv, twice)
  * M^-1(r)   — the preconditioner application (rfft2 -> banded solves ->
                irfft2; radial memory-lean layout at full field)
  * axpy/dots — the CG vector updates (bandwidth-bound)

The split decides whether mixed-precision convs (bf16 matvec with f32
recurrence) are worth building: only if A dominates.

    python benchmarks/profile_direct.py [--y 300] [--l 3681] [--reps 5]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube, instruments as ins, sampler as sm
from deconv3d_tpu.ops import direct as dr


def timed(fn, *args, reps=5, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"stage": label, "seconds": round(dt, 4)}), flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--y", type=int, default=300)
    ap.add_argument("--l", type=int, default=3681)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tau", type=float, default=1e-3)
    args = ap.parse_args()
    L, Y, X = args.l, args.y, args.y

    inst = ins.MUSE()
    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (L, Y, X), jnp.float32)
    var = jnp.full((L, Y, X), 1.0, jnp.float32)
    cube = Cube.from_data(data, variance=var, crval=4750.0, cdelt=1.25)
    del data, var
    cfg = sm.RunConfig(sampler="direct", track_variance=False,
                       prior_precision=args.tau)
    p = sm.make_problem(cube, inst, cfg)
    mode = dr._resolve_precond_mode(p)
    tau = dr._tau(p)
    print(json.dumps({"geometry": [L, Y, X], "precond": mode,
                      "fsf_footprint": int(p.f),
                      "lsf_width": int(p.lsf.shape[1])}), flush=True)

    pstate = jax.jit(lambda pp: dr._precond_state(pp, mode, dr._precond_tau(p, tau)))(p)
    jax.block_until_ready(pstate)
    r = jax.random.normal(jax.random.PRNGKey(1), (L, Y, X), jnp.float32)

    a_op = jax.jit(lambda pp, v: dr.make_normal_operator(pp, tau)(v))
    k_op = jax.jit(dr.apply_K)
    kt_op = jax.jit(dr.apply_KT)
    m_op = jax.jit(lambda pp, ps, v: dr._precond_apply(pp, mode, ps, v))

    _, t_k = timed(k_op, p, r, reps=args.reps, label="apply_K")
    _, t_kt = timed(kt_op, p, r, reps=args.reps, label="apply_KT")
    _, t_a = timed(a_op, p, r, reps=args.reps, label="A_normal_op")
    _, t_m = timed(m_op, p, pstate, r, reps=args.reps, label="Minv_precond")

    axpy = jax.jit(lambda x, y: (x + 0.5 * y, jnp.sum(x * y)))
    _, t_v = timed(axpy, r, r, reps=args.reps, label="axpy_dot")

    # ~ one CG iteration = A + Minv + ~4 axpy/dots
    est = t_a + t_m + 4 * t_v
    print(json.dumps({
        "stage": "iteration_estimate", "seconds": round(est, 4),
        "share_A": round(t_a / est, 3), "share_Minv": round(t_m / est, 3),
        "share_vec": round(4 * t_v / est, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
