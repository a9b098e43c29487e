"""Profiling harness (SURVEY.md §5.1): capture a device trace of the sweep.

Writes a TensorBoard/Perfetto trace of a sampler segment plus a wall-clock
breakdown of setup / compile / steady-state:

    python benchmarks/profile_sweeps.py [--trace-dir /tmp/d3d_trace]

View with: tensorboard --logdir <trace-dir>  (profile plugin), or load the
.perfetto-trace in ui.perfetto.dev.
"""

import argparse
import time

import numpy as np

import jax

from deconv3d_tpu import Cube, MUSE, sampler as sm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/deconv3d_trace")
    ap.add_argument("--size", default="30x30x600")
    ap.add_argument("--sweeps", type=int, default=100)
    ap.add_argument("--sampler", default="mh", choices=["mh", "gibbs"])
    args = ap.parse_args()
    Y, X, L = (int(v) for v in args.size.split("x"))

    rng = np.random.default_rng(0)
    data = rng.normal(0, 1, (L, Y, X)).astype(np.float32)
    cube = Cube.from_data(
        data, variance=np.ones_like(data), crval=4750.0, cdelt=1.25
    )
    t0 = time.perf_counter()
    problem = sm.make_problem(
        cube, MUSE(), sm.RunConfig(max_iterations=10_000, sampler=args.sampler)
    )
    state = sm.init_state(problem)
    jax.block_until_ready(state.resid)
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    res = sm.run_sweeps(problem, state, args.sweeps)
    jax.block_until_ready(res.state.clean)
    t_compile = time.perf_counter() - t0

    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        res = sm.run_sweeps(problem, res.state, args.sweeps)
        jax.block_until_ready(res.state.clean)
        t_run = time.perf_counter() - t0

    print(f"engine={problem.config.engine} sampler={args.sampler} "
          f"colors={problem.n_colors} f={problem.f}")
    print(f"setup: {t_setup:.2f}s   compile+first: {t_compile:.2f}s   "
          f"steady {args.sweeps} sweeps: {t_run:.3f}s "
          f"({args.sweeps / t_run:.1f}/s)")
    print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
