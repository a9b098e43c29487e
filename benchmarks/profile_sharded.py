"""Why is the kernel-sharded full-field sweep slower than unsharded?

VERDICT r4 weak #4: FULLFIELD_r04_sh1 measured 1.47 sweeps/s vs the
unsharded tiled path's 1.91–1.93, while the subcube-scale gate measures
the same machinery at 1.10× — a ~25% full-field-only overhead on the path
that is the multi-chip story.  This script isolates it:

  1. unsharded tiled sweeps/s (multi-sweep kernel segments, cap=auto);
  2. sh1 sweeps/s through run_sweeps_kernel_sharded (the drive's path);
  3. a jax.profiler device trace of (2), reduced to the top self-time op
     groups, so the overhead is named rather than guessed.

    python benchmarks/profile_sharded.py [--sweeps 24]

Writes PROFILE_SHARDED_r05.json.
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

import jax

from deconv3d_tpu import sampler as sm
from deconv3d_tpu import instruments as ins

sys.path.insert(0, os.path.dirname(__file__))
from fullfield_drive import build_field  # noqa: E402


def top_ops_from_trace(tracedir, k=18):
    """Aggregate self-time by op name from the newest perfetto trace."""
    paths = sorted(
        glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return [{"error": "no trace files written"}]
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    by_name = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # keep device lanes only (TensorFlow Op / XLA Ops tracks)
        name = ev.get("name", "?")
        by_name[name] = by_name.get(name, 0.0) + float(ev["dur"])
    total = sum(by_name.values()) or 1.0
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:k]
    return [
        {"op": n[:90], "ms": round(d / 1e3, 1),
         "pct": round(100 * d / total, 1)}
        for n, d in rows
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=24)
    args = ap.parse_args()

    inst = ins.MUSE()
    holder = [build_field(inst)]
    cfg = sm.RunConfig(max_iterations=10_000, burn_in=64, seed=0,
                       sampler="mh", track_variance=False)
    p = sm.make_problem(holder.pop(), inst, cfg)
    from deconv3d_tpu.ops.pallas_tiled import _max_segment

    cap = _max_segment(p)
    out = {"device": str(jax.devices()[0]), "cap": cap,
           "tile": list(p.config.tile or ()), "f": p.f}

    # ---- 1. unsharded baseline ----
    st = sm.init_state(p)
    jax.block_until_ready(st.resid)
    res = sm.run_sweeps(p, st, cap)
    del st
    jax.block_until_ready(res.state.chi2)
    n = max(cap, (args.sweeps // cap) * cap)
    t0 = time.time()
    done = 0
    while done < n:
        res = sm.run_sweeps(p, res.state, cap)
        jax.block_until_ready(res.state.chi2)
        done += cap
    out["unsharded_sweeps_per_sec"] = round(done / (time.time() - t0), 3)
    print(json.dumps({"unsharded": out["unsharded_sweeps_per_sec"]}),
          flush=True)
    state = res.state
    res = None

    # ---- 2. sh1 through the sharded path ----
    from jax.sharding import Mesh
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_sweeps_kernel_sharded,
    )

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    res = run_sweeps_kernel_sharded(p, state, cap, mesh)
    jax.block_until_ready(res.state.chi2)
    t0 = time.time()
    done = 0
    while done < n:
        res = run_sweeps_kernel_sharded(p, res.state, cap, mesh)
        jax.block_until_ready(res.state.chi2)
        done += cap
    out["sh1_sweeps_per_sec"] = round(done / (time.time() - t0), 3)
    out["sh1_vs_unsharded"] = round(
        out["sh1_sweeps_per_sec"] / out["unsharded_sweeps_per_sec"], 3)
    print(json.dumps({"sh1": out["sh1_sweeps_per_sec"]}), flush=True)

    # ---- 3. device trace of the sharded path ----
    tracedir = "/tmp/sharded_trace"
    with jax.profiler.trace(tracedir):
        r2 = run_sweeps_kernel_sharded(p, res.state, cap, mesh)
        jax.block_until_ready(r2.state.chi2)
    out["sh1_top_ops"] = top_ops_from_trace(tracedir)
    # and of the unsharded path, same window, for a named comparison
    tracedir2 = "/tmp/unsharded_trace"
    with jax.profiler.trace(tracedir2):
        r3 = sm.run_sweeps(p, r2.state, cap)
        jax.block_until_ready(r3.state.chi2)
    out["unsharded_top_ops"] = top_ops_from_trace(tracedir2)

    with open("PROFILE_SHARDED_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
