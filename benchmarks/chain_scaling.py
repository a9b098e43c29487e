"""Per-chain rate vs chain count on ONE chip (VERDICT r3 weak #3 / next #6).

Measures the chain-batched fused kernel's aggregate and per-chain sweeps/s
at n_chains ∈ {1, 2, 4, 8, 16, 32} for MH and gibbs on the MUSE subcube —
the measured record behind the chains-per-chip warning in chains.run_chains
and the ROADMAP note on the (non-)amortisability of cross-chain work.

    python benchmarks/chain_scaling.py        # writes CHAIN_SCALING.json
"""

import json
import time

import numpy as np

import jax

from deconv3d_tpu import Cube, chains as chn, instruments as ins
from deconv3d_tpu import sampler as sm


def main():
    L, Y, X = 600, 30, 30
    rng = np.random.default_rng(0)
    truth = np.zeros((L, Y, X), np.float32)
    truth[300, 15, 15] = 50.0
    data = truth + rng.standard_normal((L, Y, X)).astype(np.float32)
    cube = Cube.from_data(data, variance=np.ones_like(data),
                          crval=4750.0, cdelt=1.25)
    inst = ins.MUSE()
    out = {}
    n_sweeps = 64
    for sampler in ("mh", "gibbs"):
        cfg = sm.RunConfig(max_iterations=10_000, burn_in=500, seed=0,
                           sampler=sampler)
        p = sm.make_problem(cube, inst, cfg)
        rows = []
        for n_chains in (1, 2, 4, 8, 16, 32):
            states = chn.init_chain_states(p, n_chains)
            mc = chn.run_chains(p, n_chains, n_sweeps=n_sweeps, states=states)
            jax.block_until_ready(mc.result.state.clean)     # compile+warm
            t0 = time.perf_counter()
            mc = chn.run_chains(p, n_chains, n_sweeps=n_sweeps,
                                states=mc.result.state)
            jax.block_until_ready(mc.result.state.clean)
            dt = time.perf_counter() - t0
            agg = n_chains * n_sweeps / dt
            rows.append({
                "n_chains": n_chains,
                "aggregate_sweeps_per_sec": round(agg, 1),
                "per_chain_sweeps_per_sec": round(agg / n_chains, 2),
            })
            print(sampler, rows[-1], flush=True)
        out[sampler] = rows
    with open("CHAIN_SCALING.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
