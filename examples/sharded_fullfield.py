"""Parallel topologies for big fields — the production recipes.

Shows the three multi-device modes on a small geometry so the script runs
anywhere (use ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` on
CPU).  On a real slice the same code runs the fused Pallas kernels; full
300×300×3681 MUSE fields fit ONE v5e chip via the HBM-tiled kernel
(engine='auto' picks it), so multi-chip is for chains and for
latency — not capacity.

    1. chain parallelism            run_chains(mesh=1-D mesh)
    2. spatial (one chain, Y-shard) Run(spatial_mesh=...)
    3. chains × spatial 2-D mesh    Run(n_chains=2, spatial_mesh=mesh2d)
    4. exact draws, GSPMD-sharded   Run(sampler='direct', spatial_mesh=...)

    python examples/sharded_fullfield.py
"""

import numpy as np

import jax
from jax.sharding import Mesh

import deconv3d_tpu as d3d
from deconv3d_tpu import instruments as ins

n_dev = len(jax.devices())
print(f"{n_dev} devices ({jax.default_backend()})")

f, L = 5, 32
Y, X = 4 * f, 2 * f                    # 4 color block-rows: shards over ≤2
truth = np.zeros((L, Y, X), np.float32)
truth[L // 2, Y // 2, X // 2] = 20.0
inst = ins.Instrument(
    fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0),
    pixel_scale=0.2,
)
rng = np.random.default_rng(2)
cube = d3d.Cube.from_data(
    (truth + rng.normal(0, 0.1, truth.shape)).astype(np.float32),
    variance=np.full(truth.shape, 0.01, np.float32),
    crval=4750.0, cdelt=1.25,
)
kw = dict(max_iterations=40, burn_in=10, fsf_size=f, lsf_width=5)

# --- 1. chain parallelism: independent chains, one per device ------------
run = d3d.Run(cube, inst, n_chains=max(1, n_dev), **kw)
run.run()
print("chains        :", run.diagnostics())

# --- 2. one chain's sweep Y-sharded over devices (huge single fields) ----
if n_dev >= 2:
    run_sp = d3d.Run(cube, inst, spatial_mesh=2, **kw)
    run_sp.run()
    print("spatial       : chi2/dof "
          f"{run_sp.chi2 / truth.size:.3f}")

# --- 3. the v5e-8 production topology: 2 chains × (n_dev//2)-way spatial --
# coarse_every composes with every topology: globally-coherent pattern
# passes (exact Gibbs along the blur-null directions) interleave at
# absolute-sweep boundaries on each chain.
if n_dev >= 4:
    mesh2d = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                  ("chains", "sp"))
    run_2d = d3d.Run(cube, inst, n_chains=2, spatial_mesh=mesh2d,
                     engine="pallas_tiled", coarse_every=8, **kw)
    run_2d.run()
    print("chains×spatial: chi2/dof "
          f"{run_2d.chi2 / truth.size:.3f}  "
          f"chains {np.asarray(run_2d.states.clean).shape[0]}")

# --- 4. exact (iid) posterior draws over the mesh -------------------------
# The direct sampler has no sweep structure to decompose — it jits
# global-view over a Y-sharded mesh and XLA inserts the collectives
# (docs/design.md §8h).  TPU-gated here only because the CPU backend
# cannot run FFTs on sharded operands (an XLA fft_thunk limitation);
# on any TPU slice this block runs as-is.
if n_dev >= 2 and jax.default_backend() == "tpu":
    run_d = d3d.Run(cube, inst, sampler="direct", spatial_mesh=2,
                    max_iterations=8, fsf_size=f, lsf_width=5)
    run_d.run()
    print("sharded direct: chi2/dof "
          f"{run_d.chi2 / truth.size:.3f}")
