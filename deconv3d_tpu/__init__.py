"""deconv3d-tpu: TPU-native Bayesian deconvolution of hyperspectral cubes.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``irap-omp/deconv3d`` (see SURVEY.md): Metropolis-Hastings-within-Gibbs
sampling of clean MUSE cubes under a separable FSF ⊛ LSF instrument model,
with incremental local-patch likelihood deltas, multi-chain convergence
diagnostics, and multi-chip scaling via ``jax.sharding``.

Public API (reference-compatible surface, SURVEY.md §1.2 "API surface"):

    from deconv3d_tpu import Run, MUSE, Cube
    run = Run(cube, MUSE(), max_iterations=10_000)
    run.run()
    run.save("my_run")
"""

from .cube import Cube
from .instruments import (
    Instrument, MUSE,
    PointSpreadFunction, MoffatPointSpreadFunction,
    GaussianPointSpreadFunction, NoPointSpreadFunction,
    LineSpreadFunction, MUSELineSpreadFunction,
    GaussianLineSpreadFunction, NoLineSpreadFunction,
    TabulatedPointSpreadFunction, TabulatedLineSpreadFunction,
    MoffatFSF, GaussianFSF, NoFSF, TabulatedFSF,
    MUSELSF, GaussianLSF, NoLSF, TabulatedLSF,
)
from .convolve import convolve_cube
from .sampler import (
    RunConfig, SamplerState, make_problem, init_state, run_sweeps, ChainResult,
)
from .chains import MultiChainResult, gelman_rubin, run_chains
from .ops.direct import suggest_prior_precision
from .run import Run

__version__ = "0.1.0"

__all__ = [
    "Cube", "Run", "RunConfig",
    "Instrument", "MUSE",
    "PointSpreadFunction", "MoffatPointSpreadFunction",
    "GaussianPointSpreadFunction", "NoPointSpreadFunction",
    "LineSpreadFunction", "MUSELineSpreadFunction",
    "GaussianLineSpreadFunction", "NoLineSpreadFunction",
    "TabulatedPointSpreadFunction", "TabulatedLineSpreadFunction",
    "MoffatFSF", "GaussianFSF", "NoFSF", "TabulatedFSF",
    "MUSELSF", "GaussianLSF", "NoLSF", "TabulatedLSF",
    "convolve_cube",
    "SamplerState", "make_problem", "init_state", "run_sweeps", "ChainResult",
    "MultiChainResult", "gelman_rubin", "run_chains",
    "suggest_prior_precision",
]
