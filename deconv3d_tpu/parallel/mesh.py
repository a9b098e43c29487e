"""Device-mesh helpers for chain- and cube-parallel execution.

The reference is strictly single-process (SURVEY.md §2.2 — no MPI/NCCL/
anything); the TPU-native equivalents are XLA collectives over ICI driven by
``jax.sharding``.  This module owns mesh construction and the canonical
shardings:

  * chain parallelism ("dp" analog): independent MCMC chains sharded over
    the ``chains`` mesh axis — same program, different RNG streams.
  * cube parallelism for the full-field FFT path ("sp/tp" analog): λ-plane
    sharding for the spatial-FSF stage, spaxel sharding for the LSF stage,
    with an all_to_all-style reshard between them (see parallel/sharded.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "chains"
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_chains(batched_pytree, mesh: Mesh, axis_name: str = "chains"):
    """Place a chain-batched pytree with the chain axis split over the mesh.

    Every array leaf has leading dimension n_chains (a multiple of the mesh
    size); scalars-per-chain shard the same way.
    """
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(batched_pytree, sharding)
