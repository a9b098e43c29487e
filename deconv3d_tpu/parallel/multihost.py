"""Multi-host (DCN) scaffolding — SURVEY.md §2.2/§5.8's conditional clause.

A full MUSE field fits one v5e chip's HBM (FULLFIELD_r0N.json), so
multi-host execution is OPTIONAL capacity scaling, not a requirement; the
reference has no distributed story at all.  This module provides the
jax-native glue so a field that ever outgrows one host can run unchanged:

  * ``initialize()`` — thin wrapper over ``jax.distributed.initialize``
    (idempotent, env-var driven like every JAX launcher: COORDINATOR_ADDRESS
    / NUM_PROCESSES / PROCESS_ID or the TPU metadata auto-detection).
  * ``global_mesh(axis)`` — one mesh over ALL processes' devices.
    ``parallel/kernel_sharded.py`` and ``parallel/sweep_sharded.py`` take
    any Mesh; with a global mesh their ppermute halo strips ride DCN
    between hosts and ICI within — XLA picks the transport, we write none
    (SURVEY.md §5.8).
  * Checkpoints: the orbax backend in ``checkpoint.py`` is already
    multi-host capable (every process writes its shard; restore is
    sharding-aware).

Validation status: this environment has ONE host with ONE chip, so DCN
itself cannot be exercised — but the process boundary CAN.
tests/test_multihost_2proc.py runs TWO real OS processes (4 virtual CPU
devices each) through ``initialize()`` + ``global_mesh()`` and the full
sharded sweep: jax.distributed bring-up, cross-process device_put, halo
ppermutes and psums over Gloo between process-local device groups, and a
result that matches the single-process 8-device mesh at f64 tightness.
That is the complete multi-host program with localhost TCP standing in
for DCN; on a real pod the same code path selects the ICI/DCN transports.
tests/test_multihost.py covers the single-process no-op path.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise jax.distributed once (no-op on later calls).

    With no arguments, defers to jax's auto-detection (TPU pod metadata) or
    the standard env vars; single-process runs (num_processes=1) work
    without a coordinator — useful for exercising the code path in CI.
    """
    global _initialized
    # NB: do NOT probe jax.process_count() here — it initialises the XLA
    # backend, after which jax.distributed.initialize can only fail (it
    # must run before any device use).  jax.distributed.is_initialized()
    # is the side-effect-free check.
    if _initialized or jax.distributed.is_initialized():
        _initialized = True
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        # A REAL multi-host launch (num_processes > 1 requested) must not
        # silently degrade to independent single-host runs — each process
        # would sample the whole problem and quietly produce duplicated
        # results.  Typical cause: the XLA backend was already touched
        # (initialize must precede any device use, like every JAX program).
        if num_processes is not None and num_processes > 1:
            raise RuntimeError(
                f"jax.distributed.initialize failed for a "
                f"{num_processes}-process launch: {e}. Call "
                "multihost.initialize() before ANY other JAX use "
                "(jax.devices(), device_put, jit, ...)."
            ) from e
        # Single-host/auto paths: ValueError means a launcher already
        # initialized it; RuntimeError means the backend is up — both are
        # benign for one process.
        import logging

        logging.getLogger("deconv3d_tpu").info(
            "jax.distributed.initialize skipped: %s", e
        )
    _initialized = True


def global_mesh(axis_name: str = "sp") -> Mesh:
    """One 1-D mesh over every device of every process.

    Pass it to ``run_sweeps_kernel_sharded`` / ``run_sweeps_sharded`` /
    ``chains.run_chains(mesh=...)``: the shard_map collectives (psum,
    ppermute halo strips, all_to_all) then span hosts over DCN exactly as
    they span chips over ICI — no code changes anywhere else.
    """
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def process_local_devices() -> Sequence[jax.Device]:
    return jax.local_devices()
