"""Multi-host scaffolding (parallel/multihost.py) — single-process checks.

A real multi-host run needs >1 host; what CI can validate is the
single-process code path (initialize is a no-op-safe call, the global mesh
spans the virtual devices, collectives execute over it) — the same program
a DCN mesh runs, minus the transport.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from deconv3d_tpu.parallel import multihost as mh


def test_global_mesh_spans_all_devices():
    mesh = mh.global_mesh("sp")
    assert mesh.shape["sp"] == len(jax.devices())


def test_collectives_run_over_global_mesh():
    mesh = mh.global_mesh("sp")
    n = mesh.shape["sp"]

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("sp"), out_specs=P()
    )
    def total(x):
        return jax.lax.psum(jnp.sum(x), "sp")

    x = jnp.arange(4 * n, dtype=jnp.float32)
    assert float(total(x)) == float(x.sum())


def test_initialize_is_idempotent():
    # single-process initialize must not raise, twice
    mh.initialize(num_processes=1, process_id=0,
                  coordinator_address="localhost:12357")
    mh.initialize()
    assert jax.process_count() >= 1
