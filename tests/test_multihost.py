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


def test_initialize_raises_for_failed_multiprocess_launch():
    """An explicit num_processes>1 launch must FAIL loudly when
    jax.distributed cannot come up (e.g. the backend was already touched)
    — silently degrading would run every process as an independent
    single-host job (code-review r3)."""
    import os
    import subprocess
    import sys

    worker = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()  # backend now up: distributed init must fail\n"
        "from deconv3d_tpu.parallel import multihost as mh\n"
        "try:\n"
        "    mh.initialize(coordinator_address='localhost:12399',\n"
        "                  num_processes=2, process_id=0)\n"
        "except RuntimeError as e:\n"
        "    print('RAISED-AS-EXPECTED:', str(e)[:60])\n"
        "else:\n"
        "    print('DID-NOT-RAISE')\n"
    )
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the child off the TPU plugin
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", worker], env=env, cwd=repo,
        capture_output=True, text=True, timeout=120,
    )
    assert "RAISED-AS-EXPECTED" in out.stdout, (out.stdout, out.stderr)
