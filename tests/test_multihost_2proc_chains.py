"""2-process validation of the chains × spatial 2-D mesh composition.

The last untested process boundary in the multihost matrix: a
("ch", "sp") mesh whose CHAIN axis spans two OS processes (2 chains × 4-way
spatial, one chain per process).  Chain rows never communicate — so the
check is that cross-process placement leaves each chain draw-for-draw
identical to the single-process 2×4 mesh run, and that the spatial
collectives (which here run process-LOCAL, the other axis of the same
global mesh) are unperturbed by the distributed mesh construction.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from test_multihost_2proc_kernel import _BUILD, _free_port

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
out = sys.argv[4]

from deconv3d_tpu.parallel import multihost as mh
mh.initialize(coordinator_address=f"localhost:{port}",
              num_processes=nproc, process_id=rank)

import numpy as np
from jax.sharding import Mesh
from jax.experimental import multihost_utils

from deconv3d_tpu import sampler as sm
from deconv3d_tpu.parallel.kernel_sharded import run_chains_kernel_sharded

exec(open(os.environ["D3D_BUILD_SRC"]).read())
problem = build_problem()

# 2 chains x 4-way spatial; jax.devices() orders process 0's devices
# first, so chain row r lives entirely on process r.
mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("ch", "sp"))
mc = run_chains_kernel_sharded(
    problem, 2, 5, mesh, chain_axis="ch", axis_name="sp", interior="jnp"
)
clean = multihost_utils.process_allgather(mc.result.state.clean, tiled=True)
chi2 = multihost_utils.process_allgather(mc.result.state.chi2, tiled=True)
nacc = multihost_utils.process_allgather(
    mc.result.state.n_accept, tiled=True
)
if rank == 0:
    np.savez(out, clean=np.asarray(clean), chi2=np.asarray(chi2),
             n_accept=np.asarray(nacc))
print(f"[p{rank}] done", flush=True)
"""


def _baseline():
    import jax
    from jax.sharding import Mesh

    ns = {}
    exec(_BUILD, ns)
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_chains_kernel_sharded,
    )

    problem = ns["build_problem"]()
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("ch", "sp"))
    mc = run_chains_kernel_sharded(
        problem, 2, 5, mesh, chain_axis="ch", axis_name="sp", interior="jnp"
    )
    st = jax.tree_util.tree_map(lambda x: np.asarray(x), mc.result.state)
    return st.clean, st.chi2, st.n_accept


@pytest.mark.slow
def test_two_process_chains_times_spatial_matches(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    build_src = tmp_path / "build.py"
    build_src.write_text(_BUILD)
    out = tmp_path / "result.npz"
    port = _free_port()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["D3D_BUILD_SRC"] = str(build_src)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(r), "2", str(port), str(out)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    logs = []
    for pr in procs:
        try:
            stdout, _ = pr.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process worker timed out")
        logs.append(stdout)
    for r, (pr, log) in enumerate(zip(procs, logs)):
        assert pr.returncode == 0, f"rank {r} failed:\n{log}"

    got = np.load(out)
    clean, chi2, n_acc = _baseline()

    np.testing.assert_array_equal(got["n_accept"], n_acc)
    np.testing.assert_allclose(got["clean"], clean, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(got["chi2"], chi2, rtol=1e-5)
