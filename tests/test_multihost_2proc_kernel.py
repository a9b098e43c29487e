"""2-process validation of the KERNEL-RATE sharded sweep's collectives.

tests/test_multihost_2proc.py proves the jnp sharded sweep over a real
process boundary; this does the same for ``run_sweeps_kernel_sharded`` —
the band-decomposed path whose halo strips and replica-refresh permute are
the round-3 perf story (``interior='jnp'`` stands in for the Pallas
interior, which interpret mode cannot run off-chip; the decomposition,
strip ppermutes and refresh permute under test are identical either way).

TWO OS processes (4 virtual CPU devices each) form one 8-device
``jax.distributed`` mesh; the sharded sweep's cross-process ppermutes must
reproduce the single-process 8-device run draw for draw.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Problem builder shared VERBATIM by the workers and the in-process
# baseline (exec'd in both) so any drift is impossible.
_BUILD = r"""
import numpy as np
import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube
from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm

def build_problem():
    f, L, ny, nx = 5, 16, 16, 4
    Y, X = ny * f, nx * f
    rng = np.random.default_rng(7)
    truth = np.zeros((L, Y, X), np.float32)
    truth[L // 2, Y // 2, X // 2] = 5.0
    truth[L // 3, 2, 2] = 3.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0),
        pixel_scale=0.2,
    )
    cube0 = Cube.from_data(truth, crval=4750.0, cdelt=1.25)
    fsf = inst.fsf.bank(cube0.wavelengths(), size=f, pixel_scale=0.2)
    lsf = inst.lsf.bank(cube0.wavelengths(), cdelt=1.25, width=5)
    conv = np.asarray(cv.convolve_cube(
        jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
    data = (conv + 0.2 * rng.standard_normal(conv.shape)).astype(np.float32)
    cube = Cube.from_data(data, variance=np.full_like(data, 0.04),
                          crval=4750.0, cdelt=1.25)
    cfg = sm.RunConfig(max_iterations=30, burn_in=10, seed=4, fsf_size=f,
                       lsf_width=5, engine="pallas_tiled")
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"   # tiled layout needs a chip claim
    try:
        return sm.make_problem(cube, inst, cfg)
    finally:
        jax.default_backend = orig
"""

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
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc

import numpy as np
from jax.experimental import multihost_utils

from deconv3d_tpu import sampler as sm
from deconv3d_tpu.parallel.kernel_sharded import run_sweeps_kernel_sharded

exec(open(os.environ["D3D_BUILD_SRC"]).read())
problem = build_problem()
state = sm.init_state(problem)
mesh = mh.global_mesh("sp")

res = run_sweeps_kernel_sharded(problem, state, 6, mesh, interior="jnp")
clean = multihost_utils.process_allgather(res.state.clean, tiled=True)
resid = multihost_utils.process_allgather(res.state.resid, tiled=True)
if rank == 0:
    np.savez(out, clean=np.asarray(clean), resid=np.asarray(resid),
             chi2=float(res.state.chi2), n_accept=int(res.state.n_accept))
print(f"[p{rank}] done chi2={float(res.state.chi2)}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _baseline():
    import jax
    from jax.sharding import Mesh

    ns = {}
    exec(_BUILD, ns)
    from deconv3d_tpu import sampler as sm
    from deconv3d_tpu.parallel.kernel_sharded import (
        run_sweeps_kernel_sharded,
    )

    problem = ns["build_problem"]()
    state = sm.init_state(problem)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    res = run_sweeps_kernel_sharded(problem, state, 6, mesh, interior="jnp")
    st = jax.tree_util.tree_map(lambda x: np.asarray(x), res.state)
    return st.clean, st.resid, float(st.chi2), int(st.n_accept)


@pytest.mark.slow
def test_two_process_kernel_sharded_matches_single_process(tmp_path):
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
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep workers off the TPU plugin
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
    clean, resid, chi2, n_acc = _baseline()

    # Per-spaxel proposal/accept arithmetic is shard-local and the halo
    # strips/refresh permute move exact bytes, so the chain itself is
    # identical; the global chi² psum may reorder across the process
    # boundary (f32), hence allclose rather than bit-equality there.
    assert int(got["n_accept"]) == n_acc
    np.testing.assert_allclose(got["clean"], clean, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(got["resid"], resid, rtol=2e-6, atol=2e-6)
    assert abs(float(got["chi2"]) - chi2) <= 1e-5 * abs(chi2)
