"""REAL multi-process validation of the multi-host (DCN) story.

SURVEY.md §2.2/§5.8's conditional clause is scaffolded in
``parallel/multihost.py``; this test validates it with actual process
boundaries rather than a virtual mesh: TWO OS processes (4 virtual CPU
devices each) form one 8-device global mesh via ``jax.distributed`` +
Gloo collectives — the same program shape a 2-host DCN mesh runs, with a
real transport between process-local device groups (localhost TCP stands
in for DCN; XLA inserts identical collectives either way).

Checked end to end:
  * ``multihost.initialize`` brings up a 2-process service;
    ``multihost.global_mesh`` spans both processes' devices.
  * ``run_sweeps_sharded`` — whose inputs are device_put against the
    global mesh and whose halo strips ride cross-process ppermutes —
    produces the SAME chain as the single-process 8-device mesh run
    (clean/resid allclose at f64 tightness; psum reduction order across
    a process boundary is the only legitimate difference source).

This runs the workers as subprocesses so it is safe under pytest (the
test process itself never re-initialises jax.distributed).
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One worker source; rank comes from argv.  Builds the identical problem in
# every process (deterministic), runs the sharded sweep over the GLOBAL
# mesh, and rank 0 writes the gathered results.
_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

rank = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
out = sys.argv[4]

from deconv3d_tpu.parallel import multihost as mh
mh.initialize(coordinator_address=f"localhost:{port}",
              num_processes=nproc, process_id=rank)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils

from deconv3d_tpu import Cube, convolve as cv, instruments as ins
from deconv3d_tpu import sampler as sm
from deconv3d_tpu.parallel.sweep_sharded import run_sweeps_sharded

def build_problem():
    f, L, Y, X = 5, 16, 40, 10
    rng = np.random.default_rng(42)
    truth = np.zeros((L, Y, X))
    truth[L // 2, Y // 2, X // 2] = 5.0
    truth[L // 3, 2, 2] = 3.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0),
        pixel_scale=0.2,
    )
    cube0 = Cube.from_data(truth, crval=4750.0, cdelt=1.25, dtype=np.float64)
    fsf = inst.fsf.bank(cube0.wavelengths(), size=f, pixel_scale=0.2)
    lsf = inst.lsf.bank(cube0.wavelengths(), cdelt=1.25, width=5)
    conv = np.asarray(cv.convolve_cube(
        jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
    data = conv + 0.2 * rng.standard_normal(conv.shape)
    cube = Cube.from_data(data, variance=np.full_like(data, 0.04),
                          crval=4750.0, cdelt=1.25, dtype=np.float64)
    cfg = sm.RunConfig(max_iterations=30, burn_in=10, seed=4, fsf_size=f,
                       lsf_width=5, dtype=np.float64)
    return sm.make_problem(cube, inst, cfg)

problem = build_problem()
state = sm.init_state(problem)
mesh = mh.global_mesh("sp")
assert mesh.shape["sp"] == 4 * nproc

res = run_sweeps_sharded(problem, state, 6, mesh)
clean = multihost_utils.process_allgather(res.state.clean, tiled=True)
resid = multihost_utils.process_allgather(res.state.resid, tiled=True)
chi2 = float(res.state.chi2)
n_acc = int(res.state.n_accept)
if rank == 0:
    np.savez(out, clean=np.asarray(clean), resid=np.asarray(resid),
             chi2=chi2, n_accept=n_acc)
print(f"[p{rank}] done chi2={chi2}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _baseline():
    """Single-process 8-device run of the identical program."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from deconv3d_tpu import Cube, convolve as cv, instruments as ins
    from deconv3d_tpu import sampler as sm
    from deconv3d_tpu.parallel.sweep_sharded import run_sweeps_sharded

    f, L, Y, X = 5, 16, 40, 10
    rng = np.random.default_rng(42)
    truth = np.zeros((L, Y, X))
    truth[L // 2, Y // 2, X // 2] = 5.0
    truth[L // 3, 2, 2] = 3.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0),
        pixel_scale=0.2,
    )
    cube0 = Cube.from_data(truth, crval=4750.0, cdelt=1.25, dtype=np.float64)
    fsf = inst.fsf.bank(cube0.wavelengths(), size=f, pixel_scale=0.2)
    lsf = inst.lsf.bank(cube0.wavelengths(), cdelt=1.25, width=5)
    conv = np.asarray(cv.convolve_cube(
        jnp.asarray(truth), jnp.asarray(fsf), jnp.asarray(lsf)))
    data = conv + 0.2 * rng.standard_normal(conv.shape)
    cube = Cube.from_data(data, variance=np.full_like(data, 0.04),
                          crval=4750.0, cdelt=1.25, dtype=np.float64)
    cfg = sm.RunConfig(max_iterations=30, burn_in=10, seed=4, fsf_size=f,
                       lsf_width=5, dtype=np.float64)
    problem = sm.make_problem(cube, inst, cfg)
    state = sm.init_state(problem)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    res = run_sweeps_sharded(problem, state, 6, mesh)
    return (np.asarray(res.state.clean), np.asarray(res.state.resid),
            float(res.state.chi2), int(res.state.n_accept))


@pytest.mark.slow
def test_two_process_global_mesh_matches_single_process(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "result.npz"
    port = _free_port()

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the subprocesses must not inherit the parent's 8-device XLA_FLAGS
    env.pop("XLA_FLAGS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize: keep workers off the TPU plugin

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

    # Same mesh size, same program: the chain is draw-for-draw the same.
    # Cross-process psum/ppermute may legitimately reorder reductions, so
    # allclose at f64 tightness rather than bit-equality for the floats.
    np.testing.assert_allclose(got["clean"], clean, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got["resid"], resid, rtol=1e-12, atol=1e-12)
    assert int(got["n_accept"]) == n_acc
    assert abs(float(got["chi2"]) - chi2) <= 1e-9 * abs(chi2)
