"""Failure detection / fault injection (SURVEY.md §5.3, VERDICT r1 item 7).

The reference loses the whole run on a crash.  Here sampler state (incl. the
RNG key) checkpoints between segments, so a SIGKILLed process resumes
bit-exactly: the test below kills a child mid-run with SIGKILL (a real
process death, not an exception) and asserts the resumed chain is
bit-identical to an uninterrupted one.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

from deconv3d_tpu import Run
from deconv3d_tpu import sampler as sm
from test_sampler import _make_toy

TOTAL = 24
SEG = 4

CHILD = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # testdir for the _make_toy helper, its parent for the package itself
    # (the repo may not be pip-installed in a fresh container)
    sys.path.insert(0, os.path.dirname({testdir!r}))
    sys.path.insert(0, {testdir!r})
    import numpy as np
    from deconv3d_tpu import Run
    from test_sampler import _make_toy

    cube, inst, _ = _make_toy(np.random.default_rng(42), noise=0.2)
    run = Run(cube, inst, max_iterations={total}, burn_in=8, seed=5,
              fsf_size=5, lsf_width=5, dtype=np.float64,
              segment_size={seg}, checkpoint_path={ckpt!r})
    print("READY", flush=True)   # parent starts watching for checkpoints
    # Drive the run segment by segment with a pause after each checkpoint so
    # the parent has a deterministic window to SIGKILL us mid-run (without
    # the pause the whole toy run can finish between two parent polls).
    import time
    while run.sweeps_done < {total}:
        run.run(n_sweeps={seg})
        time.sleep(0.5)
    print("FINISHED", flush=True)  # should never print: parent kills us
    """
)


def _run_reference(ckpt_dir):
    cube, inst, _ = _make_toy(np.random.default_rng(42), noise=0.2)
    run = Run(cube, inst, max_iterations=TOTAL, burn_in=8, seed=5,
              fsf_size=5, lsf_width=5, dtype=np.float64, segment_size=SEG)
    run.run()
    return run


def test_sigkill_mid_run_resumes_bit_exact(tmp_path):
    ckpt = str(tmp_path / "fault_ck.npz")
    testdir = os.path.dirname(os.path.abspath(__file__))
    child_src = CHILD.format(testdir=testdir, total=TOTAL, seg=SEG, ckpt=ckpt)
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the child off the TPU plugin
    proc = subprocess.Popen(
        [sys.executable, "-c", child_src],
        env=env, cwd=testdir,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    # Wait for a mid-run checkpoint (some sweeps done, but not all), then
    # SIGKILL — the hardest failure mode: no cleanup, no atexit, nothing.
    deadline = time.time() + 300
    killed_at = None
    while time.time() < deadline:
        if proc.poll() is not None:
            out, err = proc.communicate()
            pytest.fail(f"child finished before it could be killed:\n{err}")
        if os.path.exists(ckpt):
            try:
                with np.load(ckpt) as z:
                    meta = json.loads(str(z["meta"]))
                done = meta.get("sweeps_done", 0)
            except Exception:
                done = 0  # torn read; try again
            if 0 < done < TOTAL:
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait()
                killed_at = done
                break
        time.sleep(0.02)
    assert killed_at is not None, "never observed a mid-run checkpoint"

    # Resume in-process from the murdered child's checkpoint.
    cube, inst, _ = _make_toy(np.random.default_rng(42), noise=0.2)
    resumed = Run(cube, inst, max_iterations=TOTAL, burn_in=8, seed=5,
                  fsf_size=5, lsf_width=5, dtype=np.float64,
                  segment_size=SEG)
    resumed.resume(ckpt)
    # The child may have written one more segment checkpoint between the
    # parent's read and the SIGKILL landing — any mid-run checkpoint at or
    # past the observed one is a valid kill point.
    assert killed_at <= resumed.sweeps_done < TOTAL
    resumed.run(n_sweeps=TOTAL - resumed.sweeps_done)

    reference = _run_reference(tmp_path)
    np.testing.assert_array_equal(
        np.asarray(resumed.states.clean), np.asarray(reference.states.clean)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.states.chi2), np.asarray(reference.states.chi2)
    )
    np.testing.assert_array_equal(
        np.asarray(resumed.states.key), np.asarray(reference.states.key)
    )


def test_nonfinite_chi2_raises(rng):
    """SURVEY.md §5.2: a diverged run must fail loudly, not accumulate NaNs."""
    import dataclasses

    import jax

    cube, inst, _ = _make_toy(rng, noise=0.2)
    run = Run(cube, inst, max_iterations=4, fsf_size=5, lsf_width=5,
              dtype=np.float64)
    # scope off the CI-wide primitive-level NaN trap so the *production*
    # guard (Run.run's per-segment isfinite check) is what fires here
    jax.config.update("jax_debug_nans", False)
    try:
        # poison the state as if a segment diverged
        run.states = dataclasses.replace(
            run.states, chi2=run.states.chi2 * np.nan
        )
        with pytest.raises(FloatingPointError, match="non-finite"):
            run.run(n_sweeps=2)
    finally:
        jax.config.update("jax_debug_nans", True)
