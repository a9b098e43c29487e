"""Size-aware engine resolution (VERDICT r1 weak #3 / next-round item 3).

The fused Pallas kernel keeps the whole padded residual + bf16 weights
VMEM-resident; geometries that exceed the VMEM budget must fall back to the
jnp engine (engine='auto') or raise a clear error (engine='pallas') instead
of dying in a Mosaic compile crash on the chip.
"""

import jax
import numpy as np
import pytest

from deconv3d_tpu import Cube
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm
from deconv3d_tpu.ops import pallas_sweep as ps


def _small_cube(rng, L=16, Y=6, X=6):
    data = rng.standard_normal((L, Y, X))
    return Cube.from_data(
        data, variance=np.ones_like(data), crval=4750.0, cdelt=1.25
    )


def _inst():
    return ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0),
        pixel_scale=0.2,
    )


def test_vmem_estimate_subcube_fits_fullfield_does_not():
    # MUSE 30x30x600 subcube with the Moffat f=17 footprint: fits.
    sub = ps.segment_vmem_bytes(f=17, ny=2, nx=2, L=600, lw=9)
    assert sub < ps.VMEM_BUDGET_BYTES
    # full MUSE field 300x300x3681: orders of magnitude over budget.
    full = ps.segment_vmem_bytes(f=17, ny=18, nx=18, L=3681, lw=9)
    assert full > 10 * ps.VMEM_BUDGET_BYTES


def test_explicit_pallas_raises_on_oversized_geometry(rng, monkeypatch):
    monkeypatch.setattr(ps, "VMEM_BUDGET_BYTES", 1024)  # force 'too big'
    cube = _small_cube(rng)
    with pytest.raises(ValueError, match="VMEM"):
        sm.make_problem(
            cube, _inst(),
            sm.RunConfig(engine="pallas", fsf_size=5, lsf_width=5),
        )


def test_auto_falls_back_to_jnp_with_warning(rng, monkeypatch, caplog):
    monkeypatch.setattr(ps, "VMEM_BUDGET_BYTES", 1024)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cube = _small_cube(rng)
    with caplog.at_level("WARNING", logger="deconv3d_tpu"):
        problem = sm.make_problem(
            cube, _inst(),
            sm.RunConfig(engine="auto", fsf_size=5, lsf_width=5),
        )
    assert problem.config.engine == "jnp"
    assert any("falling back" in r.getMessage() for r in caplog.records)


def test_auto_still_selects_pallas_when_it_fits(rng, monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cube = _small_cube(rng)
    problem = sm.make_problem(
        cube, _inst(), sm.RunConfig(engine="auto", fsf_size=5, lsf_width=5),
    )
    assert problem.config.engine == "pallas"
