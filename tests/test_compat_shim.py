"""The `deconv3d` drop-in shim and reference-name parity aliases.

Reference users import `from deconv3d import Run, MUSE` and drive
`HyperspectralCube.from_file/.write` (SURVEY.md §1.2/§2); the shim must
serve the whole public surface unchanged.
"""

import numpy as np
import pytest

import deconv3d
import deconv3d_tpu


def test_shim_exports_full_public_surface():
    for name in deconv3d_tpu.__all__:
        assert getattr(deconv3d, name) is getattr(deconv3d_tpu, name), name
    assert deconv3d.HyperspectralCube is deconv3d_tpu.Cube
    assert "HyperspectralCube" in deconv3d.__all__


def test_reference_workflow_through_shim(tmp_path):
    from deconv3d import GaussianLineSpreadFunction as GLSF
    from deconv3d import GaussianPointSpreadFunction as GPSF
    from deconv3d import HyperspectralCube, Instrument, Run

    rng = np.random.default_rng(0)
    data = rng.standard_normal((24, 8, 8)).astype(np.float32)
    data[12, 4, 4] += 30.0
    cube = HyperspectralCube.from_data(
        data, variance=np.ones_like(data), crval=4750.0, cdelt=1.25
    )
    path = str(tmp_path / "cube.fits")
    cube.write(path)
    loaded = HyperspectralCube.from_file(path)
    np.testing.assert_allclose(np.asarray(loaded.data), data, rtol=1e-6)
    assert loaded.crval == 4750.0 and loaded.cdelt == 1.25

    inst = Instrument(fsf=GPSF(fwhm=0.6), lsf=GLSF(fwhm=3.0))
    run = Run(path, inst, max_iterations=6, burn_in=2, seed=0)
    run.run()
    out = run.deconvolved_cube()
    assert out.data.shape == data.shape
    assert np.isfinite(float(run.chi2))


def test_from_file_write_npz_roundtrip(tmp_path):
    from deconv3d import HyperspectralCube

    data = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    cube = HyperspectralCube.from_data(data, crval=1.0, cdelt=2.0)
    path = str(tmp_path / "cube.npz")
    cube.write(path)
    loaded = HyperspectralCube.from_file(path)
    np.testing.assert_array_equal(np.asarray(loaded.data), data)
    assert loaded.cdelt == 2.0


def test_scalar_variance_broadcast():
    """Constant-noise shorthand: variance may be a scalar (or any
    broadcastable shape) in both Cube.from_data and the Run facade."""
    from deconv3d import HyperspectralCube, Run
    from deconv3d_tpu.instruments import (
        GaussianLineSpreadFunction, GaussianPointSpreadFunction, Instrument,
    )

    data = np.random.default_rng(1).standard_normal((16, 6, 6)).astype(
        np.float32
    )
    cube = HyperspectralCube.from_data(data, variance=0.25)
    assert cube.variance.shape == data.shape
    assert float(cube.variance[3, 2, 1]) == 0.25
    with pytest.raises(ValueError, match="broadcastable"):
        HyperspectralCube.from_data(data, variance=np.ones((5, 6, 6)))

    inst = Instrument(fsf=GaussianPointSpreadFunction(fwhm=0.5),
                      lsf=GaussianLineSpreadFunction(fwhm=2.5))
    run = Run(HyperspectralCube.from_data(data), inst, variance=4.0,
              max_iterations=4, burn_in=1)
    assert run.cube.variance.shape == data.shape
    run.run()
    assert np.isfinite(float(run.chi2))
