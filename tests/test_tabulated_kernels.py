"""Tabulated (measured) FSF/LSF kernels.

MUSE practice measures the FSF from field stars; these classes accept the
measured raster directly instead of an analytic profile (superset of the
reference's analytic-only rasterization, SURVEY.md §2).
"""

import numpy as np
import pytest

import deconv3d_tpu as d3d
from deconv3d_tpu import instruments as ins


def _lam(n=16):
    return 4750.0 + 1.25 * np.arange(n)


def test_tabulated_fsf_matches_analytic_bank():
    lam = _lam()
    moffat = ins.MoffatPointSpreadFunction(fwhm=0.7, fwhm_slope=1e-5,
                                           lambda_ref=4750.0)
    bank = moffat.bank(lam, size=9, pixel_scale=0.2)
    tab = ins.TabulatedPointSpreadFunction(image=bank)
    np.testing.assert_allclose(tab.bank(lam, pixel_scale=0.2), bank,
                               rtol=1e-14, atol=0)
    # achromatic [f,f] broadcasts over lambda
    tab2d = ins.TabulatedPointSpreadFunction(image=bank[0])
    out = tab2d.bank(lam, pixel_scale=0.2)
    assert out.shape == bank.shape
    np.testing.assert_allclose(out, np.broadcast_to(bank[0], bank.shape))


def test_tabulated_fsf_crop_and_renorm():
    img = np.zeros((7, 7))
    img[3, 3] = 2.0
    img[0, 0] = 1.0  # mass outside the 5x5 crop
    tab = ins.TabulatedPointSpreadFunction(image=img)
    out = tab.bank(_lam(4), size=5)
    assert out.shape == (4, 5, 5)
    np.testing.assert_allclose(out.sum(axis=(1, 2)), 1.0)
    assert out[0, 2, 2] == 1.0  # renormalised after crop


def test_tabulated_fsf_validation():
    with pytest.raises(ValueError, match="odd"):
        ins.TabulatedPointSpreadFunction(image=np.ones((4, 4)))
    with pytest.raises(ValueError, match="square"):
        ins.TabulatedPointSpreadFunction(image=np.ones((3, 5)))
    with pytest.raises(ValueError, match="non-finite"):
        ins.TabulatedPointSpreadFunction(image=np.full((3, 3), np.nan))
    tab = ins.TabulatedPointSpreadFunction(image=np.ones((5, 3, 3)))
    with pytest.raises(ValueError, match="wavelengths"):
        tab.bank(_lam(4))
    with pytest.raises(ValueError, match="extrapolated"):
        tab.bank(_lam(5), size=5)


def test_tabulated_lsf_matches_analytic_bank():
    lam = _lam()
    gauss = ins.MUSELineSpreadFunction()
    bank = gauss.bank(lam, cdelt=1.25, width=7)
    tab = ins.TabulatedLineSpreadFunction(kernel=bank)
    np.testing.assert_allclose(tab.bank(lam, cdelt=1.25), bank)
    tab1d = ins.TabulatedLineSpreadFunction(kernel=bank[0])
    out = tab1d.bank(lam, cdelt=1.25)
    np.testing.assert_allclose(out, np.broadcast_to(bank[0], bank.shape))
    with pytest.raises(ValueError, match="extrapolated"):
        tab.bank(lam, cdelt=1.25, width=9)


def test_tabulated_instrument_end_to_end_matches_analytic():
    """A Run built from tabulated copies of the analytic kernels must build
    the identical problem (same fsf/lsf banks -> same chain)."""
    lam = _lam(24)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((24, 8, 8)).astype(np.float32)
    cube = d3d.Cube.from_data(data, variance=np.ones_like(data),
                              crval=4750.0, cdelt=1.25)
    analytic = ins.Instrument(
        fsf=ins.GaussianPointSpreadFunction(fwhm=0.5),
        lsf=ins.GaussianLineSpreadFunction(fwhm=2.5),
    )
    fsf_bank, lsf_bank = analytic.kernel_banks(cube)
    tabulated = ins.Instrument(
        fsf=ins.TabulatedPointSpreadFunction(image=fsf_bank),
        lsf=ins.TabulatedLineSpreadFunction(kernel=lsf_bank),
    )
    cfg = d3d.RunConfig(max_iterations=8, burn_in=2, seed=0)
    pa = d3d.make_problem(cube, analytic, cfg)
    pt = d3d.make_problem(cube, tabulated, cfg)
    np.testing.assert_array_equal(np.asarray(pa.fsf), np.asarray(pt.fsf))
    ra = d3d.run_sweeps(pa, d3d.init_state(pa), 8)
    rt = d3d.run_sweeps(pt, d3d.init_state(pt), 8)
    np.testing.assert_array_equal(np.asarray(ra.state.clean),
                                  np.asarray(rt.state.clean))


def test_tabulated_fwhm_estimate_sane():
    lam = _lam(8)
    gauss = ins.GaussianPointSpreadFunction(fwhm=0.8)
    bank = gauss.bank(lam, size=15, pixel_scale=0.2)
    tab = ins.TabulatedPointSpreadFunction(image=bank)
    fw_px = tab.fwhm_at(lam)
    np.testing.assert_allclose(fw_px, 0.8 / 0.2, rtol=0.05)
