"""Instrument kernel rasterisation golden tests (SURVEY.md §4.4, C6/C7)."""

import numpy as np
import pytest

from deconv3d_tpu import instruments as ins


LAM = np.linspace(4750.0, 9350.0, 16)


def _fwhm_of_radial_kernel(kern, oversample=101):
    """Measure FWHM of a 2-D kernel by interpolating its radial profile."""
    f = kern.shape[-1]
    half = f // 2
    x = np.arange(-half, half + 1)
    prof = kern[half, half:]  # radial cut along +x
    peak = prof[0]
    r = np.linspace(0, half, oversample * half + 1)
    vals = np.interp(r, x[x >= 0].astype(float), prof)
    above = r[vals >= peak / 2.0]
    return 2.0 * above.max()


class TestMoffat:
    def test_profile_matches_analytic(self):
        fsf = ins.MoffatFSF(fwhm=0.66, beta=2.6)
        bank = fsf.bank(LAM[:1], size=15, pixel_scale=0.2)
        assert bank.shape == (1, 15, 15)
        k = bank[0]
        # analytic Moffat ratio between r=0 and r=1px
        fw_px = 0.66 / 0.2
        alpha = fw_px / (2 * np.sqrt(2 ** (1 / 2.6) - 1))
        expected = (1 + 1 / alpha**2) ** (-2.6)
        assert k[7, 8] / k[7, 7] == pytest.approx(expected, rel=1e-10)

    def test_normalised(self):
        bank = ins.MoffatFSF(fwhm=0.8, beta=2.8).bank(LAM, size=17, pixel_scale=0.2)
        np.testing.assert_allclose(bank.sum(axis=(1, 2)), 1.0, rtol=1e-12)

    def test_fwhm_measured(self):
        fsf = ins.MoffatFSF(fwhm=1.0, beta=2.6)
        bank = fsf.bank(LAM[:1], size=31, pixel_scale=0.2)
        measured_px = _fwhm_of_radial_kernel(bank[0])
        assert measured_px == pytest.approx(1.0 / 0.2, rel=0.02)

    def test_wavelength_dependence(self):
        fsf = ins.MoffatFSF(fwhm=0.8, lambda_ref=7000.0, fwhm_slope=-3e-5)
        fw = fsf.fwhm_at(LAM)
        assert fw[0] > fw[-1]  # seeing improves to the red
        bank = fsf.bank(LAM, size=15, pixel_scale=0.2)
        # bluer kernel is wider → lower peak
        assert bank[0, 7, 7] < bank[-1, 7, 7]


class TestGaussianFSF:
    def test_matches_analytic_gaussian(self):
        fsf = ins.GaussianFSF(fwhm=0.6)
        bank = fsf.bank(LAM[:1], size=15, pixel_scale=0.2)
        sigma = (0.6 / 0.2) / (2 * np.sqrt(2 * np.log(2)))
        yy, xx = np.mgrid[-7:8, -7:8]
        expected = np.exp(-0.5 * (yy**2 + xx**2) / sigma**2)
        expected /= expected.sum()
        np.testing.assert_allclose(bank[0], expected, rtol=1e-10)


class TestNoFSF:
    def test_delta(self):
        bank = ins.NoFSF().bank(LAM, size=5)
        assert bank.shape == (16, 5, 5)
        assert (bank.sum(axis=(1, 2)) == 1).all()
        assert (bank[:, 2, 2] == 1).all()


class TestLSF:
    def test_muse_fwhm_polynomial(self):
        lsf = ins.MUSELSF()
        # MUSE UDF calibration: ~2.5 Å in the middle of the band (7000 Å)
        fw = lsf.fwhm_at(np.array([7000.0]))[0]
        assert 2.3 < fw < 2.8
        # parabola: larger at both band edges than at the minimum
        fmin = 9.187e-4 / (2 * 5.866e-8)
        assert lsf.fwhm_at(np.array([4750.0]))[0] > lsf.fwhm_at(np.array([fmin]))[0]

    def test_gaussian_lsf_matches_analytic(self):
        lsf = ins.GaussianLSF(fwhm=2.5)
        bank = lsf.bank(LAM[:1], cdelt=1.25, width=11)
        sigma = 2.5 / (2 * np.sqrt(2 * np.log(2)))
        d = np.arange(-5, 6) * 1.25
        expected = np.exp(-0.5 * (d / sigma) ** 2)
        expected /= expected.sum()
        np.testing.assert_allclose(bank[0], expected, rtol=1e-12)

    def test_normalised_and_lambda_dependent(self):
        bank = ins.MUSELSF().bank(LAM, cdelt=1.25)
        np.testing.assert_allclose(bank.sum(axis=1), 1.0, rtol=1e-12)
        assert not np.allclose(bank[0], bank[-1])  # C7: varies with λ

    def test_no_lsf_delta(self):
        bank = ins.NoLSF().bank(LAM, cdelt=1.25)
        assert bank.shape == (16, 1)
        assert (bank == 1).all()


class TestInstrument:
    def test_muse_defaults(self):
        m = ins.MUSE()
        assert m.pixel_scale == 0.2
        assert isinstance(m.fsf, ins.MoffatPointSpreadFunction)
        assert isinstance(m.lsf, ins.MUSELineSpreadFunction)

    def test_kernel_banks_shapes(self):
        from deconv3d_tpu import Cube

        cube = Cube.from_data(
            np.zeros((32, 8, 8), np.float32), crval=4750.0, cdelt=1.25
        )
        fsf, lsf = ins.MUSE().kernel_banks(cube, fsf_size=15, lsf_width=11)
        assert fsf.shape == (32, 15, 15)
        assert lsf.shape == (32, 11)
