"""Convolution oracle tests vs scipy (SURVEY.md §4.1, C3/C5/C7)."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins


def _scipy_forward(clean, fsf_bank, lsf_bank, order="lsf_first"):
    """Float64 oracle: canonical separable model with zero-padded 'same'."""
    nl = clean.shape[0]
    mat = cv.lsf_matrix(lsf_bank)

    def spectral(x):
        return np.einsum("ml,lyx->myx", mat, x)

    def spatial(x):
        out = np.empty_like(x)
        for i in range(nl):
            k = fsf_bank[i] if fsf_bank.shape[0] > 1 else fsf_bank[0]
            out[i] = scipy.signal.fftconvolve(x[i], k, mode="same")
        return out

    if order == "lsf_first":
        return spatial(spectral(clean))
    return spectral(spatial(clean))


@pytest.fixture
def cube_and_banks(rng):
    nl, ny, nx = 24, 12, 10
    clean = rng.normal(size=(nl, ny, nx)).astype(np.float64)
    lam = np.linspace(4750, 5300, nl)
    fsf = ins.MoffatFSF(fwhm=0.7, lambda_ref=5000.0, fwhm_slope=-4e-5).bank(
        lam, size=7, pixel_scale=0.2
    )
    lsf = ins.MUSELSF().bank(lam, cdelt=1.25, width=9)
    return clean, fsf, lsf


def test_fft_path_vs_scipy(cube_and_banks):
    clean, fsf, lsf = cube_and_banks
    got = cv.convolve_cube(
        jnp.asarray(clean), jnp.asarray(fsf), jnp.asarray(lsf), spatial="fft"
    )
    want = _scipy_forward(clean, fsf, lsf)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10, rtol=1e-8)


def test_direct_path_vs_scipy(cube_and_banks):
    clean, fsf, lsf = cube_and_banks
    got = cv.convolve_cube(
        jnp.asarray(clean), jnp.asarray(fsf), jnp.asarray(lsf), spatial="direct"
    )
    want = _scipy_forward(clean, fsf, lsf)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10, rtol=1e-8)


def test_banded_equals_matrix_spectral(cube_and_banks):
    clean, fsf, lsf = cube_and_banks
    a = cv.apply_lsf_banded(jnp.asarray(clean), jnp.asarray(lsf))
    b = cv.apply_lsf_matrix(
        jnp.asarray(clean), jnp.asarray(cv.lsf_matrix(lsf))
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_fsf_first_order(cube_and_banks):
    clean, fsf, lsf = cube_and_banks
    got = cv.convolve_cube(
        jnp.asarray(clean), jnp.asarray(fsf), jnp.asarray(lsf),
        order="fsf_first",
    )
    want = _scipy_forward(clean, fsf, lsf, order="fsf_first")
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10, rtol=1e-8)
    # and for λ-dependent FSF the two orders genuinely differ
    other = cv.convolve_cube(jnp.asarray(clean), jnp.asarray(fsf), jnp.asarray(lsf))
    assert not np.allclose(np.asarray(got), np.asarray(other), atol=1e-10)


def test_asymmetric_kernel_is_true_convolution(rng):
    """Guards the kernel-flip in the direct path: conv, not correlation."""
    clean = rng.normal(size=(3, 9, 9)).astype(np.float64)
    kern = rng.uniform(size=(1, 5, 5))
    kern /= kern.sum()
    lsf = np.ones((3, 1))
    want = _scipy_forward(clean, kern, lsf)
    for spatial in ("fft", "direct"):
        got = cv.convolve_cube(
            jnp.asarray(clean), jnp.asarray(kern), jnp.asarray(lsf),
            spatial=spatial,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


def test_delta_kernels_are_identity(rng):
    clean = rng.normal(size=(6, 8, 8))
    lam = np.linspace(1, 2, 6)
    fsf = ins.NoFSF().bank(lam, size=5)
    lsf = ins.NoLSF().bank(lam, cdelt=1.0, width=3)
    got = cv.convolve_cube(jnp.asarray(clean), jnp.asarray(fsf), jnp.asarray(lsf))
    np.testing.assert_allclose(np.asarray(got), clean, atol=1e-12)


def test_traced_matrix_equals_host_matrix(cube_and_banks):
    _, _, lsf = cube_and_banks
    a = np.asarray(cv.lsf_matrix_traced(jnp.asarray(lsf)))
    b = cv.lsf_matrix(lsf)
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_next_fast_len():
    assert cv._next_fast_len(1) == 1
    assert cv._next_fast_len(7) == 8
    assert cv._next_fast_len(16) == 16
    assert cv._next_fast_len(17) == 18
    assert cv._next_fast_len(121) == 125
