"""Config #4 regression: delta-response exactness of the full conv paths.

The full 300×300×3681 field runs on TPU (benchmarks + verify drives measure
0.114 s/conv, 2.9 Gvoxel/s, 6e-10 analytic error); here the same analytic
delta check runs at reduced size on the CPU mesh, guarding both spatial
paths and the 'auto' resolution logic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins


def _delta_err(L, Y, X, spatial):
    lam = np.linspace(4750, 9350, L)
    fsf_b = ins.MoffatFSF(
        fwhm=0.66, beta=2.6, lambda_ref=7000.0, fwhm_slope=-3e-5
    ).bank(lam, size=17, pixel_scale=0.2)
    lsf_b = ins.MUSELSF().bank(lam, cdelt=1.25, width=11)
    l0, y0, x0 = L // 2, Y // 2, X // 2
    clean = jnp.zeros((L, Y, X)).at[l0, y0, x0].set(1.0)
    out = cv.convolve_cube(
        clean, jnp.asarray(fsf_b), jnp.asarray(lsf_b),
        spatial=spatial, spectral="banded",
    )
    lcol = cv.lsf_matrix(lsf_b)[:, l0]
    mus = np.nonzero(lcol)[0]
    got = np.asarray(out[mus, y0 - 8 : y0 + 9, x0 - 8 : x0 + 9])
    want = lcol[mus, None, None] * fsf_b[mus]
    return np.abs(got - want).max()


@pytest.mark.parametrize("spatial", ["fft", "direct", "auto"])
def test_delta_response_exact(spatial):
    # x64 CPU: both paths must reproduce the analytic instrument response
    assert _delta_err(64, 48, 40, spatial) < 1e-12


def test_wide_field_delta_response():
    """The size class where TPU's non-pow2 FFT degraded (320-point FFTs):
    on CPU the FFT path must stay exact — the TPU-side guard is the 'auto'
    path validated in benchmarks/validate_pallas.py and verify drives."""
    assert _delta_err(16, 300, 300, "fft") < 1e-12
    assert _delta_err(16, 300, 300, "direct") < 1e-12
