"""Property-based test of THE invariant (SURVEY §4.2, hypothesis).

Over random geometries, kernels, noise levels, masks and sampler modes, the
incrementally-maintained residual must always equal data − conv(clean).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from deconv3d_tpu import Cube
from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm


# geometry space kept small on purpose: every distinct (shape, kernel size,
# sampler) tuple is a fresh XLA compile; randomness lives in seeds/values.
@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    seed=st.integers(0, 2**16),
    L=st.sampled_from([9]),
    Y=st.sampled_from([5, 6]),
    X=st.sampled_from([5]),
    fsf_size=st.sampled_from([3, 5]),
    lsf_width=st.sampled_from([1, 3]),
    fwhm=st.floats(0.1, 0.8),
    mask_one=st.booleans(),
    sampler_mode=st.sampled_from(["mh", "gibbs"]),
)
def test_incremental_invariant_property(
    seed, L, Y, X, fsf_size, lsf_width, fwhm, mask_one, sampler_mode
):
    rng = np.random.default_rng(seed)
    data = rng.normal(size=(L, Y, X))
    mask = None
    if mask_one:
        mask = np.zeros((Y, X), dtype=bool)
        mask[rng.integers(Y), rng.integers(X)] = True
    cube = Cube.from_data(
        data, variance=np.full_like(data, 0.25), mask=mask,
        crval=4750.0, cdelt=1.25, dtype=np.float64,
    )
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=fwhm), lsf=ins.GaussianLSF(fwhm=1.5)
    )
    cfg = sm.RunConfig(
        max_iterations=12, burn_in=4, seed=seed, dtype=np.float64,
        fsf_size=fsf_size, lsf_width=lsf_width, sampler=sampler_mode,
    )
    p = sm.make_problem(cube, inst, cfg)
    res = sm.run_sweeps(p, sm.init_state(p), 12)
    st_ = res.state

    h = p.f // 2
    conv = cv.convolve_cube(st_.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    model = (
        p.data_pad[:, h : h + p.Y, h : h + p.X]
        - st_.resid[:, h : h + p.Y, h : h + p.X]
    )
    w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
    np.testing.assert_allclose(
        np.asarray(model)[w > 0], np.asarray(conv)[w > 0], atol=1e-9
    )
    # chi2 is tracked in float32 by design (Kahan-compensated); a fresh f32
    # reduction has its own ~1e-6-relative accumulation error.
    np.testing.assert_allclose(
        float(st_.chi2), float(sm.full_chi2(p, st_)),
        rtol=1e-5, atol=1e-5,
    )
    if mask is not None:
        clean_in = np.asarray(st_.clean)[:, : p.Y, : p.X]
        assert (clean_in[:, mask] == 0).all()
