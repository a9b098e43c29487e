"""Pallas fused-sweep engine tests (SURVEY.md §7.5).

On CPU these run the kernel in Pallas interpret mode (slow, tiny shapes
only); on TPU the same tests exercise the compiled kernel.  The decisive
check is the incremental-vs-full invariant: the kernel emits every accepted
jump, so ``data - resid == conv(clean)`` must hold to float32 accuracy after
any number of fused sweeps.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _f32_mode():
    """The Pallas engine is float32-only; interpret mode must match
    (x64 literal promotion otherwise poisons in-kernel stores)."""
    jax.config.update("jax_enable_x64", False)
    yield
    jax.config.update("jax_enable_x64", True)

from deconv3d_tpu import Cube
from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm
from deconv3d_tpu.ops.fsf_factor import factor_bank


class TestFactorBank:
    def test_lambda_independent_is_rank1_exact(self):
        lam = np.linspace(4750, 5500, 64)
        bank = ins.MoffatFSF(fwhm=0.66).bank(lam, size=9, pixel_scale=0.2)
        spec, imgs, recon, err = factor_bank(bank)
        assert spec.shape[0] == 1
        assert err < 1e-12
        np.testing.assert_allclose(recon, bank, atol=1e-14)

    def test_chromatic_low_rank(self):
        lam = np.linspace(4750, 9350, 128)
        bank = ins.MoffatFSF(
            fwhm=0.66, lambda_ref=7000.0, fwhm_slope=-3e-5
        ).bank(lam, size=13, pixel_scale=0.2)
        spec, imgs, recon, err = factor_bank(bank, tol=1e-5)
        assert spec.shape[0] <= 4
        assert err <= 1e-5
        # reconstruction = Σ_s spec ⊗ img
        manual = np.einsum("sl,sab->lab", spec, imgs)
        np.testing.assert_allclose(manual, recon, atol=1e-12)


def _toy_problem(rng, n_sweeps=6, L=16, Y=6, X=6):
    truth = np.zeros((L, Y, X), np.float32)
    truth[8, 3, 3] = 5.0
    inst = ins.Instrument(
        fsf=ins.GaussianFSF(fwhm=0.5), lsf=ins.GaussianLSF(fwhm=2.0)
    )
    data = truth + 0.1 * rng.standard_normal((L, Y, X)).astype(np.float32)
    cube = Cube.from_data(
        data, variance=np.full_like(data, 0.01), crval=4750.0, cdelt=1.25
    )
    cfg = sm.RunConfig(
        max_iterations=n_sweeps, burn_in=2, seed=1, fsf_size=5,
        lsf_width=5, engine="pallas",
    )
    return sm.make_problem(cube, inst, cfg)


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas interpret mode lacks a real PRNG on CPU; the kernel is "
    "validated on TPU via benchmarks/validate_pallas.py (run every round) "
    "and these same assertions.",
)
class TestPallasEngine:
    """Compiled-kernel assertions (TPU only)."""

    def test_invariant_and_chi2(self, rng):
        p = _toy_problem(rng)
        state = sm.init_state(p)
        res = sm.run_sweeps(p, state, 6)
        st = res.state
        assert float(st.n_accept) > 0

        h = p.f // 2
        conv = cv.convolve_cube(st.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
        model = (
            p.data_pad[:, h : h + p.Y, h : h + p.X]
            - st.resid[:, h : h + p.Y, h : h + p.X]
        )
        w = np.asarray(p.w_pad[:, h : h + p.Y, h : h + p.X])
        np.testing.assert_allclose(
            np.asarray(model)[w > 0], np.asarray(conv)[w > 0], atol=5e-4
        )
        np.testing.assert_allclose(
            float(st.chi2), float(sm.full_chi2(p, st)), rtol=1e-3
        )

    def test_deterministic_and_segmented(self, rng):
        p = _toy_problem(rng)
        r1 = sm.run_sweeps(p, sm.init_state(p), 6)
        r2 = sm.run_sweeps(p, sm.init_state(p), 6)
        np.testing.assert_array_equal(
            np.asarray(r1.state.clean), np.asarray(r2.state.clean)
        )
        # segmented == monolithic (kernel carries RNG via the state key)
        part = sm.run_sweeps(p, sm.init_state(p), 3)
        part2 = sm.run_sweeps(p, part.state, 3)
        assert part2.state.sweep == 6
        # traces concatenate to the same length with consistent accounting
        assert float(part2.state.n_propose) == float(r1.state.n_propose)

    def test_trace_contract_matches_jnp_engine(self, rng):
        """Both engines fill the same ChainResult contract on one problem."""
        p = _toy_problem(rng)
        res = sm.run_sweeps(p, sm.init_state(p), 6)
        p_jnp = dataclasses.replace(
            p, config=dataclasses.replace(p.config, engine="jnp")
        )
        res_j = sm.run_sweeps(p_jnp, sm.init_state(p_jnp), 6)
        for a, b in zip(
            jax.tree_util.tree_leaves(res), jax.tree_util.tree_leaves(res_j)
        ):
            assert a.shape == b.shape, (a.shape, b.shape)
        # same posterior target: chi2 after a few sweeps in same ballpark
        assert np.isfinite(float(res.state.chi2))
