"""HBM-tiled fused kernel (ops/pallas_tiled.py) — CPU-testable pieces.

The compiled kernel itself needs the hardware PRNG, so its sampling
correctness (invariant, determinism, segmentation, analytic posterior) is
gated on the TPU via benchmarks/validate_pallas.py — same policy as the
whole-cube kernel (tests/test_pallas_engine.py docstring).  Everything
below runs in CI: the tile planner, the layout shuffles (pure jnp), and
make_problem's three-step engine resolution (pallas → pallas_tiled → jnp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deconv3d_tpu import Cube
from deconv3d_tpu import instruments as ins
from deconv3d_tpu import sampler as sm
from deconv3d_tpu.ops import pallas_sweep as ps
from deconv3d_tpu.ops import pallas_tiled as pt
from deconv3d_tpu.ops.pallas_sweep import _dclean_to_cube, _to_color_layout


class TestPlanner:
    def test_full_muse_field_has_a_plan(self):
        plan = pt.plan_tiles(17, 18, 18, 3681, 15, S=4)
        assert plan is not None
        ny_t, nx_t = plan
        assert 18 % ny_t == 0 and 18 % nx_t == 0
        n_tiles = (18 // ny_t) * (18 // nx_t)
        assert (
            pt.tiled_vmem_bytes(17, ny_t, nx_t, 3681, 15, 4, n_tiles)
            <= ps.VMEM_BUDGET_BYTES
        )

    def test_no_plan_under_tiny_budget(self):
        assert pt.plan_tiles(17, 18, 18, 3681, 15, budget=1024) is None

    def test_full_muse_field_has_a_gibbs_plan(self):
        plan = pt.plan_tiles(17, 18, 18, 3681, 15, S=4, gibbs=True)
        assert plan is not None
        ny_t, nx_t = plan
        n_tiles = (18 // ny_t) * (18 // nx_t)
        assert (
            pt.tiled_vmem_bytes(17, ny_t, nx_t, 3681, 15, 4, n_tiles,
                                gibbs=True)
            <= ps.VMEM_BUDGET_BYTES
        )

    def test_window_alignment(self):
        # every tile geometry must produce 16-multiple window widths (bf16
        # DMA tiles) and cover the widest rolled read.
        for f in (3, 5, 7, 9, 17):
            for nx_t in (1, 2, 3):
                BY, BX, W8, Wpa_t, Hp_t = pt.tile_geometry(f, 1, nx_t)
                assert Wpa_t % 16 == 0
                # max read start + width fits the window
                s8max = 8 * ((f - 1 + 15) // 8)
                assert s8max + W8 <= Wpa_t
                # widest patch row fits the aligned read
                assert W8 >= BX + 8


class TestLayouts:
    def test_color_layout_round_trip(self, rng):
        ny, nx, f, ny_t, nx_t = 4, 6, 5, 2, 3
        arr = jnp.asarray(
            rng.standard_normal((ny * f, nx * f)).astype(np.float32)
        )
        lay = pt._tiled_color_layout(arr, ny, nx, f, ny_t, nx_t)
        back = pt._tiled_color_unlayout(lay, ny, nx, f, ny_t, nx_t)
        np.testing.assert_array_equal(
            np.asarray(back), np.asarray(_to_color_layout(arr, ny, nx, f))
        )

    def test_quad_layout_entries(self, rng):
        ny, nx, f, ny_t, nx_t, L, Lp = 4, 6, 5, 2, 3, 7, 128
        n_ty, n_tx = ny // ny_t, nx // nx_t
        quad = jnp.asarray(
            rng.standard_normal((L, ny * f, nx * f)).astype(np.float32)
        )
        qt = np.asarray(
            pt.tiled_quad_layout(quad, ny, nx, f, ny_t, nx_t, L, Lp)
        )
        quad = np.asarray(quad)
        for _ in range(50):
            cy, cx = rng.integers(f), rng.integers(f)
            ty, tx = rng.integers(n_ty), rng.integers(n_tx)
            i, j = rng.integers(ny_t), rng.integers(nx_t)
            lam = rng.integers(L)
            c, tile, ij = cy * f + cx, ty * n_tx + tx, i * nx_t + j
            assert (
                qt[c * n_ty * n_tx + tile, 0, ij * Lp + lam]
                == quad[lam, (ty * ny_t + i) * f + cy, (tx * nx_t + j) * f + cx]
            )

    def test_dclean_tiled_to_cube_composition(self, rng):
        """Tiled dclean -> global layout -> cube must invert the voxel map."""
        ny, nx, f, ny_t, nx_t, L, Lp = 4, 6, 5, 2, 3, 7, 128
        n_ty, n_tx = ny // ny_t, nx // nx_t
        d = jnp.asarray(
            rng.standard_normal((L, ny * f, nx * f)).astype(np.float32)
        )
        qt = pt.tiled_quad_layout(d, ny, nx, f, ny_t, nx_t, L, Lp)
        dk = qt.reshape(f * f, n_ty * n_tx, ny_t * nx_t, Lp)[None]
        K, ncol = 1, f * f
        dg = (
            dk.reshape(K, ncol, n_ty, n_tx, ny_t, nx_t, Lp)
            .transpose(0, 1, 2, 4, 3, 5, 6)
            .reshape(K, ncol, ny * nx * Lp)
        )
        cube = _dclean_to_cube(dg[0][None], ny, nx, f, L, Lp)
        np.testing.assert_array_equal(np.asarray(cube[0]), np.asarray(d))

    def test_window_layout_round_trip(self, rng):
        L, Hp, Wp = 7, 33, 40
        arr = jnp.asarray(
            rng.standard_normal((L, Hp, Wp)).astype(np.float32)
        )
        wl = pt._cube_to_window_layout(arr, 64, 128)
        assert wl.shape == (Hp, 64, 128)
        from deconv3d_tpu.ops.pallas_sweep import _cube_unlayout

        np.testing.assert_array_equal(
            np.asarray(_cube_unlayout(wl, L, Wp)), np.asarray(arr)
        )


def _cube_and_inst(rng, L=48, Y=40, X=40):
    data = rng.standard_normal((L, Y, X)).astype(np.float32)
    cube = Cube.from_data(
        data, variance=np.ones_like(data), crval=4750.0, cdelt=1.25
    )
    inst = ins.Instrument(
        fsf=ins.MoffatFSF(fwhm=0.66, beta=2.6), lsf=ins.MUSELSF(),
        pixel_scale=0.2,
    )
    return cube, inst


class TestEngineResolution:
    def test_auto_steps_down_to_tiled_then_jnp(self, rng, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cube, inst = _cube_and_inst(rng)
        # budget too small for whole-cube, big enough for a tiling
        monkeypatch.setattr(ps, "VMEM_BUDGET_BYTES", 6 * 2**20)
        p = sm.make_problem(
            cube, inst, sm.RunConfig(engine="auto", fsf_size=9, lsf_width=7)
        )
        assert p.config.engine == "pallas_tiled"
        assert p.config.tile is not None
        assert p.fsf_spec is not None  # low-rank factors built for tiled too
        # budget too small for any tiling → jnp
        monkeypatch.setattr(ps, "VMEM_BUDGET_BYTES", 1024)
        p2 = sm.make_problem(
            cube, inst, sm.RunConfig(engine="auto", fsf_size=9, lsf_width=7)
        )
        assert p2.config.engine == "jnp"

    def test_gibbs_steps_down_to_tiled(self, rng, monkeypatch):
        """Exact-Gibbs rides the tiled kernel too (VERDICT r2 next #1):
        auto-resolution steps down to pallas_tiled with qvox in the tiled
        layout and the cube-layout qvox dropped (HBM)."""
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(ps, "VMEM_BUDGET_BYTES", 6 * 2**20)
        cube, inst = _cube_and_inst(rng)
        p = sm.make_problem(
            cube, inst,
            sm.RunConfig(engine="auto", sampler="gibbs", fsf_size=9,
                         lsf_width=7),
        )
        assert p.config.engine == "pallas_tiled"
        assert p.qvox_tiled is not None
        assert p.qvox is None and p.quad is None
        assert p.qvox_tiled.shape == p.quad_tiled.shape

    def test_tiled_rejects_unsupported_samplers(self, rng, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cube, inst = _cube_and_inst(rng)
        # gibbs_block is routed to jnp before the engine check (silent
        # step-down, same as the whole-cube kernel)
        p = sm.make_problem(
            cube, inst,
            sm.RunConfig(engine="pallas_tiled", sampler="gibbs_block",
                         fsf_size=9, lsf_width=7),
        )
        assert p.config.engine == "jnp"

    def test_explicit_tiled_gibbs_plans_a_tile(self, rng, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cube, inst = _cube_and_inst(rng)
        p = sm.make_problem(
            cube, inst,
            sm.RunConfig(engine="pallas_tiled", sampler="gibbs",
                         fsf_size=9, lsf_width=7),
        )
        assert p.config.engine == "pallas_tiled"
        assert p.qvox_tiled is not None and p.config.tile is not None

    def test_explicit_tiled_plans_a_tile(self, rng, monkeypatch):
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cube, inst = _cube_and_inst(rng)
        p = sm.make_problem(
            cube, inst,
            sm.RunConfig(engine="pallas_tiled", fsf_size=9, lsf_width=7),
        )
        assert p.config.engine == "pallas_tiled"
        ny_t, nx_t = p.config.tile
        assert p.ny % ny_t == 0 and p.nx % nx_t == 0


def test_untiled_quad_layout_inverts(rng):
    ny, nx, f, ny_t, nx_t, L, Lp = 4, 6, 5, 2, 3, 7, 128
    quad = jnp.asarray(
        rng.standard_normal((L, ny * f, nx * f)).astype(np.float32)
    )
    qt = pt.tiled_quad_layout(quad, ny, nx, f, ny_t, nx_t, L, Lp)
    back = pt.untiled_quad_layout(qt, ny, nx, f, ny_t, nx_t, L, Lp)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(quad))
