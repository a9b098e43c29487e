"""Multi-chip full-field path tests on the 8-device CPU mesh (C10, §5.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deconv3d_tpu import convolve as cv
from deconv3d_tpu import instruments as ins
from deconv3d_tpu.parallel import make_mesh
from deconv3d_tpu.parallel.sharded import (
    convolve_cube_sharded, halo_exchange, sharded_chi2,
)


@pytest.fixture
def mesh():
    return make_mesh(axis_name="sp")


@pytest.fixture
def field(rng):
    L, Y, X = 64, 24, 20
    clean = rng.normal(size=(L, Y, X))
    lam = np.linspace(4750, 4830, L)
    fsf = ins.MoffatFSF(fwhm=0.7, lambda_ref=4790.0, fwhm_slope=-4e-5).bank(
        lam, size=7, pixel_scale=0.2
    )
    lsf = ins.MUSELSF().bank(lam, cdelt=1.25, width=9)
    return jnp.asarray(clean), jnp.asarray(fsf), jnp.asarray(lsf)


def test_sharded_conv_matches_single_device(mesh, field):
    clean, fsf, lsf = field
    want = cv.convolve_cube(clean, fsf, lsf, spectral="banded")
    clean_sh = jax.device_put(clean, NamedSharding(mesh, P("sp", None, None)))
    got = convolve_cube_sharded(clean_sh, fsf, lsf, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)
    # output is genuinely λ-sharded over 8 devices
    assert len({s.device for s in got.addressable_shards}) == 8


def test_sharded_conv_rejects_indivisible(mesh, field):
    clean, fsf, lsf = field
    with pytest.raises(ValueError):
        convolve_cube_sharded(clean[:63], fsf[:63], lsf[:63], mesh)


def test_sharded_chi2_matches(mesh, field, rng):
    clean, fsf, lsf = field
    model = cv.convolve_cube(clean, fsf, lsf)
    data = model + 0.1 * jnp.asarray(rng.standard_normal(model.shape))
    w = jnp.ones_like(data)
    want = float(jnp.sum((data - model) ** 2 * w))
    sharding = NamedSharding(mesh, P("sp", None, None))
    got = sharded_chi2(
        jax.device_put(data, sharding), jax.device_put(model, sharding),
        jax.device_put(w, sharding), mesh,
    )
    assert float(got) == pytest.approx(want, rel=1e-5)


def test_halo_exchange_ring(mesh):
    """Each shard receives exactly its neighbours' edge rows."""
    import functools

    n = 8
    rows_per = 4
    halo = 2
    # global array whose value encodes the global row index
    x = jnp.arange(n * rows_per, dtype=jnp.float32)[:, None].repeat(3, 1)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("sp", None)))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=P("sp", None), out_specs=(P("sp", None), P("sp", None)),
    )
    def run(xl):
        return halo_exchange(xl, halo, "sp")

    prev, nxt = run(x_sh)
    prev, nxt = np.asarray(prev), np.asarray(nxt)
    for d in range(n):
        got_prev = prev[d * halo : (d + 1) * halo, 0]
        got_next = nxt[d * halo : (d + 1) * halo, 0]
        if d == 0:
            np.testing.assert_array_equal(got_prev, 0.0)
        else:
            np.testing.assert_array_equal(
                got_prev, np.arange(d * rows_per - halo, d * rows_per)
            )
        if d == n - 1:
            np.testing.assert_array_equal(got_next, 0.0)
        else:
            np.testing.assert_array_equal(
                got_next,
                np.arange((d + 1) * rows_per, (d + 1) * rows_per + halo),
            )
