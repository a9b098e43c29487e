"""Multi-chip full-field convolution + halo primitives (C10, SURVEY.md §5.7).

The reference runs full MUSE fields (300×300×3681) through a single-process
scipy FFT loop; here the separable convolution spans a device mesh with
explicit XLA collectives over ICI (shard_map — SURVEY.md §2.2):

  * spatial-FSF stage: λ-planes are independent → pure data parallelism over
    the λ axis ("sequence parallel" analog; no halos, no collectives).
  * spectral-LSF stage: mixes wavelengths → re-shard λ-sharded → spaxel-
    sharded with a tiled ``all_to_all`` (Ulysses-style axis swap), run the
    banded kernel locally, swap back.

Also provides ``halo_exchange`` (ppermute ring) — the building block for
spatially-sharded *sampling*, where FSF-footprint patches at shard edges
need neighbour residual columns.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import convolve as cv


def convolve_cube_sharded(
    clean: jax.Array,
    fsf_bank: jax.Array,
    lsf_bank: jax.Array,
    mesh: Mesh,
    axis_name: str = "sp",
    spatial: str = "fft",
) -> jax.Array:
    """Separable instrument convolution of a λ-sharded cube over a mesh.

    ``clean``: [L, Y, X] with L divisible by the mesh axis; input and output
    are λ-sharded (``P(axis_name, None, None)``).  The spectral stage runs
    spaxel-sharded between two all_to_all swaps; the spatial stage runs on
    local λ-planes with the matching slice of the (λ-dependent) FSF bank.
    """
    ndev = mesh.shape[axis_name]
    L, Y, X = clean.shape
    if L % ndev or Y % ndev:
        raise ValueError(
            f"L={L} and Y={Y} must be divisible by the mesh axis size {ndev}"
        )

    spec_lam = P(axis_name, None, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_lam, spec_lam, P(None, None)),
        out_specs=spec_lam,
    )
    def _run(clean_l, fsf_l, lsf_full):
        # λ-sharded [L/D, Y, X] → spaxel-sharded [L, Y/D, X]
        c_y = jax.lax.all_to_all(
            clean_l, axis_name, split_axis=1, concat_axis=0, tiled=True
        )
        c_y = cv.apply_lsf_banded(c_y, lsf_full)
        # back to λ-sharded for the per-plane spatial stage
        c_l = jax.lax.all_to_all(
            c_y, axis_name, split_axis=0, concat_axis=1, tiled=True
        )
        fn = cv.apply_fsf if spatial == "fft" else cv.apply_fsf_direct
        return fn(c_l, fsf_l)

    if fsf_bank.ndim == 2:
        fsf_bank = fsf_bank[None]
    if fsf_bank.shape[0] == 1:
        fsf_bank = jnp.broadcast_to(fsf_bank, (L,) + fsf_bank.shape[1:])
    return _run(clean, fsf_bank, lsf_bank)


def halo_exchange(
    x: jax.Array, halo: int, axis_name: str = "sp", edge_axis: int = 0
) -> tuple:
    """Ring exchange of ``halo``-wide edges along a sharded spatial axis.

    Must be called *inside* shard_map.  Returns (from_prev, from_next):
    the previous shard's last ``halo`` rows and the next shard's first
    ``halo`` rows (zeros at the domain boundary — matching the sampler's
    zero-padded convolution semantics).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = jax.lax.slice_in_dim(x, 0, halo, axis=edge_axis)
    bot = jax.lax.slice_in_dim(
        x, x.shape[edge_axis] - halo, x.shape[edge_axis], axis=edge_axis
    )
    # send my bottom rows to the next shard; my top rows to the previous
    from_prev = jax.lax.ppermute(
        bot, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    from_next = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    zero = jnp.zeros_like(top)
    from_prev = jnp.where(idx == 0, zero, from_prev)
    from_next = jnp.where(idx == n - 1, zero, from_next)
    return from_prev, from_next


def sharded_chi2(
    data: jax.Array, model: jax.Array, weights: jax.Array,
    mesh: Mesh, axis_name: str = "sp",
) -> jax.Array:
    """Global chi² of a λ-sharded (data, model, weights) triple via psum."""
    spec = P(axis_name, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=P(),
    )
    def _run(d, m, w):
        r = d - m
        return jax.lax.psum(jnp.sum(r * r * w, dtype=jnp.float32), axis_name)

    return _run(data, model, weights)
