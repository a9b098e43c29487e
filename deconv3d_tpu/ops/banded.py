"""Banded SPD linear algebra for blocked-spectrum Gibbs draws.

The conditional precision of one spaxel's FULL spectrum under the separable
instrument model is A = Mᵀ diag(q) M, where M is the banded LSF matrix
(bandwidth lw) and q[μ] = Σ_{dy,dx} F²[μ]·w[μ,·,·] is the per-λ quadratic
weight (sampler.Problem.quad).  A is SPD and banded with bandwidth
p = lw - 1, so a blocked draw c' ~ N(A⁻¹b, A⁻¹) costs O(L·lw²) via banded
Cholesky + two triangular solves — the engine of the ``gibbs_block``
sampler mode (VERDICT r1 next #6; no counterpart in the reference, which
is single-site only).

Band storage: ``bands[..., l, k]`` holds A[l, l+k] for k = 0..p (upper
band-diagonal layout; entries beyond the matrix edge are zero).  All
routines are batched over arbitrary leading dims and jit/scan-friendly
(static band count, lax.scan over the spectral axis).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def precision_bands(lsf: jax.Array, q: jax.Array) -> jax.Array:
    """Bands of A = Mᵀ diag(q) M for the banded LSF matrix.

    ``lsf``: [L, lw] band rows (M[μ, l] = lsf[μ, l-μ+half]); ``q``:
    [..., L] per-λ quadratic weights.  Returns [..., L, lw] with
    bands[..., l, k] = A[l, l+k] = Σ_d q[l+half-d]·lsf[l+half-d, d]·
    lsf[l+half-d, d+k].
    """
    L, lw = lsf.shape
    half = lw // 2
    qp = jnp.pad(q, [(0, 0)] * (q.ndim - 1) + [(lw, lw)])
    lsfp = jnp.pad(lsf, ((lw, lw), (0, 0)))
    lidx = jnp.arange(L)
    out = []
    for k in range(lw):
        acc = jnp.zeros(q.shape, q.dtype)
        for d in range(lw - k):
            # μ = l + half - d for l = 0..L-1  → padded index l + lw+half-d
            off = lw + half - d
            mu_q = jax.lax.dynamic_slice_in_dim(qp, off, L, axis=-1)
            mu_l1 = jax.lax.dynamic_slice_in_dim(lsfp[:, d], off, L)
            mu_l2 = jax.lax.dynamic_slice_in_dim(lsfp[:, d + k], off, L)
            acc = acc + mu_q * mu_l1 * mu_l2
        # zero the entries whose column l+k falls off the matrix edge
        out.append(jnp.where(lidx < L - k, acc, 0.0))
    return jnp.stack(out, axis=-1)


@jax.jit
def precision_diag(lsf: jax.Array, q_lfirst: jax.Array) -> jax.Array:
    """diag(Mᵀ diag(q) M) for λ-LEADING q — the k=0 band of
    :func:`precision_bands`, without materialising the other lw−1 bands.

    ``q_lfirst``: [L, ...spatial].  At full-MUSE-field size the eager
    band loop queues dozens of 1.4 GB temporaries on the lazy dispatch
    backend and OOMs; this jitted single-program form is what
    make_problem's qvox build uses.
    """
    L, lw = lsf.shape
    half = lw // 2
    pads = [(lw, lw)] + [(0, 0)] * (q_lfirst.ndim - 1)
    qp = jnp.pad(q_lfirst, pads)
    lsfp = jnp.pad(lsf, ((lw, lw), (0, 0)))
    out = jnp.zeros_like(q_lfirst)
    for d in range(lw):
        off = lw + half - d
        col = jax.lax.dynamic_slice_in_dim(lsfp[:, d], off, L) ** 2
        col = col.reshape((L,) + (1,) * (q_lfirst.ndim - 1))
        out = out + col * jax.lax.dynamic_slice_in_dim(qp, off, L, axis=0)
    return out


def cholesky_banded(bands: jax.Array, jitter: float = 0.0) -> jax.Array:
    """Upper banded Cholesky A = RᵀR of an SPD band matrix.

    ``bands``: [..., L, p+1] upper band-diagonal layout.  Returns R in the
    same layout (R[l, l+k] at [..., l, k]).  ``jitter`` is added to the
    diagonal (scaled by its magnitude) for near-singular rows — rows with
    zero diagonal (e.g. fully-masked spaxels) yield R[l,l] = sqrt(eps),
    making the subsequent solves produce huge but finite values that the
    caller masks out.
    """
    p = bands.shape[-1] - 1
    L = bands.shape[-2]
    batch = bands.shape[:-2]
    eps = jnp.asarray(1e-30, bands.dtype)

    def row(prev, a_row):
        # prev[m-1, k] = R[i-m, i-m+k] for m = 1..p
        s0 = a_row[..., 0]
        for m in range(1, p + 1):
            s0 = s0 - prev[m - 1][..., m] ** 2
        rii = jnp.sqrt(jnp.maximum(s0 * (1.0 + jitter), eps))
        r_row = [rii]
        for k in range(1, p + 1):
            sk = a_row[..., k]
            for m in range(1, p - k + 1):
                sk = sk - prev[m - 1][..., m] * prev[m - 1][..., m + k]
            r_row.append(sk / rii)
        r_row = jnp.stack(r_row, axis=-1)                # [..., p+1]
        new_prev = (
            tuple([r_row] + [prev[m] for m in range(p - 1)]) if p else ()
        )
        return new_prev, r_row

    # derive from the input so the carry inherits its sharding/vma type
    # (fresh zeros break lax.scan under shard_map: unvarying vs varying)
    prev0 = tuple(
        jnp.zeros_like(bands[..., 0, :]) for _ in range(p)
    )
    bands_t = jnp.moveaxis(bands, -2, 0)                 # [L, ..., p+1]
    _, rows = jax.lax.scan(row, prev0, bands_t)
    return jnp.moveaxis(rows, 0, -2)


def solve_transposed_banded(R: jax.Array, b: jax.Array) -> jax.Array:
    """Solve Rᵀ z = b (forward substitution; Rᵀ is lower-banded)."""
    p = R.shape[-1] - 1
    L = R.shape[-2]
    batch = b.shape[:-1]

    # feed, at step i, R[i-m, i] = R_bands[i-m, m] for m = 1..p
    def shifted(m):
        col = R[..., m]                                  # [..., L]
        return jnp.pad(col, [(0, 0)] * (col.ndim - 1) + [(m, 0)])[..., :L]

    xs = (
        jnp.moveaxis(R[..., 0], -1, 0),                  # R[i, i]
        jnp.stack([jnp.moveaxis(shifted(m), -1, 0) for m in range(1, p + 1)],
                  axis=1) if p else jnp.zeros((L, 0) + batch, R.dtype),
        jnp.moveaxis(b, -1, 0),
    )

    def step(hist, xs_i):
        rii, roff, bi = xs_i
        s = bi
        for m in range(1, p + 1):
            s = s - roff[m - 1] * hist[m - 1]
        zi = s / rii
        new_hist = (
            tuple([zi] + [hist[m] for m in range(p - 1)]) if p else ()
        )
        return new_hist, zi

    hist0 = tuple(jnp.zeros_like(b[..., 0]) for _ in range(p))
    _, z = jax.lax.scan(step, hist0, xs)
    return jnp.moveaxis(z, 0, -1)


def solve_banded(R: jax.Array, b: jax.Array) -> jax.Array:
    """Solve R x = b (backward substitution; R is upper-banded)."""
    p = R.shape[-1] - 1
    L = R.shape[-2]
    batch = b.shape[:-1]

    xs = (
        jnp.moveaxis(R[..., 0], -1, 0),
        jnp.stack(
            [jnp.moveaxis(R[..., m], -1, 0) for m in range(1, p + 1)], axis=1
        ) if p else jnp.zeros((L, 0) + batch, R.dtype),
        jnp.moveaxis(b, -1, 0),
    )

    def step(hist, xs_i):
        rii, roff, bi = xs_i
        s = bi
        for m in range(1, p + 1):
            s = s - roff[m - 1] * hist[m - 1]   # R[i, i+m] · x[i+m]
        xi = s / rii
        new_hist = (
            tuple([xi] + [hist[m] for m in range(p - 1)]) if p else ()
        )
        return new_hist, xi

    hist0 = tuple(jnp.zeros_like(b[..., 0]) for _ in range(p))
    _, x = jax.lax.scan(step, hist0, xs, reverse=True)
    return jnp.moveaxis(x, 0, -1)


def sample_conditional(
    R: jax.Array, b: jax.Array, noise: jax.Array
) -> jax.Array:
    """Draw x ~ N(A⁻¹ b, A⁻¹) given A = RᵀR and standard-normal ``noise``.

    mean: Rᵀz = b, R μ = z;  fluctuation: R η = noise ⇒ cov(η) = A⁻¹.
    """
    z = solve_transposed_banded(R, b)
    return solve_banded(R, z + noise)
