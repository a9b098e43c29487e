"""Pattern (blocked) MH moves — spatial mixing accelerator (ROADMAP r3 #1).

Single-site samplers mix slowly under FSF blur.  Eigen-analysis of the
posterior precision (KᵀWK) shows WHY, and it is the opposite of the naive
multigrid intuition: the *stiff* directions are the smooth ones (blur
preserves them), while the *soft*, large-variance directions are patterns
the blur nearly annihilates — for a truncated/flat-ish FSF these are
f-periodic sign-alternating patterns, NOT simple neighbor dipoles
(condition numbers ~1e11 on a strongly blurred toy).  A single-spaxel move
is mostly made of stiff components, so its accepted step along the soft
modes is tiny — that is the random walk the dense R̂ map shows.

This module adds *pattern moves*: one shared spectrum jump δ[λ] applied to
an f×f spatial pattern p anchored on the f-strided block grid,

    clean[λ, If+a, Jf+b] += δ[λ]·p[a,b].

The pattern's model response is R[λ] = Σ_ab p[a,b]·shift_ab(F[λ]) (size
(2f−1)²), so the single-site algebra lifts wholesale:
Δchi² = Σ g²·quadR − 2 Σ g·linR with g = LSF(δ), quadR = Σ R²w and
linR = Σ R·(resid·w) — stride-f depthwise correlations (one XLA conv
each).  Responses span < 2f, so a 2×2 checkerboard over anchors gives four
colors of simultaneously-updatable moves (the fine sweep's disjointness
argument, one level up).  Every color step is a set of symmetric-proposal
MH kernels on linear subspace directions: the pass preserves the posterior
exactly.

Pattern families (``coarse_mode``):

  * ``soft`` (default): the k softest eigenvectors of the FSF's spatial
    autocorrelation quadratic form  A[(ab),(a'b')] = Σ_λ (F⋆F)[a−a', b−b']
    — the in-block directions the blur most annihilates, i.e. precisely
    the degenerate posterior directions the fine sweep cannot traverse.
    Closed-form (f²×f² host eigendecomposition at problem build).
  * ``block``: the all-ones pattern (smooth move; stiff under blur but
    useful on weakly-blurred data).
  * ``mixed``: soft + block.
  * ``global`` (round 3; VERDICT r2 weak #4): ONE globally-coherent
    f-periodic direction per soft pattern — d[y,x] = p[y mod f, x mod f]
    over the whole (valid) field — with the coefficient SPECTRUM δ[λ]
    drawn EXACTLY from its banded Gaussian conditional
    A = Mᵀ·diag(QR)·M, QR[λ] = Σ_uv R_d²w (a hit-and-run Gibbs move
    along the blur-null subspace: acceptance 1, no tuning).  The round-2
    eigen-analysis showed the truly degenerate posterior directions are
    exactly these global f-periodic patterns — per-anchor moves leak
    stiffness at block edges; the global draw traverses the whole soft
    subspace in one exact update.

Proposal scale: the conditional along a pattern direction is Gaussian with
per-λ precision quadR, so the random-walk optimum ≈ 2.4/√L · quadR^{-1/2}
is available in closed form — Gaussian draws, no adaptation state, no
checkpoint change.

Only anchors whose full pattern support is valid move (a shared jump would
drag frozen/off-grid spaxels off zero and sample an extended posterior).
Positivity mode is rejected by make_problem (a shared jump cannot respect
per-voxel positivity).  Runs as plain jnp on any engine's state — an
occasional move (every ``coarse_every`` sweeps), three XLA convs per
color step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

#: number of soft eigen-patterns used by mode='soft'
N_SOFT = 4

#: auto-enable threshold for interleaved global passes (spaxel count).
#: Measured wall-clock ESS/s vs plain (COARSE_REGIMES_r05.json, on-chip):
#: the pass costs ~one full conv, so it only pays where a sweep itself is
#: expensive — 120×120 mh: 6.4× voxel / 6.0× box-flux ESS/s; full MUSE
#: field: 4.5× (FULLFIELD_r03_coarse.json).  At 24×24/30×30 the same pass
#: is 8–17 sweeps' worth of time and measured 0.08–0.5× voxel and
#: 0.12–0.34× box-flux ESS/s — a net loss, so small fields stay plain.
COARSE_AUTO_MIN_SPAXELS = 10_000

#: minimum FSF footprint for the auto default: with a narrow FSF the
#: posterior has no slow blur-null modes for the pass to attack, so it
#: would only eat the ~conv-per-8-sweeps cost.  All measured wins are at
#: the MUSE default f=17.
COARSE_AUTO_MIN_F = 9


def auto_coarse_every(problem):
    """Data-driven default for ``coarse_every`` (None = stay plain).

    Fires ONLY where the interleaved global pattern passes are a measured
    wall-clock ESS/s win (VERDICT r4 #1): reference-parity ``mh`` on large
    blurred fields (≥ ``COARSE_AUTO_MIN_SPAXELS`` spaxels, footprint ≥
    ``COARSE_AUTO_MIN_F``).  gibbs is excluded: at 120×120 the passes buy
    8.3× voxel ESS/s but COST 25% of box-flux ESS/s (COARSE_REGIMES_r05
    mid gibbs_coarse8 vs_plain_box 0.75) — not a safe default.  Positivity
    is excluded structurally (a shared pattern jump cannot reflect
    per-voxel constraints; make_problem rejects the combination).
    """
    cfg = problem.config
    if (
        cfg.sampler == "mh"
        and not cfg.positivity
        and problem.Y * problem.X >= COARSE_AUTO_MIN_SPAXELS
        and problem.f >= COARSE_AUTO_MIN_F
    ):
        return 8
    return None


def soft_patterns(fsf_np: np.ndarray, k: int = N_SOFT) -> np.ndarray:
    """The k softest f×f patterns of the FSF autocorrelation form.

    Minimizes Σ_λ ||F[λ] ⊛ p||² over unit-norm patterns: the quadratic form
    is Toeplitz in the FSF autocorrelation, A[(ab),(a'b')] =
    Σ_λ (F⋆F)[a−a', b−b'], an f²×f² host eigenproblem.  Returns [k, f, f].
    """
    fsf = np.asarray(fsf_np, np.float64)
    L, f, _ = fsf.shape
    # autocorrelation per λ, summed: (F⋆F)[dy, dx], dy/dx ∈ [-(f-1), f-1].
    # Subsample STRIDED across the full λ range (≤64 planes): the first-64
    # prefix would bias the patterns toward the blue end for chromatic FSFs
    # (fwhm_slope), costing mixing efficiency on red-dominated cubes.
    ac = np.zeros((2 * f - 1, 2 * f - 1))
    for l in range(0, L, max(1, L // 64)):
        import scipy.signal

        ac += scipy.signal.correlate2d(fsf[l], fsf[l], mode="full")
    idx = np.arange(f)
    dy = idx[:, None] - idx[None, :]            # a - a'
    A = ac[
        (dy[:, None, :, None] + f - 1),
        (dy[None, :, None, :] + f - 1),
    ].reshape(f * f, f * f)
    # A[(a,b),(a',b')] = ac[a-a'+f-1, b-b'+f-1]
    evals, evecs = np.linalg.eigh(A)
    return evecs[:, :k].T.reshape(k, f, f)


def _patterns(problem, mode: str):
    """Concrete [f, f] float patterns for one pass of ``mode``."""
    f = problem.f
    if mode == "block":
        return [np.ones((f, f))]
    if mode == "soft":
        return list(soft_patterns(np.asarray(problem.fsf)))
    if mode == "mixed":
        return _patterns(problem, "soft") + _patterns(problem, "block")
    raise ValueError(f"unknown coarse mode {mode!r}")


def batched_field_response(d_stack: jax.Array, fsf: jax.Array) -> jax.Array:
    """R[i,λ,u,v] = Σ_{y,x} d_i[y,x]·F[λ, u−y, v−x] on the PADDED grid.

    One conv for ALL direction fields (batch dim = patterns): the pass
    over the FSF bank is shared, and downstream consumers read the
    residual once per λ-chunk instead of once per pattern.
    """
    L, f, _ = fsf.shape
    return jax.lax.conv_general_dilated(
        d_stack[:, None].astype(fsf.dtype),           # [k, 1, Yc, Xc]
        jnp.flip(fsf, (1, 2))[:, None],               # [L, 1, f, f]
        window_strides=(1, 1),
        padding=((f - 1, f - 1), (f - 1, f - 1)),
        precision=jax.lax.Precision.HIGHEST,
    )                                                 # [k, L, Hp, Wp]


def pattern_field_response(d_yx: jax.Array, fsf: jax.Array) -> jax.Array:
    """R_d[λ,u,v] = Σ_{y,x} d[y,x]·F[λ, u−y, v−x] on the PADDED grid.

    The spaxel-(y,x) patch occupies padded rows [y, y+f) — exactly the
    sampler's residual layout — so committing ``g[λ]·R_d[λ]`` is the exact
    separable delta of the global move clean += δ·d.
    """
    return batched_field_response(d_yx[None], fsf)[0]  # [L, Hp, Wp]


def pattern_response(fsf: jax.Array, pattern: np.ndarray) -> jax.Array:
    """R[λ] = Σ_ab p[a,b]·shift_ab(FSF):  [L, 2f−1, 2f−1]."""
    L, f, _ = fsf.shape
    K = 2 * f - 1
    out = jnp.zeros((L, K, K), fsf.dtype)
    for a in range(f):
        for b in range(f):
            if pattern[a, b] != 0.0:
                out = out.at[:, a : a + f, b : b + f].add(
                    jnp.asarray(pattern[a, b], fsf.dtype) * fsf
                )
    return out


def _depthwise_strided(x: jax.Array, k: jax.Array, stride: int) -> jax.Array:
    """Per-λ VALID correlation of x [L,H,W] with k [L,Ky,Kx] at `stride`."""
    L = x.shape[0]
    return jax.lax.conv_general_dilated(
        x[None],
        k[:, None],
        window_strides=(stride, stride),
        padding="VALID",
        feature_group_count=L,
        precision=jax.lax.Precision.HIGHEST,
    )[0]


def _expand_anchors(g: jax.Array, R: jax.Array, B: int, Hp: int, Wp: int):
    """Σ_{I,J} g[λ,I,J]·R[λ, u−IB, v−JB]  ->  [L, Hp, Wp].

    Transposed stride-B depthwise conv: dilate g by B, correlate with the
    flipped response; lo-pad K−1 lands anchor (I,J)'s patch at (IB, JB),
    hi-pad tops the output up to the padded-grid extent.
    """
    L, Ky, Kx = R.shape
    ny, nx = g.shape[1], g.shape[2]
    out = jax.lax.conv_general_dilated(
        g[None],
        R[:, None, ::-1, ::-1],
        window_strides=(1, 1),
        padding=(
            (Ky - 1, Hp - (ny - 1) * B - 1),
            (Kx - 1, Wp - (nx - 1) * B - 1),
        ),
        lhs_dilation=(B, B),
        feature_group_count=L,
        precision=jax.lax.Precision.HIGHEST,
    )[0]
    assert out.shape == (L, Hp, Wp), (out.shape, Hp, Wp)
    return out


def global_constants(problem):
    """mode='global': stacked direction fields + per-pattern banded
    Cholesky factors + the cross-coupling table — build once per run.

    The direction field d_i[y,x] = p_i[y mod f, x mod f]·valid zeroes
    frozen spaxels, so each conditional is exact under any mask.  Besides
    the per-pattern precision diagonal QR[i,λ] = Σ_uv R_i[λ]²w (constant —
    weights are), this precomputes the CROSS table
    C[i,j,λ] = Σ_uv R_i[λ]·R_j[λ]·w[λ]: committing a draw along direction
    i shifts every other direction's linear term by exactly −g_i[λ]·C[i,j,λ]
    (the commit is linear in the residual), so the sequential exact draws
    of one pass need NO residual re-read between patterns — one batched
    response conv for all LRs, k cheap [L]-vector updates, one batched
    commit (ops/coarse.py `_global_pass_batch`).  Patterns whose response
    norm vanishes at some λ (fully masked planes → improper conditional)
    are dropped.

    λ-chunked on huge fields: the whole-cube batched response is ~5 GB of
    transients on a full MUSE field, and the lazy dispatch backend can
    hold several chunks' working sets at once; the per-chunk sync bounds
    both.
    """
    from . import banded as bd

    p = problem
    dtype = p.config.dtype
    validf = p.valid.astype(dtype)
    fsf = p.fsf.astype(dtype)
    d_stack = jnp.stack([
        jnp.tile(jnp.asarray(pat, dtype), (p.ny, p.nx)) * validf
        for pat in soft_patterns(np.asarray(p.fsf))
    ])
    chunk = 256 if p.w_pad.nbytes > 2**28 else p.L
    C_parts = []
    for lo in range(0, p.L, chunk):
        hi = min(p.L, lo + chunk)
        R_c = batched_field_response(d_stack, fsf[lo:hi])
        w_c = p.w_pad[lo:hi].astype(dtype)
        C_parts.append(jnp.einsum(
            "iluv,jluv->ijl", R_c, R_c * w_c[None],
            precision=jax.lax.Precision.HIGHEST,
        ))
        if chunk < p.L:
            jax.block_until_ready(C_parts[-1])
    C = (
        jnp.concatenate(C_parts, axis=2) if len(C_parts) > 1
        else C_parts[0]
    )                                                 # [k, k, L]
    QR = jnp.einsum("iil->il", C)                     # [k, L]
    keep = np.asarray([
        i for i in range(d_stack.shape[0])
        if float(jnp.min(QR[i])) > 0.0
    ], np.int32)
    if keep.size == 0:
        return []
    d_stack = d_stack[keep]
    QR = QR[keep]
    C = C[keep[:, None], keep[None, :]]
    chols = tuple(
        bd.cholesky_banded(bd.precision_bands(p.lsf, QR[i]))
        for i in range(len(keep))
    )
    return [("global_batch", d_stack, QR, chols, C)]


def _global_pass_batch(problem, state, d_stack, QR, chols, C, key, chunk):
    """One pass of exact hit-and-run Gibbs draws along ALL global
    directions: δ_i ~ N(A_i⁻¹ Mᵀ LR_i, A_i⁻¹) with A_i = Mᵀ diag(QR_i) M,
    drawn sequentially (each conditional on the previous commits), which
    leaves the posterior invariant with acceptance 1 and zero tuning.

    The residual is read exactly once (phase A: all LRs from one batched
    response conv per λ-chunk) and written exactly once (phase B: the
    summed commit Σ_i g_i·R_i, linear in the draws) — the sequential
    conditioning between draws happens entirely in [L]-vector space via
    the precomputed cross table (LR_j ← LR_j − g_i·C[i,j]), which is
    algebraically EXACT, not an approximation.  Versus the former
    one-pattern-at-a-time passes this is 4× less conv work and 8× less
    cube traffic per pass (measured 2.2× end-to-end at full field).

    λ-chunking keeps full-MUSE-field transients bounded WITHOUT host
    round-trips: the full chunks run under a ``lax.fori_loop`` whose body
    transients XLA buffer-assigns ONCE and reuses every iteration, so only
    one chunk's ~0.4 GB response is ever live (a straight-line unroll let
    several live at once → RESOURCE_EXHAUSTED at full field; host-dispatched
    chunks with syncs stayed inside HBM but paid ~30 tunnel round-trips per
    pass, measured ~2× slower end-to-end).  Chunk results are bit-identical
    to the whole-cube path (no per-λ op crosses a chunk boundary; CI
    asserts it).  ONLY the two cube buffers are donated — donating the
    whole state would delete the RNG-key buffer, which callers share
    across states (the kernel engines keep ``key`` constant and thread it
    through every segment; a whole-state donation broke exactly that on
    TPU).
    """
    resid, clean, chi2, chi2c, dn = _global_pass_batch_arrays(
        problem, state.resid, state.clean, state.chi2, state.chi2_comp,
        d_stack, QR, chols, C, key, chunk=min(chunk, problem.L),
    )
    return dataclasses.replace(
        state, resid=resid, clean=clean, chi2=chi2, chi2_comp=chi2c,
        n_accept=state.n_accept + dn, n_propose=state.n_propose + dn,
    )


@functools.partial(
    jax.jit, donate_argnums=(1, 2), static_argnames=("chunk",)
)
def _global_pass_batch_arrays(
    problem, resid0, clean0, chi2_in, chi2c_in, d_stack, QR, chols, C,
    key, chunk,
):
    from .. import sampler as sm
    from . import banded as bd

    p = problem
    L = p.L
    k = d_stack.shape[0]
    fsf = p.fsf.astype(resid0.dtype)
    n_full, rem = divmod(L, chunk)

    # phase A: LR[i,λ] = Σ_uv R_i·resid·w — one batched conv per chunk.
    # Full chunks run under fori_loop (ONE chunk's transients live at a
    # time); the remainder chunk, statically shaped, runs straight-line.
    def _lr_part(lo, size, resid):
        fsf_c = jax.lax.dynamic_slice_in_dim(fsf, lo, size, 0)
        w_c = jax.lax.dynamic_slice_in_dim(p.w_pad, lo, size, 0).astype(
            resid.dtype
        )
        r_c = jax.lax.dynamic_slice_in_dim(resid, lo, size, 0)
        R_c = batched_field_response(d_stack, fsf_c)
        return jnp.einsum(
            "kluv,luv->kl", R_c, r_c * w_c,
            precision=jax.lax.Precision.HIGHEST,
        )

    LR = jnp.zeros((k, L), resid0.dtype)
    if n_full:
        LR = jax.lax.fori_loop(
            0, n_full,
            lambda i, acc: jax.lax.dynamic_update_slice(
                acc, _lr_part(i * chunk, chunk, resid0), (0, i * chunk)
            ),
            LR,
        )
    if rem:
        LR = jax.lax.dynamic_update_slice(
            LR, _lr_part(n_full * chunk, rem, resid0), (0, n_full * chunk)
        )

    # sequential exact draws; cross-updates in [L]-vector space
    gs, deltas = [], []
    dchi_tot = jnp.zeros((), jnp.float32)
    for i in range(k):
        key, sub = jax.random.split(key)
        b = sm._lsf_apply_T_lastaxis(LR[i][None], p.lsf)[0]
        noise = jax.random.normal(sub, (L,), dtype=LR.dtype)
        delta = bd.sample_conditional(chols[i], b, noise)
        g = sm._lsf_apply_lastaxis(delta[None], p.lsf)[0]
        dchi_tot = dchi_tot + jnp.sum(
            g * g * QR[i] - 2.0 * g * LR[i], dtype=jnp.float32
        )
        if i + 1 < k:
            LR = LR - g[None] * C[i]      # rows ≤ i already consumed
        gs.append(g)
        deltas.append(delta)
    G = jnp.stack(gs)                                  # [k, L]
    D = jnp.stack(deltas)                              # [k, L]

    # phase B: one batched commit per chunk (linear: Σ_i of the
    # sequential commits), donated buffers updated in place; fori_loop
    # bounds liveness exactly as in phase A
    def _commit(lo, size, carry):
        resid, clean = carry
        fsf_c = jax.lax.dynamic_slice_in_dim(fsf, lo, size, 0)
        R_c = batched_field_response(d_stack, fsf_c)
        G_c = jax.lax.dynamic_slice_in_dim(G, lo, size, 1)
        D_c = jax.lax.dynamic_slice_in_dim(D, lo, size, 1)
        upd_r = jax.lax.dynamic_slice_in_dim(resid, lo, size, 0) - jnp.einsum(
            "kl,kluv->luv", G_c, R_c, precision=jax.lax.Precision.HIGHEST
        )
        resid = jax.lax.dynamic_update_slice_in_dim(resid, upd_r, lo, 0)
        upd_c = jax.lax.dynamic_slice_in_dim(clean, lo, size, 0) + jnp.einsum(
            "kl,kyx->lyx", D_c, d_stack,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(clean.dtype)
        clean = jax.lax.dynamic_update_slice_in_dim(clean, upd_c, lo, 0)
        return resid, clean

    resid, clean = resid0, clean0
    if n_full:
        resid, clean = jax.lax.fori_loop(
            0, n_full,
            lambda i, carry: _commit(i * chunk, chunk, carry),
            (resid, clean),
        )
    if rem:
        resid, clean = _commit(n_full * chunk, rem, (resid, clean))

    y = dchi_tot - chi2c_in
    t = chi2_in + y
    chi2c = (t - chi2_in) - y
    return resid, clean, t, chi2c, jnp.float32(k * L)


def coarse_constants(problem, mode: str = "soft"):
    """Per-pattern (pattern, R, quadR, validR) — build once per run.

    Only anchors whose full pattern support is valid move: a shared jump
    would otherwise drag frozen spaxels (masked, or the off-grid Yc/Xc
    padding) away from zero, sampling an extended posterior the fine sweep
    does not target.  Partially-valid edge anchors keep mixing through the
    fine sweep.
    """
    if mode == "global":
        return global_constants(problem)
    p = problem
    valid = np.asarray(p.valid)
    # w_pad may be stored bf16 (pallas_tiled engine); convs need one dtype
    w_pad = p.w_pad.astype(p.config.dtype)
    out = []
    for pat in _patterns(problem, mode):
        R = pattern_response(p.fsf, pat)
        quad_r = _depthwise_strided(w_pad, R * R, p.f)[:, : p.ny, : p.nx]
        ok = np.ones((p.ny, p.nx), bool)
        support = np.argwhere(pat != 0.0)
        for a, b in support:
            ok &= valid[a :: p.f, b :: p.f][: p.ny, : p.nx]
        valid_r = jnp.asarray(
            ok & np.asarray(jnp.sum(quad_r, axis=0) > 0), p.config.dtype
        )
        out.append(
            ("anchor", jnp.asarray(pat, p.config.dtype), R, quad_r, valid_r)
        )
    return out


@functools.partial(jax.jit, static_argnames=("scale_mult",))
def _pattern_pass(problem, state, pat, R, quad_r, valid_r, key,
                  scale_mult: float):
    """4 checkerboard colors of one pattern's MH updates."""
    from .. import sampler as sm

    p = problem
    L, ny, nx, B = p.L, p.ny, p.nx, p.f

    resid, clean = state.resid, state.clean
    chi2, chi2c = state.chi2, state.chi2_comp
    acc_tot, prop_tot = state.n_accept, state.n_propose

    # fixed near-optimal per-λ scales from the (constant) pattern precision
    sigma = jax.lax.rsqrt(jnp.maximum(quad_r, 1e-20))   # [L, ny, nx]
    scale = jnp.asarray(scale_mult / np.sqrt(L), sigma.dtype) * sigma

    for oy, ox in ((0, 0), (0, 1), (1, 0), (1, 1)):
        key, k1, k2 = jax.random.split(key, 3)
        sel = jnp.zeros((ny, nx), resid.dtype).at[oy::2, ox::2].set(1.0)
        live = sel * valid_r                            # [ny, nx]

        # Gaussian draws (not the fine sweep's Cauchy): this kernel has no
        # scale adaptation, and the 2.4/√d random-walk optimum the static
        # scale targets is a Gaussian-proposal result — heavy tails here
        # just burn acceptance (measured 0.06 vs 0.34).
        draw = jax.random.normal(k1, (L, ny, nx), dtype=resid.dtype)
        jumps = scale * draw * live[None]               # δ per (λ, anchor)
        g = jnp.moveaxis(
            sm._lsf_apply_lastaxis(jnp.moveaxis(jumps, 0, -1), p.lsf),
            -1, 0,
        )                                               # [L, ny, nx]

        lin = _depthwise_strided(resid * p.w_pad.astype(resid.dtype), R, B)[:, :ny, :nx]
        dchi = (
            jnp.einsum("lij,lij->ij", g * g, quad_r,
                       precision=jax.lax.Precision.HIGHEST)
            - 2.0 * jnp.einsum("lij,lij->ij", g, lin,
                               precision=jax.lax.Precision.HIGHEST)
        )                                               # [ny, nx]
        logu = jnp.log(jax.random.uniform(
            k2, (ny, nx), dtype=resid.dtype, minval=1e-37
        ))
        accept = (logu < -0.5 * dchi) & (live > 0)
        accf = accept.astype(resid.dtype)

        resid = resid - _expand_anchors(g * accf[None], R, B, p.Hp, p.Wp)
        # clean[λ, If+a, Jf+b] += δ_acc[λ,I,J]·p[a,b]: one broadcast add on
        # the [L, ny, f, nx, f] block view
        jacc = jumps * accf[None]
        clean = (
            clean.reshape(L, ny, B, nx, B)
            + jacc[:, :, None, :, None] * pat[None, None, :, None, :]
        ).reshape(L, ny * B, nx * B)

        dchi_tot = jnp.sum(jnp.where(accept, dchi, 0.0), dtype=jnp.float32)
        y = dchi_tot - chi2c
        t = chi2 + y
        chi2c = (t - chi2) - y
        chi2 = t
        acc_tot = acc_tot + jnp.sum(accf, dtype=jnp.float32)
        prop_tot = prop_tot + jnp.sum(live, dtype=jnp.float32)

    return dataclasses.replace(
        state, resid=resid, clean=clean, chi2=chi2, chi2_comp=chi2c,
        n_accept=acc_tot, n_propose=prop_tot,
    )


def coarse_pass(problem, state, constants, key, scale_mult: float = 2.4):
    """One coarse pass: every pattern of the configured mode in sequence.

    ``constants`` comes from :func:`coarse_constants`.  Posterior-invariant:
    a fixed sequence of valid MH kernels ('anchor') / exact Gibbs draws
    along global directions ('global').
    """
    # On huge fields, λ-chunk the batched pass in place and sync after it:
    # the whole-cube batched response is ~5 GB of transients, and the lazy
    # dispatch backend keeps consecutive passes' working sets live at once
    # (the same rule as pallas_tiled's segment loop).
    big = state.resid.nbytes > 2**28
    for entry in constants:
        key, sub = jax.random.split(key)
        if entry[0] == "global_batch":
            _, d_stack, QR, chols, C = entry
            state = _global_pass_batch(
                problem, state, d_stack, QR, chols, C, sub,
                chunk=256 if big else problem.L,
            )
            if big:
                jax.block_until_ready(state.chi2)
        else:
            _, pat, R, quad_r, valid_r = entry
            state = _pattern_pass(
                problem, state, pat, R, quad_r, valid_r, sub,
                scale_mult=float(scale_mult),
            )
    return state
