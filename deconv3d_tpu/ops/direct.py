"""Direct (exact) Gaussian posterior sampling — sampler='direct'.

The model is linear-Gaussian:  d = K c + ε,  ε ~ N(0, diag(1/w)),  flat
prior on the free voxels — so the posterior is EXACTLY
N(A⁻¹ Kᵀ W d, A⁻¹) with A = Kᵀ W K.  MCMC (the reference's approach and
our kernel engines) random-walks through A's anisotropy (condition numbers
up to ~1e11 under blur); this module instead draws INDEPENDENT samples by
perturb-and-solve (Papandreou & Yuille 2010 / Hoffman–Ribak):

    b  = Kᵀ W d  +  Kᵀ (√w · z),      z ~ N(0, I)
    c  = A⁻¹ b                ⇒       c ~ N(μ, A⁻¹)  exactly,

with the solve done by preconditioned conjugate gradients.  Every operator
application is separable convolution (the same `convolve` primitives as the
forward model — batched FFTs / depthwise convs, exactly what the TPU is
good at), so one draw costs tens of conv pairs and carries a FULL unit of
effective sample size; there is no burn-in, no autocorrelation, no
acceptance tuning.

Preconditioner: in spatial Fourier space (periodic, mean-weight
approximation) A block-diagonalises over spatial frequency k into λ-banded
SPD matrices  Λ_k = w̄ · Mᵀ diag(|F̂_k(λ)|²) M  — precisely the banded
Cholesky machinery of ops/banded.py, factorised once per run and applied
per CG iteration as rfft2 → per-k banded solve → irfft2.  Masks and the
zero-padded (non-periodic) boundary make the true A differ from Λ, which
costs CG iterations, not correctness — the solve is run to a relative
residual tolerance (``direct_tol``).

Scope: the dense preconditioner tabulates [Y·(X//2+1), L, lw] Cholesky
bands — fine through cut-out scale (hundreds of MB).  Above
``BANDED_BYTES_BUDGET`` (a full MUSE field would need ~10 GB) it switches
automatically to the **radially-binned** variant (VERDICT r2 next #6): the
MUSE FSFs are isotropic, so |F̂_k(λ)|² depends almost only on |k| — the
per-frequency λ-banded factors collapse onto ~256 radial bins
([B, L, lw] ≈ 56 MB).  The solves stay gather-free: frequencies are
equal-count quantile-binned and SORTED by bin (a static permutation), so
every bin is a same-size [M, L] block solved by the ordinary batched
banded solvers against ``R_bin[:, None]`` via broadcasting
(_radial_state/_radial_apply; a per-step-gather variant measured minutes
per iteration and was rejected).  Within-bin power variation costs CG
iterations, not correctness.  ``direct_precond='jacobi'`` remains the
structure-free fallback.  Positivity is rejected (the truncated joint
Gaussian has no closed form).

When to use which sampler (measured on the v5e chip): on well-conditioned
problems the adapted MH/gibbs kernels win raw ESS/s on easy functionals
(MUSE 30×30×600 flux: MH ≈ 2 ESS/s vs direct ≈ 0.5 at ~1 draw/s) — the
direct sampler's value is EXACTNESS and hard regimes: heavy blur or
per-voxel posteriors, where single-site chains under-explore the blur-null
directions and quietly report too-tight posteriors.  On small fields whose
FSF footprint rivals the field size, the periodic-Fourier preconditioner
degrades and draws may hit ``direct_maxiter`` — the per-draw convergence
flag rides the accept trace, so an unconverged run is visible, and
raising ``direct_maxiter`` (or loosening ``direct_tol``) is the fix.

Reference parity note: the reference has no counterpart — this is a
rebuild-only capability (SURVEY.md §2 'rebuild-only additions').
"""

from __future__ import annotations

import dataclasses
import functools
import weakref
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import convolve as cv
from . import banded


# ---------------------------------------------------------------------------
# Forward operator and its adjoint
# ---------------------------------------------------------------------------

def apply_K(problem, c):
    """K c: the package-canonical forward model on [L, Y, X].

    The spatial path follows the ``direct_spatial`` knob (see
    :func:`_spatial`) so the whole PCG operator — forward, adjoint,
    preconditioner — uses one conv implementation.
    """
    return cv.convolve_cube(
        c, problem.fsf, problem.lsf,
        spatial=problem.config.direct_spatial,
    )


def _spatial(problem, r, bank):
    """Per-λ 'same' spatial convolution for the PCG operator/preconditioner.

    Path selection is the ``direct_spatial`` config knob: 'auto' matches
    the backend (depthwise direct conv on TPU — MXU-friendly and layout-
    robust; FFT elsewhere), 'direct'/'fft' force one.  The explicit knob
    exists so harnesses that shard this operator on a CPU mesh (the
    multichip dry-run gate) can request the TPU conv path without
    monkeypatching ``jax.default_backend`` (VERDICT r3 weak #7): sharded
    FFT operands trip the CPU fft_thunk layout RET_CHECK, the direct conv
    shards fine on either backend.
    """
    mode = problem.config.direct_spatial
    if mode == "auto":
        mode = "direct" if jax.default_backend() == "tpu" else "fft"
    fn = cv.apply_fsf_direct if mode == "direct" else cv.apply_fsf
    return fn(r, bank)


def apply_KT(problem, r):
    """Kᵀ r for K = S∘M (spectral LSF, then per-λ spatial FSF).

    Kᵀ = Mᵀ ∘ Sᵀ: the spatial adjoint is 'same' convolution with the
    spatially flipped FSF (exact for the zero-padded 'same' semantics and
    odd kernels), and Mᵀ is the transposed LSF band.
    """
    from .. import sampler as sm

    s_adj = _spatial(problem, r, problem.fsf[:, ::-1, ::-1])
    return jnp.moveaxis(
        sm._lsf_apply_T_lastaxis(jnp.moveaxis(s_adj, 0, -1), problem.lsf),
        -1, 0,
    )


def _free_mask(problem):
    """[1, Y, X] mask of sampled (valid-spaxel) voxels."""
    p = problem
    return p.valid[: p.Y, : p.X].astype(p.config.dtype)[None]


def _w_in(problem):
    p = problem
    h = p.f // 2
    return p.w_pad[:, h : h + p.Y, h : h + p.X]


def _tau(problem, override=None) -> float:
    """Resolved ridge-prior precision (config default, explicit override).

    A static Python float — it bakes into the jitted program (a changed τ
    recompiles, like any RunConfig knob).
    """
    t = problem.config.prior_precision if override is None else override
    if isinstance(t, str):
        if t == "auto":
            # make_problem resolves "auto" to a float; an unresolved value
            # here means a hand-built config bypassed it
            return suggest_prior_precision(problem)
        raise ValueError(f"prior_precision must be a float or 'auto', got "
                         f"{t!r}")
    t = float(t)
    if t < 0:
        raise ValueError(f"prior_precision must be >= 0, got {t}")
    return t


#: τ/w̄ ratio used by ``suggest_prior_precision`` / ``prior_precision="auto"``
AUTO_PRIOR_REL = 1e-4

#: default M-side ridge ratio τ_m/w̄ of the Fourier preconditioners
#: (``RunConfig.direct_precond_tau='auto'``).  Measured dead zone below
#: 1e-2: with τ_m = τ_A = 1e-3·w̄ the exact banded preconditioner STALLS
#: CG at geometry-fragile sizes (rel 8e-2 plateau; 2026-08-21 study in
#: the RunConfig.direct_precond_tau docstring) because it faithfully
#: inverts periodic-model near-null modes whose true-operator
#: counterparts differ at the field boundary; 1e-2 converges in 98
#: iterations there and costs ~25 extra iterations where τ_m = τ_A also
#: converged.
PRECOND_TAU_REL = 1e-2


def _precond_tau(problem, tau: float) -> float:
    """Resolved M-side ridge τ_m ≥ τ (see ``PRECOND_TAU_REL``).

    Only the PRECONDITIONER is built with τ_m; the operator A keeps the
    model ridge τ, so the sampled posterior/MAP solution is unchanged —
    τ_m trades a few extra CG iterations for a bounded M⁻¹ gain on the
    modes the periodic model gets wrong.

    FLAT-PRIOR (τ = 0) solves keep τ_m = 0 (the legacy 1e-8-relative
    internal ridge only): with a singular-direction-free stop test the
    near-exact preconditioner is what polishes the near-null solution
    components to the dense-oracle level the toy tests pin, and the
    flat-prior full-field stall is a recorded property of that model
    either way.  The gain cap is a RIDGE-path fix: there σ_min = τ
    bounds the solution error per unit residual, so capping M's gain
    costs iterations, never accuracy.
    """
    if tau <= 0:
        return tau
    t = getattr(problem.config, "direct_precond_tau", "auto")
    if isinstance(t, str):
        if t != "auto":
            raise ValueError(
                f"direct_precond_tau must be a float or 'auto', got {t!r}")
        # make_problem resolves 'auto' to a float; reaching here means a
        # hand-built config bypassed it — fall back to the mean weight,
        # which requires concrete (untraced) problem arrays.
        w = np.asarray(_w_in(problem) * _free_mask(problem), np.float32)
        wbar = float(w.sum() / max((w > 0).sum(), 1))
        return max(tau, PRECOND_TAU_REL * wbar)
    return max(tau, float(t))


def suggest_prior_precision(problem, rel: float = AUTO_PRIOR_REL) -> float:
    """Heuristic ridge strength  τ = rel · w̄  for direct draws / MAP solves.

    The flat-prior normal operator KᵀWK is near-singular along blur-null
    modes, and CG convergence is governed by τ relative to the MEAN WEIGHT
    w̄ = mean(1/σ²) over unmasked voxels — the overall scale of A's
    spectrum (the DC eigenvalue of the periodic model is ≈ w̄ for
    sum-normalised kernels).  Measured (2026-08-18, f32, tol=1e-6):

      MUSE-blur 24×24×64 toy (footprint ≈ field, w̄ = 400):
        τ/w̄ = 0     STALL (rel 1.2e-3 @ 1500 iters)
        τ/w̄ = 1e-6  1211 iters        τ/w̄ = 1e-5  656 iters
        τ/w̄ = 1e-4   254 iters        τ/w̄ = 1e-3   88 iters
      full MUSE field 300×300×3681 (w̄ = 1):
        τ = 0 STALL (rel 0.60 @ 600); τ/w̄ = 1e-3 → 75 iters
        (FULLFIELD_r03_direct.json).

    The default rel = 1e-4 makes the prior σ per voxel = (rel·w̄)^-1/2
    = 100 × the noise σ — bounding only amplitudes the data cannot see —
    while keeping hard-regime solves at a few hundred iterations.  τ > 0
    is a MODEL choice (a proper Gaussian prior): report it with results
    and check sensitivity by re-running at rel/10.
    """
    if rel <= 0:
        raise ValueError(f"rel must be > 0, got {rel}")
    w = _w_in(problem) * _free_mask(problem)
    n = jnp.maximum(jnp.sum((w > 0).astype(jnp.float32)), 1.0)
    return float(rel * jnp.sum(w.astype(jnp.float32)) / n)


def make_normal_operator(problem, prior_precision=None):
    """A(c) = P (Kᵀ W K + τ I) P c on the free subspace.

    τ = 0 (default) is the reference's flat prior; τ > 0 adds the Gaussian
    ridge prior c ~ N(0, τ⁻¹I) that keeps A well-conditioned under heavy
    blur (RunConfig.prior_precision).
    """
    w = _w_in(problem)
    free = _free_mask(problem)
    tau = _tau(problem, prior_precision)

    def A(c):
        kc = apply_K(problem, c * free)
        out = apply_KT(problem, kc * w)
        if tau > 0:
            out = out + tau * c
        return out * free

    return A


# ---------------------------------------------------------------------------
# Fourier-banded preconditioner
# ---------------------------------------------------------------------------

# dense per-frequency band tables above this size auto-switch to the
# radially-binned variant (full MUSE field: ~10 GB dense vs ~56 MB binned)
BANDED_BYTES_BUDGET = 2 * 2**30
#: radial bins of the binned preconditioner
N_RADIAL_BINS = 256


def _resolve_precond_mode(problem, mode: str | None = None) -> str:
    """Resolve the effective preconditioner mode (incl. the size
    auto-switch of 'banded' → 'banded_radial' above BANDED_BYTES_BUDGET)."""
    p = problem
    if mode is None:
        mode = p.config.direct_precond
    if mode == "banded":
        itemsize = np.dtype(p.config.dtype).itemsize  # f64 tables are 2×
        lw = int(p.lsf.shape[1])
        dense_bytes = p.Y * (p.X // 2 + 1) * p.L * lw * itemsize
        if dense_bytes > BANDED_BYTES_BUDGET:
            import logging

            logging.getLogger("deconv3d_tpu").info(
                "dense banded preconditioner would need %.1f GB — using "
                "the radially-binned variant (%d bins)",
                dense_bytes / 2**30, _radial_bins(p),
            )
            mode = "banded_radial"
    if mode not in ("banded", "banded_radial", "jacobi"):
        raise ValueError(f"unknown direct_precond {mode!r}")
    return mode


def _radial_bins(problem) -> int:
    """Resolved |k|-bin count of the radial preconditioner (config knob)."""
    n = int(getattr(problem.config, "direct_radial_bins", N_RADIAL_BINS))
    if n < 1:  # make_problem validates; guard hand-built configs too
        raise ValueError(f"direct_radial_bins must be >= 1, got {n}")
    return n


def _diag_scale_map(problem, tau: float) -> jax.Array:
    """Boundary/mask-aware symmetric scaling map s[1, Y, X] (VERDICT r3
    next #7 attempt).

    The Fourier preconditioner models W as the scalar w̄ on a periodic
    domain; near field boundaries and masked regions the true diagonal of
    A is smaller (less kernel mass lands on data), which is the documented
    mismatch source.  Writing  A ≈ D^{1/2} C D^{1/2}  with C the circulant
    model and D = diag(A)/diag(C) gives  M⁻¹ = s ⊙ C⁻¹(s ⊙ ·)  with
    s = √(diag(C)/diag(A)) — SPD by construction.  The λ-structure of the
    ratio is weak (the FSF footprint drifts slowly), so s is collapsed to
    its λ-mean [Y, X] map: two elementwise multiplies per application and
    0.4 MB of state instead of a 1.3 GB cube at full field.
    """
    p = problem
    w = _w_in(p)
    dtype = p.config.dtype
    wbar = jnp.sum(w) / jnp.maximum(jnp.sum(w > 0), 1.0)
    # local effective quadratic weight per (y, x): λ-mean of Σab F²·w
    quad_local = jnp.mean(
        _spatial(p, w, p.fsf[:, ::-1, ::-1] ** 2), axis=0
    )                                                        # [Y, X]
    quad_circ = wbar * jnp.mean(jnp.sum(p.fsf ** 2, axis=(1, 2)))
    ratio = (quad_circ + tau) / jnp.maximum(quad_local + tau, 1e-30)
    # interior: ratio ≈ 1; boundary/mask: ratio > 1.  Clip the dead-spaxel
    # blow-up (those voxels are zeroed by the free mask anyway).
    s = jnp.sqrt(jnp.clip(ratio, 1.0, 32.0)).astype(dtype)
    return s[None]


def _precond_state(problem, mode: str, tau: float):
    """Device constants of M⁻¹ for a RESOLVED mode (a small pytree).

    Split from the application (``_precond_apply``) so the host-loop PCG
    can build the state in one jitted program and pass it as an ARGUMENT
    to the per-iteration step program — captured device constants either
    bloat the step's constant folding or (for cube-size tables) its temp
    footprint.

    With ``direct_precond_scale`` set (Fourier modes only) the state is a
    ``(core, s_map)`` tuple — see :func:`_diag_scale_map`.
    """
    p = problem
    w = _w_in(p)
    if mode == "jacobi":
        # diag(A)[λ0,y,x] = Σ_μ M[μ,λ0]² (Σ_ab F[μ,a,b]² w[μ, y~, x~])
        # ≈ qvox; the cheap structure-free fallback.
        quad_like = _spatial(p, w, p.fsf[:, ::-1, ::-1] ** 2)
        diag = banded.precision_diag(p.lsf, quad_like) + tau
        return jnp.where(diag > 0, 1.0 / jnp.maximum(diag, 1e-30), 0.0)
    if mode == "banded_radial":
        core = _radial_state(p, tau, n_bins=_radial_bins(p))
        if getattr(p.config, "direct_precond_scale", False):
            return (core, _diag_scale_map(p, tau))
        return core
    Y, X = p.Y, p.X
    dtype = p.config.dtype
    wbar = jnp.sum(w) / jnp.maximum(jnp.sum(w > 0), 1.0)
    fhat = jnp.fft.rfft2(p.fsf.astype(dtype), s=(Y, X))        # [L, Y, Xr]
    power = (jnp.abs(fhat) ** 2).astype(dtype) * wbar
    q = jnp.moveaxis(power, 0, -1)                   # [Y, Xr, L]
    bands = banded.precision_bands(p.lsf, q)         # [Y, Xr, L, lw]
    # ridge: keeps near-null frequencies factorisable; scaled to the
    # problem's stiffest diagonal so it never dominates a live mode
    ridge = 1e-8 * jnp.max(bands[..., 0])
    bands = bands.at[..., 0].add(ridge + tau)
    core = banded.cholesky_banded(bands)             # [Y, Xr, L, lw]
    if getattr(p.config, "direct_precond_scale", False):
        return (core, _diag_scale_map(p, tau))
    return core


#: module-level jitted state builder: segmented runs (Run.run with
#: segments, run_until) rebuild pstate once per segment — a fresh
#: jax.jit(lambda) there would retrace + re-execute the radial/banded
#: factorisation program every segment instead of hitting this cache.
_precond_state_jit = functools.partial(
    jax.jit, static_argnums=(1, 2)
)(_precond_state)


def _precond_apply(problem, mode: str, state, r):
    """Apply M⁻¹ given its precomputed ``state`` (see ``_precond_state``)."""
    p = problem
    free = _free_mask(p)
    if mode == "jacobi":
        return r * state * free
    if isinstance(state, tuple):                  # direct_precond_scale
        core, s_map = state
        return s_map * _precond_apply(p, mode, core, s_map * r)
    if mode == "banded_radial":
        return _radial_apply(p, state, r, n_bins=_radial_bins(p))
    R = state
    Y, X = p.Y, p.X
    dtype = p.config.dtype

    def solve_k(rhs):                                # [Y, Xr, L] real
        z = banded.solve_transposed_banded(R, rhs)
        return banded.solve_banded(R, z)

    rf = jnp.fft.rfft2(r.astype(dtype))              # [L, Y, Xr] complex
    rf = jnp.moveaxis(rf, 0, -1)                     # [Y, Xr, L]
    out = solve_k(jnp.real(rf)) + 1j * solve_k(jnp.imag(rf))
    out = jnp.fft.irfft2(jnp.moveaxis(out, -1, 0), s=(Y, X))
    return out.astype(r.dtype) * free


def make_preconditioner(problem, mode: str | None = None,
                        prior_precision=None):
    """M⁻¹ ≈ A⁻¹: per-spatial-frequency banded solves (or Jacobi).

    'banded': Λ_k = w̄·Mᵀ diag(|F̂_k|²) M per rfft2 frequency of the (Y, X)
    grid, banded-Cholesky factorised once; auto-switches to
    'banded_radial' above BANDED_BYTES_BUDGET.  'banded_radial': one
    factor per |k| bin (module docstring).  'jacobi': diag(A) ≈ per-voxel
    qvox-style diagonal.  Returns a callable r -> M⁻¹ r.

    A ridge prior τ (RunConfig.prior_precision / the explicit override)
    enters every mode exactly: +τ on the λ-band diagonal (the prior is
    diagonal in ANY orthonormal basis, so the Fourier-space Λ_k gains
    exactly +τI) / +τ on the Jacobi diagonal.
    """
    p = problem
    mode = _resolve_precond_mode(p, mode)
    tau = _tau(p, prior_precision)
    state = _precond_state(p, mode, _precond_tau(p, tau))
    return lambda r: _precond_apply(p, mode, state, r)


@functools.lru_cache(maxsize=32)
def _radial_layout(Y: int, X: int, n_bins: int):
    """Host-static layout of the radial binning: equal-count quantile bins
    on |k|² and the sorted-slot permutation (see ``_radial_state``).

    Depends only on the grid shape — cached so the state builder and the
    apply factory (which may live in different jit programs) agree without
    recomputation.  Returns numpy arrays (static constants when traced).
    """
    Xr = X // 2 + 1
    K = Y * Xr
    B = min(n_bins, K)
    M = -(-K // B)
    ky = np.fft.fftfreq(Y)
    kx = np.fft.rfftfreq(X)
    r2 = (ky[:, None] ** 2 + kx[None, :] ** 2).ravel()
    order_np = np.argsort(r2, kind="stable")
    bin_np = np.empty(K, np.int64)
    bin_np[order_np] = np.arange(K, dtype=np.int64) * B // K
    counts = np.bincount(bin_np, minlength=B).astype(np.float64)
    # sorted layout: row j of bin b sits at slot b·M + j; pad slots point
    # at a dead row (index K) that solves garbage and is dropped
    slot_of = np.full(B * M, K, np.int64)        # sorted-slot <- k index
    fill = np.zeros(B, np.int64)
    for pos, k in enumerate(order_np):
        b = bin_np[k]
        slot_of[b * M + fill[b]] = k
        fill[b] += 1
    inv = np.empty(K, np.int64)
    for s, k in enumerate(slot_of):
        if k < K:
            inv[k] = s
    return (
        B, M,
        bin_np.astype(np.int32), counts,
        slot_of.astype(np.int32), inv.astype(np.int32),
    )


def _radial_state(problem, tau: float, n_bins: int = N_RADIAL_BINS):
    """Per-|k|-bin banded Cholesky factors [B, 1, L, lw] (≈56 MB full field).

    Each bin's Λ uses the bin-MEAN spectral power, accumulated λ-chunked so
    the full [L, Y, Xr] power cube is never materialised.
    """
    p = problem
    Y, X, L = p.Y, p.X, p.L
    dtype = p.config.dtype
    w = _w_in(p)
    B, M, bin_np, counts_np, _, _ = _radial_layout(Y, X, n_bins)
    bin_idx = jnp.asarray(bin_np)
    counts = jnp.asarray(counts_np, dtype)
    K = Y * (X // 2 + 1)

    wbar = jnp.sum(w) / jnp.maximum(jnp.sum(w > 0), 1.0)
    chunk = 256
    parts = []
    for lo in range(0, L, chunk):
        f_c = p.fsf[lo : lo + chunk].astype(dtype)
        power = jnp.abs(jnp.fft.rfft2(f_c, s=(Y, X))) ** 2   # [Lc, Y, Xr]
        power = power.reshape(power.shape[0], K)
        parts.append(
            jax.ops.segment_sum(power.T, bin_idx, num_segments=B)
        )                                                    # [B, Lc]
    q_bin = jnp.concatenate(parts, axis=1) / counts[:, None] * wbar

    bands = banded.precision_bands(p.lsf, q_bin)             # [B, L, lw]
    ridge = 1e-8 * jnp.max(bands[..., 0])
    bands = bands.at[..., 0].add(ridge + tau)
    return banded.cholesky_banded(bands)[:, None]            # [B, 1, L, lw]


#: λ-planes per chunk of the memory-lean radial application; also the
#: cube-bytes threshold above which it replaces the single-shot layout
RADIAL_CHUNK_L = 256
RADIAL_CHUNK_BYTES = 2**28


def _radial_apply(problem, R_bin, r, n_bins: int = N_RADIAL_BINS):
    """Radially-binned Fourier-banded M⁻¹ application, gather-free.

    Frequencies are EQUAL-COUNT quantile-binned on |k|², so sorting them by
    bin (a static permutation) makes every bin the same size M = ⌈K/B⌉
    (pad rows for the remainder): the per-frequency solves then run as the
    ordinary batched banded solves on [B, M, L] against ``R_bin[:, None]``
    — pure broadcasting, no per-λ-step gathers (dynamic gathers serialize
    on the TPU scalar core; the gather formulation measured minutes per
    iteration).

    Above ``RADIAL_CHUNK_BYTES`` per cube the memory-lean layout runs
    instead: the rfft2/transpose stages stream λ-chunks into two [B·M, L]
    sorted-layout buffers (never materialising the full complex cube or
    its moveaxis copy), and the banded solves run per bin-GROUP with
    in-place row updates — measured difference at the full MUSE field:
    the single-shot layout's ~4 cube-size transients OOM'd the product
    draw path; this one fits.
    """
    p = problem
    Y, X, L = p.Y, p.X, p.L
    dtype = p.config.dtype
    free = _free_mask(p)
    B, M, _, _, slot_of, inv = _radial_layout(Y, X, n_bins)
    take_sorted = jnp.asarray(slot_of)                       # [B·M]
    take_back = jnp.asarray(inv)                             # [K]
    Xr = X // 2 + 1
    K = Y * Xr

    # Real and imaginary parts ride ONE batched solve pair, concatenated
    # along the bin-row axis ([B, 2M, L] — R_bin [B, 1, L, lw] broadcasts
    # over it): the triangular solves are lax.scans over L whose per-step
    # work is far below the VPU's width, so the stage cost is scan-step
    # LATENCY × step count — halving the scan count (4 → 2 per
    # application) nearly halves the preconditioner stage.
    def solve_pair(re, im):                                  # [K, L] ×2
        def pack(rhs):
            return jnp.take(rhs, take_sorted, axis=0,
                            mode="fill", fill_value=0).reshape(B, M, L)
        padded = jnp.concatenate([pack(re), pack(im)], axis=1)
        z = banded.solve_transposed_banded(R_bin, padded)
        out = banded.solve_banded(R_bin, z)
        return (out[:, :M].reshape(B * M, L)[take_back],
                out[:, M:].reshape(B * M, L)[take_back])

    if L * Y * X * np.dtype(dtype).itemsize <= RADIAL_CHUNK_BYTES:
        rf = jnp.fft.rfft2(r.astype(dtype))                  # [L, Y, Xr]
        rs = jnp.moveaxis(rf, 0, -1).reshape(K, L)
        o_re, o_im = solve_pair(jnp.real(rs), jnp.imag(rs))
        out = o_re + 1j * o_im
        out = jnp.moveaxis(out.reshape(Y, Xr, L), -1, 0)
        out = jnp.fft.irfft2(out, s=(Y, X))
        return out.astype(r.dtype) * free

    # ---- memory-lean layout (full-field scale) ---------------------------
    # Same permutation count as the single-shot layout (one gather to the
    # sorted layout and one back, per real/imag part); the monolithic
    # complex cube + moveaxis copies are replaced by λ-chunked FFTs with
    # CONTIGUOUS column writes.  (A first cut scattered every chunk via
    # .at[take_back].set — 45k-row scatters per chunk measured ~6.3 s per
    # CG iteration vs 0.6 s for this layout.)
    # Transient budget (ADVICE r4): solve_pair itself holds BOTH parts at
    # once — padded/z/out are each [B, 2M, L] ≈ 1.1 cube-size (B·2M ≈
    # 2·Y·Xr rows), so the paired solve peaks at ~3.3 cube-equivalents on
    # top of the two [K, L] standing buffers.  That is the measured-fitting
    # budget at 300×300×3681 (FULLFIELD_r04_direct.json: converged draws);
    # do NOT assume the old one-part-at-a-time headroom when adding
    # buffers here — the pairing traded that headroom for halving the
    # latency-bound scan count (see solve_pair comment above).
    chunk = RADIAL_CHUNK_L
    rs_re = jnp.zeros((K, L), dtype)
    rs_im = jnp.zeros((K, L), dtype)
    for lo in range(0, L, chunk):
        hi = min(lo + chunk, L)
        rf = jnp.fft.rfft2(r[lo:hi].astype(dtype))           # [lc, Y, Xr]
        rf = rf.reshape(hi - lo, K).T                        # [K, lc]
        rs_re = rs_re.at[:, lo:hi].set(jnp.real(rf))
        rs_im = rs_im.at[:, lo:hi].set(jnp.imag(rf))

    rs_re, rs_im = solve_pair(rs_re, rs_im)

    # λ-chunked inverse FFTs into the output cube (contiguous column reads)
    out_cube = jnp.zeros((L, Y, X), r.dtype)
    for lo in range(0, L, chunk):
        hi = min(lo + chunk, L)
        rows = rs_re[:, lo:hi] + 1j * rs_im[:, lo:hi]        # [K, lc]
        plane = rows.T.reshape(hi - lo, Y, Xr)
        out_cube = out_cube.at[lo:hi].set(
            jnp.fft.irfft2(plane, s=(Y, X)).astype(r.dtype)
        )
    return out_cube * free


# ---------------------------------------------------------------------------
# PCG (vmap-safe: masked updates after convergence)
# ---------------------------------------------------------------------------

class PCGResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array
    rel_residual: jax.Array


def pcg(A, Minv, b, tol: float, maxiter: int) -> PCGResult:
    """Preconditioned CG for SPD A; runs under jit/vmap (masked updates).

    The carry holds only (x, r, p) cube-size vectors — z is recomputed in
    the body (one Minv per iteration either way).  At full-MUSE-field size
    every carried cube is 1.3 GB and the loop body's peak (carry + the
    operator/preconditioner temporaries) is what has to fit HBM.
    """
    dtype = b.dtype
    bnorm = jnp.sqrt(jnp.sum(b * b, dtype=jnp.float64 if dtype == jnp.float64
                             else jnp.float32))
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = Minv(r0)
    rz0 = jnp.sum(r0 * z0)

    def cond(s):
        x, r, pvec, rz, it = s
        rnorm = jnp.sqrt(jnp.sum(r * r))
        return (it < maxiter) & (rnorm > tol * jnp.maximum(bnorm, 1e-30))

    def body(s):
        x, r, pvec, rz, it = s
        done = jnp.sqrt(jnp.sum(r * r)) <= tol * jnp.maximum(bnorm, 1e-30)
        Ap = A(pvec)
        denom = jnp.sum(pvec * Ap)
        alpha = jnp.where(done | (denom <= 0), 0.0, rz / jnp.maximum(denom, 1e-30))
        x = x + alpha * pvec
        r = r - alpha * Ap
        z = Minv(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(done | (rz <= 0), 0.0, rz_new / jnp.maximum(rz, 1e-30))
        pvec = z + beta * pvec
        return (x, r, pvec, jnp.where(done, rz, rz_new),
                it + jnp.where(done, 0, 1))

    x, r, _, _, it = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.zeros((), jnp.int32))
    )
    rel = jnp.sqrt(jnp.sum(r * r)) / jnp.maximum(bnorm, 1e-30)
    return PCGResult(x=x, iterations=it, rel_residual=rel)


# ---------------------------------------------------------------------------
# Host-loop PCG (memory-lean: full-field geometry on one chip)
# ---------------------------------------------------------------------------

#: (weakref(problem), init/step programs) keyed by (id, mode, tau) — the
#: step program compiles once per problem and is reused across draws.
_HOST_PCG_CACHE: dict = {}


def _host_pcg_programs(problem, mode: str, tau: float):
    """Jitted (init, step) programs for ``pcg_host`` (cached per problem).

    The step's cube-size carries (x, r, p) are DONATED, so XLA updates
    them in place: peak device memory is carries + ONE iteration's
    transients.  The monolithic jitted ``pcg`` while_loop program measured
    18.2 GB total at full MUSE field (300×300×3681: 11.5 cube-size temps
    + arguments + output — memory_analysis, 2026-08-18) and OOMs the
    chip's ~15 GiB usable HBM; this layout fits with headroom.  The cost
    is one host sync per iteration — measured to be FREE through the
    tunnel's pipelining: a masked 8-iteration-per-dispatch chunk variant
    (lax.fori_loop body identical to ``pcg``) timed 65.3/57.9 s per
    full-field draw vs 61.0 s for this loop (same 75 iterations, same
    seed — within the ±7% run-to-run noise), so it was removed
    (2026-08-18; do not re-derive).
    """
    from ..parallel.cache import evict_dead

    evict_dead(_HOST_PCG_CACHE)
    ckey = (id(problem), mode, tau)
    ent = _HOST_PCG_CACHE.get(ckey)
    if ent is not None and ent[0]() is problem:
        return ent[1], ent[2]

    @functools.partial(jax.jit, donate_argnums=(2,))
    def init(pp, pstate, b):
        # r0 aliases the donated b; z0 doubles as p0
        bnorm = jnp.sqrt(jnp.sum(b * b))
        z0 = _precond_apply(pp, mode, pstate, b)
        rz0 = jnp.sum(b * z0)
        x0 = jnp.zeros_like(b)
        return x0, b, z0, rz0, bnorm

    # The iteration is SPLIT into an A-side and an M-side program with a
    # host boundary between them, never fusing the conv/FFT operator
    # chain and the banded-solve chain into one XLA program.  Reason
    # (2026-08-21, measured): the container's TPU stack MISCOMPILES the
    # combined program at full-field-class sizes — with both chains in
    # one jit at 300×300×800 the step's z=M⁻¹r is silently wrong (rz off
    # by 33%; M applied alone is bit-exact, A applied alone is
    # symmetric to 5e-7) and full-field CG plateaus at rel~0.1 where the
    # same code converged in 75 iterations on the 2026-08-20 stack.
    # Split programs restore column-exact convergence; the extra host
    # sync per iteration is the host-loop's existing (measured-free)
    # dispatch pattern.

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step_a(pp, x, r, pvec, rz):
        A = make_normal_operator(pp, tau)
        Ap = A(pvec)
        denom = jnp.sum(pvec * Ap)
        alpha = jnp.where(denom <= 0, 0.0, rz / jnp.maximum(denom, 1e-30))
        x = x + alpha * pvec
        r = r - alpha * Ap
        rnorm = jnp.sqrt(jnp.sum(r * r))
        return x, r, rnorm

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step_b(pp, pstate, r, pvec, rz):
        z = _precond_apply(pp, mode, pstate, r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz <= 0, 0.0, rz_new / jnp.maximum(rz, 1e-30))
        pvec = z + beta * pvec
        return pvec, rz_new

    def step(pp, pstate, x, r, pvec, rz):
        x, r, rnorm = step_a(pp, x, r, pvec, rz)
        pvec, rz_new = step_b(pp, pstate, r, pvec, rz)
        return x, r, pvec, rz_new, rnorm

    _HOST_PCG_CACHE[ckey] = (weakref.ref(problem), init, step)
    return init, step


def pcg_host(problem, b, tol: float, maxiter: int,
             mode: str | None = None, prior_precision=None,
             pstate=None) -> PCGResult:
    """PCG as a host-level loop over a donated-carry jitted step.

    Same arithmetic per iteration as ``pcg`` (update order identical; the
    convergence test runs on host instead of in ``lax.while_loop``), so
    the two agree to float-reduction tolerance — but the peak HBM is
    carries + one iteration's transients, which is what lets a full MUSE
    field solve on a single 16 GB chip.  Not jittable (host control
    flow); the jitted-everything path stays ``pcg``.

    ``pstate``: optional precomputed ``_precond_state`` (reused across the
    draws of one run); built here (jitted) when None.
    """
    p = problem
    mode = _resolve_precond_mode(p, mode)
    tau = _tau(p, prior_precision)
    init, step = _host_pcg_programs(p, mode, tau)
    if pstate is None:
        pstate = _precond_state_jit(p, mode, _precond_tau(p, tau))
    x, r, pvec, rz, bnorm = init(p, pstate, b)
    bfloor = max(float(bnorm), 1e-30)
    it = 0
    rnorm = float(bnorm)  # r0 = b exactly
    while it < maxiter and rnorm > tol * bfloor:
        x, r, pvec, rz, rnorm_dev = step(p, pstate, x, r, pvec, rz)
        rnorm = float(rnorm_dev)
        it += 1
    return PCGResult(
        x=x,
        iterations=jnp.asarray(it, jnp.int32),
        rel_residual=jnp.asarray(rnorm / bfloor, x.dtype),
    )


#: batched twin of _HOST_PCG_CACHE (separate: the two step programs have
#: different shapes and donation layouts)
_HOST_PCG_BATCH_CACHE: dict = {}


def _host_pcg_programs_batched(problem, mode: str, tau: float):
    """Jitted (init, step) programs for ``pcg_host_batch``: K RHS columns
    ride one step program with the SAME per-iteration arithmetic as
    ``pcg``'s masked body (converged columns freeze; active ones update).

    Why batch: the mid-size study (BATCHED_DIRECT_r05.json, 120×120×600)
    measured 1.17×/1.24× per-draw speedup at K=2/4 — the banded
    triangular solves are lax.scans over L whose per-step work sits below
    the VPU width (latency-bound), so K columns share one scan nearly
    free.  Memory: carries are 3·K cubes + batched transients; at full
    MUSE field K=2 is the HBM ceiling candidate — measured by
    ``benchmarks/fullfield_direct.py --batch``.
    """
    from ..parallel.cache import evict_dead

    evict_dead(_HOST_PCG_BATCH_CACHE)
    ckey = (id(problem), mode, tau)
    ent = _HOST_PCG_BATCH_CACHE.get(ckey)
    if ent is not None and ent[0]() is problem:
        return ent[1], ent[2]

    @functools.partial(jax.jit, donate_argnums=(2,))
    def init(pp, pstate, b):                       # b: [K, L, Y, X]
        bnorm = jnp.sqrt(jnp.sum(b * b, axis=(1, 2, 3)))        # [K]
        z0 = jax.vmap(lambda rr: _precond_apply(pp, mode, pstate, rr))(b)
        rz0 = jnp.sum(b * z0, axis=(1, 2, 3))                   # [K]
        x0 = jnp.zeros_like(b)
        return x0, b, z0, rz0, bnorm

    # A-side / M-side split with a host boundary, mirroring
    # _host_pcg_programs: the 2026-08-21 stack miscompiles programs that
    # fuse the operator chain and the banded-solve chain (see the comment
    # there) — and the batched step would otherwise also carry K parallel
    # M-chains in one program, the other measured-miscompiling shape.

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def step_a(pp, x, r, pvec, rz, active):
        # active: [K] bool — a frozen column keeps x/r/pvec/rz verbatim
        # (alpha=beta=0 path, identical to pcg's masked body)
        A = make_normal_operator(pp, tau)
        Ap = jax.vmap(A)(pvec)
        denom = jnp.sum(pvec * Ap, axis=(1, 2, 3))              # [K]
        ok = active & (denom > 0)
        alpha = jnp.where(ok, rz / jnp.maximum(denom, 1e-30), 0.0)
        a4 = alpha[:, None, None, None]
        x = x + a4 * pvec
        r = r - a4 * Ap
        rnorm = jnp.sqrt(jnp.sum(r * r, axis=(1, 2, 3)))
        return x, r, rnorm

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step_b(pp, pstate, r, pvec, rz, active):
        z = jax.vmap(lambda rr: _precond_apply(pp, mode, pstate, rr))(r)
        rz_new = jnp.sum(r * z, axis=(1, 2, 3))
        okb = active & (rz > 0)
        beta = jnp.where(okb, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        pvec = jnp.where(active[:, None, None, None],
                         z + beta[:, None, None, None] * pvec, pvec)
        return pvec, jnp.where(active, rz_new, rz)

    def step(pp, pstate, x, r, pvec, rz, active):
        x, r, rnorm = step_a(pp, x, r, pvec, rz, active)
        pvec, rz_new = step_b(pp, pstate, r, pvec, rz, active)
        return x, r, pvec, rz_new, rnorm

    _HOST_PCG_BATCH_CACHE[ckey] = (weakref.ref(problem), init, step)
    return init, step


def pcg_host_batch(problem, bs, tol: float, maxiter: int,
                   mode: str | None = None, prior_precision=None,
                   pstate=None) -> PCGResult:
    """K-RHS batched ``pcg_host``: one host loop drives K columns with
    per-column masked updates (total iterations = max over columns — for
    iid draws of one operator the columns converge together, so the
    shared-scan amortisation is pure win where it fits HBM).

    Per-column results match ``pcg_host`` to float-reduction tolerance
    (same update order; tests/test_direct.py equality case).  Returns a
    PCGResult with a leading batch axis on every field.
    """
    p = problem
    mode = _resolve_precond_mode(p, mode)
    tau = _tau(p, prior_precision)
    init, step = _host_pcg_programs_batched(p, mode, tau)
    if pstate is None:
        pstate = _precond_state_jit(p, mode, _precond_tau(p, tau))
    x, r, pvec, rz, bnorm = init(p, pstate, bs)
    K = int(bnorm.shape[0])
    bfloor = np.maximum(np.asarray(bnorm, np.float64), 1e-30)
    rnorm = np.asarray(bnorm, np.float64).copy()   # r0 = b exactly
    iters = np.zeros(K, np.int64)
    it = 0
    while it < maxiter and bool((rnorm > tol * bfloor).any()):
        active = jnp.asarray(rnorm > tol * bfloor)
        x, r, pvec, rz, rnorm_dev = step(p, pstate, x, r, pvec, rz, active)
        new_rnorm = np.asarray(rnorm_dev, np.float64)
        act = np.asarray(active)
        iters += act
        # frozen columns keep their converged residual norm
        rnorm = np.where(act, new_rnorm, rnorm)
        it += 1
    return PCGResult(
        x=x,
        iterations=jnp.asarray(iters, jnp.int32),
        rel_residual=jnp.asarray(rnorm / bfloor, x.dtype),
    )


#: the monolithic jitted-PCG program (lax.while_loop) measured ~15
#: cube-size buffers total at the full MUSE field (memory_analysis,
#: 2026-08-18: 11.5 cubes temp + args + output = 18.2 GB — OOMs a 16 GB
#: chip); when that estimate exceeds this budget the host-loop layout
#: (donated carries, ~8 cube-size peak) is selected instead.
PCG_WHILE_BYTES_BUDGET = 6 * 2**30


def _pcg_while_bytes(problem) -> int:
    p = problem
    return 15 * p.L * p.Y * p.X * np.dtype(p.config.dtype).itemsize


# ---------------------------------------------------------------------------
# Posterior draws + the run_sweeps contract
# ---------------------------------------------------------------------------

def posterior_mean(problem, tol=None, maxiter=None,
                   prior_precision=None) -> PCGResult:
    """μ = A⁻¹ Kᵀ W d (the MAP == posterior mean of the Gaussian).

    ``prior_precision`` overrides ``config.prior_precision`` for THIS
    solve — a ridge MAP on a flat-prior (MCMC-configured) problem without
    touching its sampler config (``Run.map_estimate`` passes it through).
    """
    p = problem
    cfg = p.config
    h = p.f // 2
    d = p.data_pad[:, h : h + p.Y, h : h + p.X]
    b = apply_KT(p, d * _w_in(p)) * _free_mask(p)
    return pcg(
        make_normal_operator(p, prior_precision),
        make_preconditioner(p, prior_precision=prior_precision), b,
        cfg.direct_tol if tol is None else tol,
        cfg.direct_maxiter if maxiter is None else maxiter,
    )


@functools.partial(
    jax.jit, static_argnames=("tol", "maxiter", "prior_precision")
)
def posterior_mean_jit(problem, tol=None, maxiter=None, prior_precision=None):
    """Jitted ``posterior_mean`` (stable jit cache across calls).

    Eager execution is not an option on every backend: the preconditioner's
    complex arithmetic (``solve_k(re) + 1j·solve_k(im)``) hits UNIMPLEMENTED
    outside jit on the axon TPU plugin — the facade's MAP path goes through
    here.
    """
    return posterior_mean(problem, tol, maxiter, prior_precision)


@jax.jit
def _b_mean(problem):
    """b = Kᵀ W d on the free subspace (the MAP right-hand side)."""
    p = problem
    h = p.f // 2
    d = p.data_pad[:, h : h + p.Y, h : h + p.X]
    return apply_KT(p, d * _w_in(p)) * _free_mask(p)


def posterior_mean_host(problem, tol=None, maxiter=None,
                        prior_precision=None) -> PCGResult:
    """``posterior_mean`` via the host-loop PCG (full-field scale)."""
    cfg = problem.config
    return pcg_host(
        problem, _b_mean(problem),
        cfg.direct_tol if tol is None else tol,
        cfg.direct_maxiter if maxiter is None else maxiter,
        prior_precision=prior_precision,
    )


def posterior_mean_auto(problem, tol=None, maxiter=None,
                        prior_precision=None) -> PCGResult:
    """MAP solve with the memory-appropriate PCG layout.

    Small problems jit the whole solve (``posterior_mean_jit``); above
    ``PCG_WHILE_BYTES_BUDGET`` the monolithic program cannot fit HBM and
    the host-loop layout runs instead (identical arithmetic per
    iteration).
    """
    if _pcg_while_bytes(problem) > PCG_WHILE_BYTES_BUDGET:
        return posterior_mean_host(problem, tol, maxiter, prior_precision)
    return posterior_mean_jit(
        problem, tol=tol, maxiter=maxiter, prior_precision=prior_precision
    )


def _one_draw(problem, key, A, Minv):
    p = problem
    cfg = p.config
    h = p.f // 2
    w = _w_in(p)
    d = p.data_pad[:, h : h + p.Y, h : h + p.X]
    tau = _tau(p)
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, d.shape, dtype=cfg.dtype)
    b = apply_KT(p, d * w + jnp.sqrt(w) * z) * _free_mask(p)
    if tau > 0:
        # perturb the prior too:  Cov(b) = KᵀWK + τI = A_τ  ⇒  A_τ⁻¹b is an
        # exact draw from the proper posterior N(A_τ⁻¹KᵀWd, A_τ⁻¹).
        z2 = jax.random.normal(k2, d.shape, dtype=cfg.dtype)
        b = b + jnp.sqrt(tau) * z2 * _free_mask(p)
    return pcg(A, Minv, b, cfg.direct_tol, cfg.direct_maxiter)


def direct_run_sweeps(problem, state, n_sweeps: int):
    """run_sweeps drop-in for sampler='direct' (ChainResult contract).

    One "sweep" = one INDEPENDENT posterior draw.  The state threads
    exactly like the MCMC engines (clean = last draw, resid = data − K c
    recomputed from scratch — no incremental drift by construction, so
    the invariant and chi² consistency hold to solver tolerance), which
    keeps checkpoints, segmenting, the Run facade and the chains layer
    working unchanged.
    """
    from .. import sampler as sm

    p = problem
    cfg = p.config
    h = p.f // 2
    A = make_normal_operator(p)
    Minv = make_preconditioner(p)
    validf = p.valid.astype(cfg.dtype)

    idx = state.sweep + jnp.arange(n_sweeps, dtype=jnp.int32)
    burn = cfg.resolved_burn_in()
    keep = jnp.where(
        (idx >= burn) & ((idx - burn) % cfg.keep_one_in == 0), 1.0, 0.0
    ).astype(jnp.float32)
    n_free = (jnp.sum(_free_mask(p)) * p.L).astype(jnp.float32)

    def step(st, xs):
        keep_t, = xs
        key, sub = jax.random.split(st.key)
        res = _one_draw(p, sub, A, Minv)
        c = res.x
        clean = jnp.zeros((p.L, p.Yc, p.Xc), cfg.dtype).at[
            :, : p.Y, : p.X
        ].set(c)
        conv = apply_K(p, c)
        resid = p.data_pad.at[:, h : h + p.Y, h : h + p.X].add(-conv)
        resid = jnp.where(p.w_pad > 0, resid, 0.0)
        chi2 = jnp.sum(resid * resid * p.w_pad, dtype=jnp.float32)
        kc = keep_t.astype(cfg.dtype)
        new = sm.SamplerState(
            clean=clean,
            resid=resid,
            key=key,
            chi2=chi2,
            chi2_comp=jnp.zeros((), jnp.float32),
            log_scale=st.log_scale,
            n_accept=st.n_accept + n_free,
            n_propose=st.n_propose + n_free,
            sum_clean=st.sum_clean + kc * clean,
            sum_sq=(
                st.sum_sq + kc * clean * clean
                if cfg.track_variance else st.sum_sq
            ),
            n_kept=st.n_kept + keep_t,
            sweep=st.sweep + 1,
        )
        trace = (
            chi2,
            # "acceptance": solver convergence flag (1 = converged)
            (res.rel_residual <= cfg.direct_tol).astype(jnp.float32),
            jnp.sum(clean * validf[None], dtype=jnp.float32),
            clean.reshape(-1)[p.monitor_idx],
        )
        return new, trace

    state, (chi2_t, acc_t, flux_t, mon_t) = jax.lax.scan(
        step, state, (keep,)
    )
    return sm.ChainResult(
        state=state, chi2_trace=chi2_t, accept_trace=acc_t,
        flux_trace=flux_t, monitor_trace=mon_t,
    )


# ---------------------------------------------------------------------------
# Host-loop draws (full-field geometry on one chip)
# ---------------------------------------------------------------------------

@jax.jit
def _b_draw(problem, key):
    """Perturbed right-hand side of one draw (bit-identical to the build
    inside ``_one_draw`` — same key splits, same op order)."""
    p = problem
    cfg = p.config
    h = p.f // 2
    w = _w_in(p)
    d = p.data_pad[:, h : h + p.Y, h : h + p.X]
    tau = _tau(p)
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, d.shape, dtype=cfg.dtype)
    b = apply_KT(p, d * w + jnp.sqrt(w) * z) * _free_mask(p)
    if tau > 0:
        z2 = jax.random.normal(k2, d.shape, dtype=cfg.dtype)
        b = b + jnp.sqrt(tau) * z2 * _free_mask(p)
    return b


@functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("keep",))
def _host_draw_update(problem, state, x, parent_key, rel_residual, keep):
    """State/trace bookkeeping of one draw (mirrors the scan body of
    ``direct_run_sweeps``); the old state is DONATED so the cube-size
    accumulators update in place."""
    from .. import sampler as sm

    p = problem
    cfg = p.config
    h = p.f // 2
    clean = jnp.zeros((p.L, p.Yc, p.Xc), cfg.dtype).at[
        :, : p.Y, : p.X
    ].set(x)
    conv = apply_K(p, x)
    resid = p.data_pad.at[:, h : h + p.Y, h : h + p.X].add(-conv)
    resid = jnp.where(p.w_pad > 0, resid, 0.0)
    chi2 = jnp.sum(resid * resid * p.w_pad, dtype=jnp.float32)
    validf = p.valid.astype(cfg.dtype)
    n_free = (jnp.sum(_free_mask(p)) * p.L).astype(jnp.float32)
    kc = jnp.asarray(keep, cfg.dtype)
    new = sm.SamplerState(
        clean=clean,
        resid=resid,
        key=parent_key,
        chi2=chi2,
        chi2_comp=jnp.zeros((), jnp.float32),
        log_scale=state.log_scale,
        n_accept=state.n_accept + n_free,
        n_propose=state.n_propose + n_free,
        sum_clean=state.sum_clean + kc * clean,
        sum_sq=(
            state.sum_sq + kc * clean * clean
            if cfg.track_variance else state.sum_sq
        ),
        n_kept=state.n_kept + jnp.float32(keep),
        sweep=state.sweep + 1,
    )
    trace = (
        chi2,
        (rel_residual <= cfg.direct_tol).astype(jnp.float32),
        jnp.sum(clean * validf[None], dtype=jnp.float32),
        clean.reshape(-1)[p.monitor_idx],
    )
    return new, trace


#: cube size above which the host draw loop runs the LEAN state layout
#: (clean/resid dropped between draws — see ``direct_run_sweeps_host``)
DIRECT_LEAN_BYTES = 2**30


@functools.partial(
    jax.jit, donate_argnums=(1, 2), static_argnames=("keep",)
)
def _lean_draw_update(problem, sum_clean, sum_sq, x, rel_residual, keep):
    """Accumulator/trace bookkeeping of one LEAN-mode draw.

    Unlike ``_host_draw_update`` this never materialises the padded
    ``clean``/``resid`` state cubes: chi² reduces the residual transient
    in the interior frame (w_pad is zero in the pad frame, so the sum is
    the same), the monitors gather straight from the unpadded draw, and
    ``sum_clean`` (donated) updates in place on its interior window.
    """
    p = problem
    cfg = p.config
    h = p.f // 2
    w = _w_in(p)
    d = p.data_pad[:, h : h + p.Y, h : h + p.X]
    conv = apply_K(p, x)
    r = jnp.where(w > 0, d - conv, 0.0)
    chi2 = jnp.sum(r * r * w, dtype=jnp.float32)
    validf = p.valid[: p.Y, : p.X].astype(cfg.dtype)
    flux = jnp.sum(x * validf[None], dtype=jnp.float32)
    # monitor_idx indexes the flattened PADDED clean [L, Yc, Xc]; decompose
    # to (λ, y, x) — monitored voxels are valid spaxels, hence inside (Y, X)
    plane = p.Yc * p.Xc
    lam = p.monitor_idx // plane
    rem = p.monitor_idx % plane
    mon = x[lam, rem // p.Xc, rem % p.Xc]
    kc = jnp.asarray(keep, cfg.dtype)
    sum_clean = sum_clean.at[:, : p.Y, : p.X].add(kc * x)
    if cfg.track_variance:
        sum_sq = sum_sq.at[:, : p.Y, : p.X].add(kc * x * x)
    trace = (
        chi2,
        (rel_residual <= cfg.direct_tol).astype(jnp.float32),
        flux,
        mon,
    )
    return sum_clean, sum_sq, chi2, trace


@jax.jit
def _lean_final_state(problem, x):
    """Padded ``clean``/``resid`` of the segment's LAST draw.

    ``x`` is NOT donated: it feeds two consumers with differently-padded
    output shapes, so XLA cannot alias it anyway (donating only produced
    an unusable-donation warning on-chip).
    """
    p = problem
    h = p.f // 2
    conv = apply_K(p, x)
    resid = p.data_pad.at[:, h : h + p.Y, h : h + p.X].add(-conv)
    resid = jnp.where(p.w_pad > 0, resid, 0.0)
    clean = jnp.zeros((p.L, p.Yc, p.Xc), p.config.dtype).at[
        :, : p.Y, : p.X
    ].set(x)
    return clean, resid


def _maybe_delete(a) -> None:
    """Free a device buffer if ``a`` is a live, deletable jax array."""
    try:
        if isinstance(a, jax.Array) and not a.is_deleted():
            a.delete()
    except Exception:  # tracers, committed-elsewhere arrays: leave alone
        pass


def _lean_run_sweeps_host(problem, state, n_sweeps, mode, pstate):
    """LEAN full-field draw loop: the segment carries ONLY ``sum_clean``
    (+ scalars) between draws.

    Direct draws are independent — the incoming ``clean``/``resid`` are
    never read by the next draw, yet at full MUSE field they pin 2.7 GB of
    HBM while the PCG needs every byte (measured: constants 2.8 + carries
    3.8 + step temps 4.6 GB; the full state on top OOMs the chip).  This
    layout CONSUMES the incoming state's cube buffers (like the donated
    jnp engine path at the same scale — ``_jnp_run_sweeps_donated``) and
    rebuilds ``clean``/``resid`` once from the final draw.  Offloading the
    idle cubes to host instead is ruled out by the measured tunnel
    transfer rate (~0.01 GB/s device→host, 2026-08-18 — minutes per cube).

    ``track_variance=True`` carries a second cube-size accumulator
    (``sum_sq``) through the solves — at full MUSE field that spends the
    remaining headroom; prefer ``track_variance=False`` there.
    """
    from .. import sampler as sm

    p = problem
    cfg = p.config
    burn = cfg.resolved_burn_in()
    sweep0 = int(state.sweep)
    key = state.key
    log_scale = state.log_scale
    n_accept = state.n_accept
    n_propose = state.n_propose
    sum_clean = state.sum_clean
    sum_sq = state.sum_sq
    n_kept = state.n_kept
    n_free = float(np.asarray(
        jnp.sum(_free_mask(p)) * p.L
    ))
    # consume the incoming state (its clean/resid are rebuilt at the end)
    _maybe_delete(state.clean)
    _maybe_delete(state.resid)
    del state

    x = None
    traces = []
    for i in range(n_sweeps):
        idx = sweep0 + i
        keep = 1.0 if (idx >= burn and (idx - burn) % cfg.keep_one_in == 0) \
            else 0.0
        key, sub = jax.random.split(key)
        if x is not None:
            _maybe_delete(x)  # previous draw: consumed by its update already
        b = _b_draw(p, sub)
        res = pcg_host(p, b, cfg.direct_tol, cfg.direct_maxiter,
                       mode=mode, pstate=pstate)
        x = res.x
        sum_clean, sum_sq, chi2, tr = _lean_draw_update(
            p, sum_clean, sum_sq, x, res.rel_residual, keep=keep
        )
        n_accept = n_accept + n_free
        n_propose = n_propose + n_free
        n_kept = n_kept + jnp.float32(keep)
        traces.append(tr)
    clean, resid = _lean_final_state(p, x)
    st = sm.SamplerState(
        clean=clean,
        resid=resid,
        key=key,
        chi2=traces[-1][0],
        chi2_comp=jnp.zeros((), jnp.float32),
        log_scale=log_scale,
        n_accept=jnp.asarray(n_accept, jnp.float32),
        n_propose=jnp.asarray(n_propose, jnp.float32),
        sum_clean=sum_clean,
        sum_sq=sum_sq,
        n_kept=n_kept,
        sweep=jnp.asarray(sweep0 + n_sweeps, jnp.int32),
    )
    chi2_t, acc_t, flux_t, mon_t = (
        jnp.stack([t[j] for t in traces]) for j in range(4)
    )
    return sm.ChainResult(
        state=st, chi2_trace=chi2_t, accept_trace=acc_t,
        flux_trace=flux_t, monitor_trace=mon_t,
    )


def direct_run_sweeps_host(problem, state, n_sweeps: int, lean=None):
    """``direct_run_sweeps`` as a host-level draw loop (ChainResult contract).

    Chain-identical to the jitted scan (same RNG split sequence, same b
    build, the same PCG arithmetic per iteration — only the convergence
    check moves to host), but every stage is its own dispatch with donated
    carries, bounding peak HBM to the largest single stage instead of the
    whole program: the jitted while_loop PCG alone measured 18.2 GB at the
    full MUSE field (see ``_host_pcg_programs``), while this layout's peak
    is the step program (~8 cube-size buffers + the problem constants).
    ``run_sweeps`` auto-routes here above ``PCG_WHILE_BYTES_BUDGET``.

    ``lean`` (default: auto above ``DIRECT_LEAN_BYTES`` per cube) switches
    to the lean segment layout that additionally drops the state's
    ``clean``/``resid`` cubes during the solves — REQUIRED at full MUSE
    field (the standing state otherwise OOMs the PCG; see
    ``_lean_run_sweeps_host``).  Lean mode CONSUMES the passed-in state.
    """
    from .. import sampler as sm

    p = problem
    cfg = p.config
    if n_sweeps <= 0:
        return sm.ChainResult(
            state=state,
            chi2_trace=jnp.zeros((0,), jnp.float32),
            accept_trace=jnp.zeros((0,), jnp.float32),
            flux_trace=jnp.zeros((0,), jnp.float32),
            monitor_trace=jnp.zeros((0, int(p.monitor_idx.shape[0])),
                                    cfg.dtype),
        )
    mode = _resolve_precond_mode(p, None)
    tau = _tau(p)
    pstate = _precond_state_jit(p, mode, _precond_tau(p, tau))
    if lean is None:
        lean = (
            p.L * p.Y * p.X * np.dtype(cfg.dtype).itemsize
            > DIRECT_LEAN_BYTES
        )
    if lean:
        return _lean_run_sweeps_host(problem, state, n_sweeps, mode, pstate)
    burn = cfg.resolved_burn_in()
    sweep0 = int(state.sweep)
    st = state
    traces = []
    for i in range(n_sweeps):
        idx = sweep0 + i
        keep = 1.0 if (idx >= burn and (idx - burn) % cfg.keep_one_in == 0) \
            else 0.0
        key, sub = jax.random.split(st.key)
        b = _b_draw(p, sub)
        res = pcg_host(p, b, cfg.direct_tol, cfg.direct_maxiter,
                       mode=mode, pstate=pstate)
        st, tr = _host_draw_update(
            p, st, res.x, key, res.rel_residual, keep=keep
        )
        traces.append(tr)
    chi2_t, acc_t, flux_t, mon_t = (
        jnp.stack([t[j] for t in traces]) for j in range(4)
    )
    return sm.ChainResult(
        state=st, chi2_trace=chi2_t, accept_trace=acc_t,
        flux_trace=flux_t, monitor_trace=mon_t,
    )
