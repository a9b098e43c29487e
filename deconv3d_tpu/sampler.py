"""MH-within-Gibbs sampler core — jit-compiled, color-decomposed (C1–C4, C8).

TPU-native rebuild of the reference's sampler (reference: deconv3d's ``Run``
MCMC loop — per-spaxel proposal / accept / incremental chi²; SURVEY.md §2
"Sampler (Run)", §3.2).  The reference iterates spaxels one at a time in
Python; that design is hostile to any accelerator.  This module replaces it
with a mathematically equivalent *color-decomposed* Gibbs scan:

  * The FSF footprint is ``f×f`` (odd).  Two spaxels whose (y, x) offsets are
    both multiples of ``f`` have **disjoint** likelihood patches, so their
    single-site MH updates commute: updating them simultaneously is exactly
    equivalent to updating them sequentially in any order.  Coloring the
    spaxel grid by ``(y mod f, x mod f)`` yields ``f²`` colors; one *sweep*
    scans the colors with ``lax.scan`` and updates every spaxel of a color in
    one fused, branchless step.  The chain's stationary distribution is
    identical to the serial scan's (same set of single-site kernels, fixed
    scan order).

  * Stride == footprint makes same-color patches tile space exactly, so the
    "gather patches / scatter patches" of the reference becomes a single
    ``dynamic_slice`` + ``reshape`` (and the reverse) — no gather/scatter
    ops, no indices, perfectly XLA-fusible.

  * Incremental likelihood (C4): a spaxel-spectrum perturbation δ changes the
    convolved model by the separable outer product Δ[μ,dy,dx] = g[μ]·F[μ,dy,dx]
    with g = LSF(δ), so Δchi² reduces to two small einsums against the
    residual patch.  The ``Σ F² w`` quadratic term depends only on the
    (constant) weights and is precomputed for every spaxel at init.

  * RNG is threefry key-splitting inside the scan; acceptance is a branchless
    ``jnp.where``; masked spaxels (C8) and off-grid padding spaxels are
    neutralised by zero weights + zeroed jumps.

State layout (all shapes static):
    clean  [L, Yc, Xc]   Yc = ceil(Y/f)·f   (zero-padded clean cube)
    resid  [L, Hp, Wp]   Hp = f-1 + Yc      (data - conv(clean), zero-padded;
                          the patch of spaxel y covers padded rows [y, y+f))
Weights w = 1/variance live on the same padded grid with 0 in the pads, so
boundary patches need no special-casing anywhere.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import convolve as cv
from .cube import Cube
from .instruments import Instrument


# ---------------------------------------------------------------------------
# Configuration
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Sampler knobs (reference parity: Run.__init__ kwargs, SURVEY.md §5.6).

    ``max_iterations`` counts *full Gibbs sweeps* (every unmasked spaxel
    visited once per sweep — the reference's iteration visits one spaxel;
    one sweep here does the work of Y·X reference iterations).
    """

    max_iterations: int = 1000
    burn_in: Optional[int] = None          # default: max_iterations // 2
    keep_one_in: int = 1                   # thinning of the posterior mean
    # posterior-variance accumulator (sum of squares). Costs one clean-cube
    # buffer in state AND in XLA's scan double-buffer — turning it off cuts
    # ~2.8 GB on a full MUSE field, where HBM is the binding constraint.
    track_variance: bool = True
    n_monitor: int = 8                     # voxels traced per sweep (for R̂)
    jump_scale: Optional[float] = None     # None → auto from weights
    target_acceptance: float = 0.234       # adaptive-MH target
    adapt_rate: float = 0.10               # Robbins-Monro step for log-scale
    # post-burn-in the adaptation does not freeze but decays as
    # (sweeps past burn-in)^-adapt_decay — "diminishing adaptation", which
    # keeps steady-state acceptance pinned at the target without breaking
    # ergodicity (VERDICT r1 weak #4).  0.5 < adapt_decay <= 1 is the valid
    # Robbins-Monro range; None/0 freezes at burn-in (round-1 behaviour).
    adapt_decay: Optional[float] = 0.7
    positivity: bool = False               # optional positivity constraint
    # 'mh'          single-site MH spectrum proposals (reference parity)
    # 'gibbs'       exact single-voxel Gaussian conditionals (acceptance 1)
    # 'gibbs_block' exact whole-spectrum conditionals per spaxel via banded
    #               Cholesky — removes the LSF-induced λ-correlation from
    #               the chain (rebuild-only; VERDICT r1 next #6)
    # 'direct'      INDEPENDENT exact posterior draws by perturb-and-solve
    #               PCG (ops/direct.py) — no burn-in, no autocorrelation;
    #               one "sweep" = one full-ESS sample (rebuild-only)
    sampler: str = "mh"
    initial: str = "zeros"                 # 'zeros' | 'data'
    fsf_size: Optional[int] = None
    lsf_width: Optional[int] = None
    seed: int = 0
    dtype: np.dtype = np.float32
    # execution engine: 'auto' → fused Pallas kernel on TPU (whole-cube
    # VMEM-resident when it fits, HBM-tiled otherwise), jnp elsewhere.
    engine: str = "auto"         # 'auto' | 'jnp' | 'pallas' | 'pallas_tiled'
    # (ny_t, nx_t) tile of the pallas_tiled engine; planned by make_problem
    # when left None (rides in static config metadata — hashable tuple).
    tile: Optional[Tuple[int, int]] = None
    # coarse-grid blocked MH moves (ops/coarse.py): after every
    # ``coarse_every`` sweeps, one 4-color pass of block-level spectrum
    # jumps (f×f blocks) — long-range spatial mixing the single-site sweep
    # lacks.  None/0 disables.  Composes with every engine and sampler mode
    # except positivity (a shared block jump cannot reflect per-voxel).
    coarse_every: Optional[int] = None
    coarse_scale: float = 2.4            # × L^-1/2 · quadR^-1/2 proposal σ
    # pattern family: 'global' (default — globally-coherent f-periodic
    # directions with the coefficient spectrum drawn EXACTLY from its
    # banded conditional; measured ≥3× voxel-ESS on blurred toys, ≥25×
    # for MH), 'soft' (per-anchor FSF-autocorrelation eigen-patterns),
    # 'block' (smooth f×f moves), 'mixed' (soft + block).
    coarse_mode: str = "global"
    # jnp engine, huge fields: process the slab reads/commits of a color
    # step in λ-chunks of this many planes so temporaries stay bounded.
    # Ulp-equivalent to the full-λ path: the patch contraction has no
    # cross-λ reduction; only XLA's per-shape reduction order differs.
    # None → auto: full-λ for small cubes, chunked when a slab temporary
    # would exceed ~256 MB (the full MUSE field would OOM 16 GB HBM
    # otherwise); 0 disables chunking.
    lambda_chunk: Optional[int] = None
    fsf_tol: float = 1e-5                  # low-rank FSF tolerance (pallas)
    fsf_max_rank: int = 8
    # sampler='direct' knobs: PCG stopping tolerance (relative residual),
    # iteration cap, and preconditioner ('banded' Fourier-space λ-banded
    # Cholesky — tabulates [Y·(X//2+1), L, lw]; 'jacobi' for huge fields).
    direct_tol: float = 1e-6
    # 500 covers MUSE-subcube-grade conditioning (draws measured ~300-400
    # iterations when the FSF footprint rivals the field); the per-draw
    # convergence flag rides the accept trace either way.
    direct_maxiter: int = 500
    direct_precond: str = "banded"
    # |k|-bin count of the radially-binned preconditioner (the auto-switch
    # target above ops/direct.BANDED_BYTES_BUDGET).  NOT monotonic — 256
    # is the measured full-field optimum (2026-08-18, ridge τ=1e-3 MUSE
    # 300×300×3681): 64 bins = same 75 iterations but 2× slower solves
    # (worse [B, M, L] batching); 1024 bins STALL (rel 0.145 at 600 — fine
    # bins faithfully invert the near-null high-|k| modes exactly where
    # the periodic-model mismatch from masks/boundaries is largest, while
    # coarse bin-means regularise them).  Exposed for tuning on other
    # FSF shapes, not for "more is better".
    direct_radial_bins: int = 256
    # Boundary/mask-aware symmetric diagonal scaling of the Fourier
    # preconditioners (ops/direct._diag_scale_map): corrects the
    # periodic-model diag mismatch at field edges and masked regions.
    # Off by default, and measured NEGATIVE at full field (FULLFIELD_
    # r04_direct.json: 600 CG iterations rel 0.14 STALLED vs 75
    # converged unscaled — the rescaling breaks the radial binning's
    # near-null-mode damping at scale despite passing the dense oracle
    # at toy size).  Do not enable on large fields.
    direct_precond_scale: bool = False
    # Ridge used INSIDE the Fourier preconditioners (M-side only — the
    # operator A, and therefore the posterior, always uses
    # prior_precision).  'auto' = max(prior_precision, 1e-2·w̄): bounds
    # M⁻¹'s gain on the periodic model's near-null modes, whose faithful
    # inversion is exactly where the boundary/mask mismatch lives (the
    # same mechanism as the radial bin-count stall above).  Measured
    # (2026-08-21, MUSE blur 300×300×800, A-ridge τ=1e-3·w̄): τ_m = τ
    # STALLS (rel 8e-2 at 400 iterations), τ_m = 3e-3·w̄ stalls,
    # τ_m = 1e-2·w̄ converges in 98 iterations, 3e-2 in 104, 1e-1 in
    # 146 — and the τ_m = τ stall is GEOMETRY-FRAGILE (240² converges,
    # 200² and 300² stall at L=800) and numerics-fragile (the full field
    # converged on the 2026-08-20 container stack whose non-pow2 FFTs
    # carried ~5e-3 error, then stalled identically on the more accurate
    # 08-21 stack; CPU reproduces the stall bit-for-bit, so it is the
    # exact preconditioner's own near-null amplification, not a TPU
    # defect).  A float forces max(prior_precision, value).
    direct_precond_tau: "float | str" = "auto"
    # spatial-conv path of the PCG operator (ops/direct._spatial): 'auto'
    # matches the backend (depthwise direct conv on TPU, FFT elsewhere);
    # 'direct'/'fft' force one.  Exists so CPU-mesh harnesses can request
    # the shardable direct-conv path explicitly instead of monkeypatching
    # jax.default_backend (VERDICT r3 weak #7).
    direct_spatial: str = "auto"
    # Re-baseline the running chi² from the from-scratch FFT value
    # (full_chi2) every N absolute sweeps.  The incremental chi² is exact
    # in expectation but accumulates f32 summation error: the full-field
    # exact-Gibbs drive measured 2.7e-4 relative drift over 400 sweeps
    # (3e8 voxel draws/sweep — the per-sweep Δchi² totals already carry
    # the rounding before the Kahan accumulator sees them), vs 4.8e-7 for
    # MH over 1000 sweeps (VERDICT r3 weak #1).  One full_chi2 is a single
    # FFT convolution (~0.1 s at full field): every 8 sweeps ≈ 1–2%
    # overhead on the gibbs kernel, bounding the drift below the 1e-5
    # bench gate.  None → auto: 8 for gibbs on huge tiled problems
    # (clean > 256 MB), else 0 (off); explicit ints force it anywhere.
    chi2_rebaseline_every: Optional[int] = None
    # Optional Gaussian ridge prior  c ~ N(0, prior_precision⁻¹ I)  on the
    # free voxels, for sampler='direct' and MAP solves only (the MCMC
    # engines keep the reference's flat prior).  Under heavy blur the
    # flat-prior normal operator KᵀWK is near-singular — CG stalls at
    # rel≈0.06 regardless of preconditioner or precision (measured f32 AND
    # f64 on the chromatic-Moffat f=9 toy) because the blur-null modes are
    # statistically unconstrained.  A proper prior bounds them: A becomes
    # KᵀWK + τI, the perturb-and-solve draw stays EXACT for the modified
    # (proper) posterior (the prior is perturbed too: b += √τ·z₂), and the
    # Fourier preconditioner absorbs +τ into its λ-band diagonals.  Units:
    # 1/flux² — e.g. τ = (3·σ_flux_max)⁻² keeps the prior weaker than the
    # likelihood everywhere the data constrain.  0 = flat (default).
    # "auto" = rel·w̄ resolved by make_problem from the variance cube
    # (ops/direct.suggest_prior_precision — measured convergence table).
    prior_precision: float | str = 0.0

    def resolved_burn_in(self) -> int:
        if self.burn_in is not None:
            return self.burn_in
        if self.sampler == "direct":
            # direct draws are iid — burn-in would silently discard half of
            # the expensive exact samples for nothing (ADVICE r2).
            return 0
        return self.max_iterations // 2


def adapt_schedule(ids: jax.Array, cfg: RunConfig) -> jax.Array:
    """Per-sweep Robbins-Monro step sizes (scan data — never recompiles).

    Full ``adapt_rate`` during burn-in; post-burn-in either frozen
    (``adapt_decay`` falsy) or decaying as t^-adapt_decay so the
    steady-state acceptance stays at ``target_acceptance`` while the
    adaptation diminishes fast enough to preserve the stationary
    distribution (Roberts & Rosenthal diminishing-adaptation condition).
    """
    burn = cfg.resolved_burn_in()
    in_burn = ids < burn
    if not cfg.adapt_decay:
        return jnp.where(in_burn, jnp.float32(cfg.adapt_rate), 0.0)
    t = jnp.maximum(ids - burn + 1, 1).astype(jnp.float32)
    tail = jnp.float32(cfg.adapt_rate) * t ** jnp.float32(-cfg.adapt_decay)
    return jnp.where(in_burn, jnp.float32(cfg.adapt_rate), tail)


# ---------------------------------------------------------------------------
# Problem: static geometry + constant device arrays
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Problem:
    """Everything constant across sweeps.

    A pytree: kernel banks / weights are traced leaves (so one compiled
    sampler serves many cubes of the same geometry), while the geometry and
    config ride along as static metadata.
    """

    # static geometry
    L: int = dataclasses.field(metadata=dict(static=True))
    Y: int = dataclasses.field(metadata=dict(static=True))
    X: int = dataclasses.field(metadata=dict(static=True))
    f: int = dataclasses.field(metadata=dict(static=True))   # FSF footprint (odd)
    ny: int = dataclasses.field(metadata=dict(static=True))  # ceil(Y / f)
    nx: int = dataclasses.field(metadata=dict(static=True))  # ceil(X / f)
    # constants (device arrays)
    fsf: jax.Array = None                   # [L, f, f]
    lsf: jax.Array = None                   # [L, lw]
    data_pad: jax.Array = None              # [L, Hp, Wp]
    w_pad: jax.Array = None                 # [L, Hp, Wp] (1/variance, 0 in pads)
    quad: jax.Array = None                  # [L, Yc, Xc]  Σ_{dy,dx} F² w  per spaxel
    valid: jax.Array = None                 # [Yc, Xc] bool (unmasked & on-grid)
    monitor_idx: jax.Array = None           # [K] flat indices into clean, traced
    # low-rank FSF factors (pallas engine): fsf ≈ Σ_s spec[s,λ]·imgs[s,·,·]
    fsf_spec: Optional[jax.Array] = None    # [S, L]
    fsf_imgs: Optional[jax.Array] = None    # [S, f, f]
    # pallas_tiled engine: quad pre-relayouted per (color, tile) block; the
    # [L, Yc, Xc] quad is then dropped (None) — a full-field quad is 1.4 GB
    # and HBM is the binding constraint (init_state keeps quad_mean).
    quad_tiled: Optional[jax.Array] = None  # [f²·n_tiles, 1, nij_t·Lp]
    quad_mean: Optional[jax.Array] = None   # [Yc, Xc] λ-mean of quad
    # pallas_tiled gibbs: qvox in the same per-(color, tile) layout; the
    # cube-layout qvox is then dropped for the same HBM reason as quad
    qvox_tiled: Optional[jax.Array] = None  # [f²·n_tiles, 1, nij_t·Lp]
    # per-voxel conditional precision (gibbs sampler): Σ_μ M²[μ,λ]·quad[μ,y,x]
    qvox: Optional[jax.Array] = None        # [L, Yc, Xc]
    # per-spaxel banded Cholesky of A = Mᵀ diag(quad) M (gibbs_block):
    chol: Optional[jax.Array] = None        # [Yc, Xc, L, lw]
    config: RunConfig = dataclasses.field(
        default_factory=RunConfig, metadata=dict(static=True)
    )

    @property
    def Yc(self) -> int:
        return self.ny * self.f

    @property
    def Xc(self) -> int:
        return self.nx * self.f

    @property
    def Hp(self) -> int:
        return self.f - 1 + self.Yc

    @property
    def Wp(self) -> int:
        return self.f - 1 + self.Xc

    @property
    def n_colors(self) -> int:
        return self.f * self.f

    @property
    def n_valid(self) -> int:
        return int(np.asarray(self.valid).sum())


# ---------------------------------------------------------------------------
# Sampler state (pytree)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplerState:
    clean: jax.Array        # [L, Yc, Xc]
    resid: jax.Array        # [L, Hp, Wp]
    key: jax.Array
    chi2: jax.Array         # scalar, Kahan-compensated
    chi2_comp: jax.Array    # Kahan compensation term
    log_scale: jax.Array    # [Yc, Xc] per-spaxel log jump scale
    n_accept: jax.Array     # scalar float
    n_propose: jax.Array    # scalar float
    sum_clean: jax.Array    # [L, Yc, Xc] posterior-mean accumulator
    sum_sq: jax.Array       # [L, Yc, Xc] posterior-var accumulator
    n_kept: jax.Array       # scalar float
    sweep: jax.Array        # int32 sweep counter


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ChainResult:
    """Output of run_sweeps: final state + per-sweep scalar traces."""

    state: SamplerState
    chi2_trace: jax.Array        # [n_sweeps]
    accept_trace: jax.Array      # [n_sweeps] sweep acceptance rate
    flux_trace: jax.Array        # [n_sweeps] Σ clean over valid spaxels
    monitor_trace: jax.Array     # [n_sweeps, K] monitored clean voxels


# ---------------------------------------------------------------------------
# Problem construction
# ---------------------------------------------------------------------------

def _quad_conv(w_pad: jax.Array, fsf_np: np.ndarray, dtype,
               chunk: int = 512) -> jax.Array:
    """Depthwise VALID correlation of w with F², λ-chunked, on device."""
    L = w_pad.shape[0]
    fsf2 = jnp.asarray(np.asarray(fsf_np, np.float64) ** 2, dtype=dtype)

    def one(wc, fc):
        return jax.lax.conv_general_dilated(
            wc[None].astype(dtype),
            fc[:, None],
            window_strides=(1, 1),
            padding="VALID",
            feature_group_count=wc.shape[0],
            precision=jax.lax.Precision.HIGHEST,
        )[0]

    if L <= chunk:
        return one(w_pad, fsf2)
    outs = []
    for lo in range(0, L, chunk):
        n = min(chunk, L - lo)
        wc, fc = w_pad[lo : lo + n], fsf2[lo : lo + n]
        if n < chunk:  # pad the tail so every call reuses one compiled shape
            wc = jnp.concatenate(
                [wc, jnp.zeros((chunk - n,) + wc.shape[1:], wc.dtype)]
            )
            fc = jnp.concatenate(
                [fc, jnp.zeros((chunk - n,) + fc.shape[1:], fc.dtype)]
            )
        outs.append(one(wc, fc)[:n])
    return jnp.concatenate(outs)


def make_problem(
    cube: Cube, instrument: Instrument, config: RunConfig = RunConfig()
) -> Problem:
    """Rasterise kernels, build padded weights and per-spaxel quadratic terms."""
    cube = cube.sanitized()
    dtype = config.dtype
    L, Y, X = cube.shape
    lam = cube.wavelengths()

    fsf_np = instrument.fsf.bank(
        lam, size=config.fsf_size, pixel_scale=instrument.pixel_scale
    )
    lsf_np = instrument.lsf.bank(lam, cdelt=cube.cdelt, width=config.lsf_width)

    if config.sampler == "gibbs_block" and config.positivity:
        raise ValueError(
            "gibbs_block draws whole spectra jointly; a positivity-"
            "truncated multivariate conditional has no closed form — use "
            "sampler='gibbs' (exact truncated-normal voxel draws) or 'mh'."
        )
    if config.coarse_every and config.positivity:
        raise ValueError(
            "coarse_every adds one shared jump per block, which cannot "
            "respect per-voxel positivity — disable one of the two."
        )
    if config.sampler == "direct" and config.positivity:
        raise ValueError(
            "sampler='direct' draws from the exact joint Gaussian; the "
            "positivity-truncated joint has no closed form — use "
            "sampler='gibbs' (exact truncated-normal voxel draws)."
        )
    if isinstance(config.prior_precision, str):
        if config.prior_precision != "auto":
            raise ValueError(
                f"prior_precision must be a float or 'auto', got "
                f"{config.prior_precision!r}"
            )
    elif config.prior_precision < 0:
        raise ValueError(
            f"prior_precision must be >= 0, got {config.prior_precision}"
        )
    if config.direct_radial_bins < 1:
        raise ValueError(
            f"direct_radial_bins must be >= 1, got "
            f"{config.direct_radial_bins}"
        )
    if config.direct_spatial not in ("auto", "direct", "fft"):
        raise ValueError(
            f"direct_spatial must be 'auto', 'direct' or 'fft', got "
            f"{config.direct_spatial!r}"
        )
    tm = config.direct_precond_tau
    if isinstance(tm, str):
        if tm != "auto":
            raise ValueError(
                f"direct_precond_tau must be a float or 'auto', got {tm!r}"
            )
    elif tm < 0:
        raise ValueError(
            f"direct_precond_tau must be >= 0, got {tm}"
        )
    _tau_on = (
        config.prior_precision == "auto" or config.prior_precision > 0
    )
    if _tau_on and config.sampler != "direct":
        raise ValueError(
            "prior_precision (Gaussian ridge prior) is implemented for "
            "sampler='direct' and MAP solves only — the MCMC engines "
            "sample the reference's flat-prior posterior.  For a ridge "
            "MAP on any run, pass prior_precision to Run.map_estimate() "
            "instead of the config."
        )
    if config.sampler == "direct":
        # pure XLA conv/FFT path — the fused kernels have no role here
        config = dataclasses.replace(config, engine="jnp")
    engine = config.engine
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if engine in ("pallas", "pallas_tiled") and config.positivity:
        # the fused kernels never read the clean cube, so the reflective
        # positivity proposal runs on the jnp engine.
        engine = "jnp"
    if engine in ("pallas", "pallas_tiled") and config.sampler == "gibbs_block":
        # banded-Cholesky scans are XLA territory, not a fused-kernel fit
        engine = "jnp"
    tile = config.tile
    if engine == "pallas":
        # Size-aware engine resolution (VERDICT r1 weak #3): the whole-cube
        # fused kernel keeps the padded residual + weights VMEM-resident,
        # which caps the geometry.  Too-big problems step down to the
        # HBM-tiled kernel (MH only) and then to jnp — or raise on an
        # explicit engine='pallas' request — instead of dying in a
        # Mosaic/VMEM compile crash.
        from .ops.pallas_sweep import VMEM_BUDGET_BYTES, segment_vmem_bytes

        _f = fsf_np.shape[-1]
        _ny, _nx = -(-Y // _f), -(-X // _f)
        need = segment_vmem_bytes(
            _f, _ny, _nx, L, lsf_np.shape[-1], config.fsf_max_rank
        )
        if need > VMEM_BUDGET_BYTES:
            msg = (
                f"geometry L={L} Y={Y} X={X} f={_f} needs ~{need / 2**20:.0f}"
                f" MiB of VMEM (budget {VMEM_BUDGET_BYTES / 2**20:.0f} MiB); "
                "the fused kernel keeps the whole residual on-chip"
            )
            if config.engine == "pallas":
                raise ValueError(
                    msg + " — use engine='pallas_tiled', 'jnp' or 'auto' "
                    "for this size."
                )
            import logging

            if config.sampler in ("mh", "gibbs"):
                from .ops.pallas_tiled import plan_tiles

                tile = plan_tiles(
                    _f, _ny, _nx, L, lsf_np.shape[-1], config.fsf_max_rank,
                    gibbs=(config.sampler == "gibbs"),
                )
            else:
                tile = None
            if tile is not None:
                engine = "pallas_tiled"
                logging.getLogger("deconv3d_tpu").info(
                    "%s — using the HBM-tiled kernel with %s tiles.",
                    msg, tile,
                )
            else:
                logging.getLogger("deconv3d_tpu").warning(
                    "%s — falling back to the jnp engine.", msg
                )
                engine = "jnp"
    if engine == "pallas_tiled":
        from .ops.pallas_tiled import plan_tiles

        if config.sampler not in ("mh", "gibbs"):
            # positivity / gibbs_block / direct were already routed to jnp
            # above; this only fires on an explicit engine request.
            raise ValueError(
                "engine='pallas_tiled' supports sampler='mh' and 'gibbs'; "
                f"use engine='jnp' for sampler={config.sampler!r}."
            )
        _f = fsf_np.shape[-1]
        _ny, _nx = -(-Y // _f), -(-X // _f)
        if tile is None:
            tile = plan_tiles(
                _f, _ny, _nx, L, lsf_np.shape[-1], config.fsf_max_rank,
                gibbs=(config.sampler == "gibbs"),
            )
        if tile is None:
            raise ValueError(
                f"no (ny_t, nx_t) tiling of L={L} Y={Y} X={X} f={_f} fits "
                "the VMEM budget — use engine='jnp'."
            )
    config = dataclasses.replace(config, engine=engine, tile=tile)
    if config.chi2_rebaseline_every is None:
        # auto: exact-Gibbs on a huge tiled field is the measured drift
        # case (see the knob's comment); everything else stays off.
        _f0 = fsf_np.shape[-1]
        _clean_bytes = (
            L * (-(-Y // _f0) * _f0) * (-(-X // _f0) * _f0)
            * np.dtype(config.dtype).itemsize
        )
        config = dataclasses.replace(
            config,
            chi2_rebaseline_every=(
                8 if (engine == "pallas_tiled"
                      and config.sampler == "gibbs"
                      and _clean_bytes > 2**28) else 0
            ),
        )
    fsf_spec = fsf_imgs = None
    if engine in ("pallas", "pallas_tiled"):
        # The fused kernel contracts patches on the MXU via the low-rank bank
        # F̃ = Σ_s spec·img (ops/fsf_factor.py).  The reconstruction becomes
        # the forward model everywhere, so the chain is exact for F̃.
        from .ops.fsf_factor import factor_bank

        spec_np, imgs_np, fsf_np, _err = factor_bank(
            fsf_np, tol=config.fsf_tol, max_rank=config.fsf_max_rank
        )
        fsf_spec = jnp.asarray(spec_np, dtype=dtype)
        fsf_imgs = jnp.asarray(imgs_np, dtype=dtype)

    f = fsf_np.shape[-1]
    ny, nx = -(-Y // f), -(-X // f)
    Yc, Xc = ny * f, nx * f
    Hp, Wp = f - 1 + Yc, f - 1 + Xc
    h = f // 2

    # weights on the padded grid; zero outside the data region and at masked
    # spaxels (C8) / invalid variances (C2).  All ON DEVICE: the sanitized
    # cube's arrays already live there, and pulling GB-size cubes back to
    # the host is pathologically slow through a tunneled PJRT device
    # (~7 MB/s measured on a full MUSE field → minutes per array).
    var = jnp.asarray(cube.variance, dtype=dtype)
    w = jnp.where(
        jnp.isfinite(var) & (var > 0), 1.0 / var, jnp.asarray(0.0, dtype)
    )
    mask_np = np.asarray(cube.mask)
    w = jnp.where(jnp.asarray(mask_np)[None], jnp.asarray(0.0, dtype), w)
    if config.prior_precision == "auto":
        # τ = rel·w̄ (ops/direct.suggest_prior_precision documents the
        # measured convergence law); resolved HERE so every downstream
        # consumer — jitted programs, preconditioner caches, checkpoints —
        # sees a concrete static float.
        import logging

        from .ops.direct import AUTO_PRIOR_REL

        wf = w.astype(jnp.float32)
        wbar = jnp.sum(wf) / jnp.maximum(
            jnp.sum((wf > 0).astype(jnp.float32)), 1.0
        )
        config = dataclasses.replace(
            config, prior_precision=float(AUTO_PRIOR_REL * wbar)
        )
        logging.getLogger("deconv3d_tpu").info(
            "prior_precision='auto' resolved to %.3e (rel=%.0e × mean "
            "weight)", config.prior_precision, AUTO_PRIOR_REL,
        )
    if config.direct_precond_tau == "auto":
        # M-side ridge floor τ_m = PRECOND_TAU_REL·w̄ (see the RunConfig
        # field docstring); resolved HERE for the same static-float
        # reasons as prior_precision above.  max(τ, ·) happens at use
        # time (ops/direct._precond_tau) since τ may be overridden per
        # call.
        from .ops.direct import PRECOND_TAU_REL

        wf = w.astype(jnp.float32)
        wbar = jnp.sum(wf) / jnp.maximum(
            jnp.sum((wf > 0).astype(jnp.float32)), 1.0
        )
        config = dataclasses.replace(
            config, direct_precond_tau=float(PRECOND_TAU_REL * wbar)
        )
    if engine in ("pallas", "pallas_tiled"):
        # the kernel keeps weights VMEM-resident in bfloat16; round here so
        # quad, chi² and accepts all see the *same* (slightly coarser) w̃ —
        # the sampled posterior is then exactly the w̃-weighted one.
        w = w.astype(jnp.bfloat16).astype(dtype)
    w_pad = jnp.zeros((L, Hp, Wp), dtype=dtype).at[
        :, h : h + Y, h : h + X
    ].set(w)
    data_pad = jnp.zeros((L, Hp, Wp), dtype=dtype).at[
        :, h : h + Y, h : h + X
    ].set(jnp.asarray(cube.data, dtype=dtype))

    # On huge cubes, serialize the GB-scale build steps: execution through
    # the tunneled backend is LAZY and an unbounded dispatch queue keeps
    # every pending step's working set live at once — quad + qvox + the
    # tiled relayouts together OOM a full-field build that fits fine when
    # each step completes (and frees its inputs) before the next.
    _big = L * Yc * Xc * np.dtype(dtype).itemsize > 2**28

    def _sync(x):
        if _big and x is not None:
            jax.block_until_ready(x)

    _sync(data_pad)
    # the padded copies now carry everything the build still needs — drop
    # the input cube's device arrays and the intermediate weights (~4 GB
    # on a full field that the later stages would otherwise OOM against)
    del var, w
    cube = None

    # Σ_{dy,dx} F²[λ,dy,dx] w[λ, y+dy, x+dx] for every spaxel: a depthwise
    # VALID correlation of the padded weights with F².  [L, Yc, Xc].
    # Chunked over λ: compile time of a grouped conv grows with the group
    # count, so a full MUSE field (3681 groups) is built as fixed 512-group
    # convs — one small compile, reused per chunk.
    quad = _quad_conv(w_pad, fsf_np, dtype)
    _sync(quad)

    valid = np.zeros((Yc, Xc), dtype=bool)
    valid[:Y, :X] = ~mask_np
    # spaxels with zero total weight in their footprint have an improper flat
    # conditional — freeze them at their initial value instead of letting them
    # random-walk (SURVEY.md §2 "Masking").  (Tiny d2h transfer.)
    valid &= np.asarray(jnp.sum(quad, axis=0) > 0)

    # deterministic set of monitored voxels (for per-parameter R̂, C9):
    # spread across valid spaxels and the spectral axis.
    k = max(1, config.n_monitor)
    vy, vx = np.nonzero(valid)
    mon_rng = np.random.default_rng(config.seed + 7919)
    if len(vy) == 0:
        monitor = np.zeros(k, dtype=np.int32)
    else:
        pick = mon_rng.choice(len(vy), size=k, replace=len(vy) < k)
        lam_pick = mon_rng.integers(0, L, size=k)
        monitor = (lam_pick * Yc * Xc + vy[pick] * Xc + vx[pick]).astype(np.int32)

    qvox = None
    if config.sampler == "gibbs":
        # conditional precision of a single voxel (λ0, y, x) under the
        # separable model: q = Σ_μ M[μ,λ0]² · (Σ_{dy,dx} F²[μ] w[μ,·,·]).
        # precision_diag computes just the k=0 band in one jitted program —
        # the full band loop queues lw cube-size temporaries on the lazy
        # dispatch backend and OOMs a 300×300×3681 field.
        from .ops import banded

        qvox = banded.precision_diag(
            jnp.asarray(lsf_np, dtype=dtype), quad
        ).astype(dtype)
        _sync(qvox)

    if config.lambda_chunk is None:
        slab_bytes = L * Yc * Xc * np.dtype(dtype).itemsize
        lam_chunk = 0
        if slab_bytes > 2**28:
            lam_chunk = max(1, int(2**28 / (Yc * Xc * np.dtype(dtype).itemsize)))
        config = dataclasses.replace(config, lambda_chunk=lam_chunk)

    chol = None
    if config.sampler == "gibbs_block":
        # quad is constant, so every spaxel's banded spectrum-precision
        # Cholesky is computed ONCE here; the hot loop only runs the two
        # O(L·lw) triangular solves per spaxel visit.
        from .ops import banded

        qs = jnp.moveaxis(jnp.asarray(quad, dtype=dtype), 0, -1)  # [Yc,Xc,L]
        bands = banded.precision_bands(jnp.asarray(lsf_np, dtype=dtype), qs)
        chol = banded.cholesky_banded(bands)               # [Yc, Xc, L, lw]

    quad = quad.astype(dtype)
    quad_tiled = quad_mean = qvox_tiled = None
    if config.sampler == "direct":
        # the direct sampler never reads quad; keep only the λ-mean that
        # init_state's jump-scale heuristic uses — a full-field quad is
        # 1.4 GB and the CG state needs the HBM headroom
        quad_mean = jnp.mean(quad, axis=0)
        quad = None
    if engine == "pallas_tiled":
        # w already carries bf16-rounded VALUES (kernel-engine invariant
        # above); store it in bf16 outright — a full-field w_pad is 1.4 GiB
        # in f32 and HBM is the binding constraint.  Consumers multiply it
        # into f32 expressions, which auto-promotes losslessly.
        w_pad = w_pad.astype(jnp.bfloat16)
        # pre-relayout quad for the tiled kernel and DROP the cube-layout
        # copy: a full-field quad is ~1.4 GB and would otherwise be held
        # (plus a second transient copy per kernel segment) for nothing —
        # only init_state's jump-scale heuristic needs it, via the λ-mean.
        from .ops.pallas_tiled import _pad_lanes_of, tiled_quad_layout

        ny_t, nx_t = config.tile
        quad_tiled = tiled_quad_layout(
            quad, ny, nx, f, ny_t, nx_t, L, _pad_lanes_of(L)
        )
        quad_mean = jnp.mean(quad, axis=0)
        _sync(quad_tiled)
        quad = None     # freed once the relayout above has executed
        if qvox is not None:
            # gibbs on the tiled engine: same per-(color, tile) relayout;
            # the cube-layout copy is dropped for the same HBM reason.
            qvox_tiled = tiled_quad_layout(
                qvox.astype(dtype), ny, nx, f, ny_t, nx_t, L,
                _pad_lanes_of(L),
            )
            _sync(qvox_tiled)
            qvox = None

    return Problem(
        L=L, Y=Y, X=X, f=f, ny=ny, nx=nx,
        fsf=jnp.asarray(fsf_np, dtype=dtype),
        lsf=jnp.asarray(lsf_np, dtype=dtype),
        data_pad=data_pad,
        w_pad=w_pad,
        quad=quad,
        valid=jnp.asarray(valid),
        monitor_idx=jnp.asarray(monitor),
        fsf_spec=fsf_spec,
        fsf_imgs=fsf_imgs,
        quad_tiled=quad_tiled,
        quad_mean=quad_mean,
        qvox_tiled=qvox_tiled,
        qvox=qvox,
        chol=chol,
        config=config,
    )


def init_state(problem: Problem, cube: Optional[Cube] = None) -> SamplerState:
    """Initial sampler state: clean guess, full-cube residual, chi² (C5 path).

    The initial chi² uses the FFT full-cube convolution — the only full
    re-convolution in a run (reference parity: Run.__init__, SURVEY.md §3.1).
    """
    p, cfg = problem, problem.config
    dtype = cfg.dtype
    h = p.f // 2
    clean = jnp.zeros((p.L, p.Yc, p.Xc), dtype=dtype)
    if cfg.initial == "data":
        # The observed data is already stored in the Problem (padded grid),
        # so initial='data' needs no cube argument; an explicit cube (e.g. a
        # prior model) overrides it.
        init_data = (
            jnp.nan_to_num(jnp.asarray(cube.data, dtype=dtype))
            if cube is not None
            else p.data_pad[:, h : h + p.Y, h : h + p.X].astype(dtype)
        )
        clean = clean.at[:, : p.Y, : p.X].set(init_data)

    conv = cv.convolve_cube(clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    resid = p.data_pad.at[:, h : h + p.Y, h : h + p.X].add(-conv)
    # zero residual where weight is zero so chi² and patch updates agree
    resid = jnp.where(p.w_pad > 0, resid, 0.0)
    chi2 = jnp.sum(resid * resid * p.w_pad, dtype=jnp.float32)

    if cfg.jump_scale is not None:
        log_scale = jnp.full((p.Yc, p.Xc), np.log(cfg.jump_scale), dtype=dtype)
    else:
        # Random-walk MH over an ~L-dimensional spectrum with CAUCHY draws:
        # the Gaussian-proposal optimum 2.4/√L·σ overshoots badly at large
        # L (the Δchi² of a heavy-tailed joint jump is dominated by the
        # largest of L draws).  Measured adapted scales (acceptance pinned
        # at 0.234) follow ≈ 3.0·σ·L^(-5/6) over L = 64…600; starting
        # there keeps early acceptance alive on full-field L ≈ 3700, where
        # the √L rule gave ~0 accepts for the first ~100 sweeps.
        qmean = p.quad_mean if p.quad is None else p.quad.mean(axis=0)
        sigma = 1.0 / jnp.sqrt(jnp.maximum(qmean, 1e-20))
        log_scale = jnp.log(3.0 * float(p.L) ** (-5.0 / 6.0) * sigma).astype(
            dtype
        )
    log_scale = jnp.where(p.valid, log_scale, 0.0)

    # sum_clean and sum_sq must be DISTINCT buffers: donated runs
    # (run_sweeps on huge states) alias inputs to outputs, and two pytree
    # leaves sharing one buffer make that aliasing ill-formed
    # (INVALID_ARGUMENT from the TPU backend).
    return SamplerState(
        clean=clean,
        resid=resid,
        key=jax.random.PRNGKey(cfg.seed),
        chi2=chi2,
        chi2_comp=jnp.zeros((), jnp.float32),
        log_scale=log_scale,
        n_accept=jnp.zeros((), jnp.float32),
        n_propose=jnp.zeros((), jnp.float32),
        sum_clean=jnp.zeros((p.L, p.Yc, p.Xc), dtype=dtype),
        sum_sq=(
            jnp.zeros((p.L, p.Yc, p.Xc), dtype=dtype)
            if cfg.track_variance else jnp.zeros((1, 1, 1), dtype=dtype)
        ),
        n_kept=jnp.zeros((), jnp.float32),
        sweep=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# The hot loop
# ---------------------------------------------------------------------------

def _lsf_apply_lastaxis(j: jax.Array, lsf: jax.Array) -> jax.Array:
    """g[..., mu] = Σ_d lsf[mu, d] · j[..., mu + d - lw//2]  (banded, cheap).

    This is the spectral stage of the incremental delta (C4): O(L·lw) per
    spaxel instead of the O(L²) dense matmul — the same zero-padded "same"
    semantics as convolve.lsf_matrix.
    """
    L = j.shape[-1]
    lw = lsf.shape[1]
    half = lw // 2
    jp = jnp.pad(j, [(0, 0)] * (j.ndim - 1) + [(half, half)])
    out = jnp.zeros_like(j)
    for d in range(lw):
        out = out + lsf[:, d] * jax.lax.dynamic_slice_in_dim(jp, d, L, axis=-1)
    return out


def _i32(idx) -> jax.Array:
    return jnp.asarray(idx, jnp.int32)


def _color_slice(arr: jax.Array, cy, cx, ny: int, nx: int, f: int) -> jax.Array:
    """Gather the (cy, cx)-color entries of a [..., ny·f, nx·f] array.

    Views the array as [..., ny, f, nx, f] and slices index (cy, cx) of the
    two f-axes — one dynamic_slice, returns [..., ny, nx].
    """
    lead = arr.shape[:-2]
    r = arr.reshape(lead + (ny, f, nx, f))
    zero = _i32(0)
    starts = (zero,) * len(lead) + (zero, _i32(cy), zero, _i32(cx))
    sizes = lead + (ny, 1, nx, 1)
    return jax.lax.dynamic_slice(r, starts, sizes).reshape(lead + (ny, nx))


def _color_update(arr: jax.Array, vals: jax.Array, cy, cx, ny: int, nx: int, f: int):
    """Scatter [..., ny, nx] values back into the (cy, cx) color positions."""
    lead = arr.shape[:-2]
    r = arr.reshape(lead + (ny, f, nx, f))
    zero = _i32(0)
    starts = (zero,) * len(lead) + (zero, _i32(cy), zero, _i32(cx))
    vals = vals.reshape(lead + (ny, 1, nx, 1))
    return jax.lax.dynamic_update_slice(r, vals, starts).reshape(arr.shape)


def _slab_bounds(L: int, cfg: RunConfig):
    """Static λ-chunk boundaries for the slab reads/commits (huge fields).

    Chunking is bit-identical to the full-λ path — every per-λ plane's
    contraction and commit is independent — it only bounds the size of the
    [Lc, BY, BX] temporaries so a 300×300×3681 field fits in HBM.
    """
    lc = cfg.lambda_chunk or 0
    if lc <= 0 or lc >= L:
        return [(0, L)]
    return [(lo, min(lc, L - lo)) for lo in range(0, L, lc)]


def _chunked_lin(p: Problem, resid, cy, cx, bounds):
    """lin[λ, y, x] = Σ_{a,b} F[λ,a,b]·(resid·w)[λ, y·f+a, x·f+b], chunked."""
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    parts = []
    for lo, n in bounds:
        blk = jax.lax.dynamic_slice(
            resid, (_i32(lo), _i32(cy), _i32(cx)), (n, ny * f, nx * f)
        ).reshape(n, ny, f, nx, f)
        wblk = jax.lax.dynamic_slice(
            p.w_pad, (_i32(lo), _i32(cy), _i32(cx)), (n, ny * f, nx * f)
        ).reshape(n, ny, f, nx, f)
        parts.append(jnp.einsum(
            "lab,lyaxb->lyx", jax.lax.slice_in_dim(p.fsf, lo, lo + n),
            blk * wblk, precision=jax.lax.Precision.HIGHEST,
        ))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _chunked_commit(p: Problem, resid, g_eff, cy, cx, bounds):
    """resid ← resid − Σ outer(g, F) over the color block, λ-chunked."""
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    for lo, n in bounds:
        delta = jnp.einsum(
            "yxl,lab->lyaxb",
            jax.lax.slice_in_dim(g_eff, lo, lo + n, axis=-1),
            jax.lax.slice_in_dim(p.fsf, lo, lo + n),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(n, ny * f, nx * f)
        cur = jax.lax.dynamic_slice(
            resid, (_i32(lo), _i32(cy), _i32(cx)), (n, ny * f, nx * f)
        )
        resid = jax.lax.dynamic_update_slice(
            resid, cur - delta, (_i32(lo), _i32(cy), _i32(cx))
        )
    return resid


def _make_color_step(p: Problem):
    """One color update: propose/accept all spaxels of color (cy, cx) at once."""
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    cfg = p.config
    target = cfg.target_acceptance

    def color_step(carry, color):
        (resid, clean, key, chi2, chi2c, log_scale, acc, nprop, adapt_rate) = carry
        cy, cx = color // f, color % f

        valid_c = _color_slice(p.valid, cy, cx, ny, nx, f)          # [ny,nx]
        scale_c = _color_slice(log_scale, cy, cx, ny, nx, f)        # [ny,nx]

        # --- propose: Cauchy-scaled full-spectrum jumps (reference parity:
        # galpak-family Cauchy proposal, SURVEY.md §2 "RNG / proposals")
        key, k1, k2 = jax.random.split(key, 3)
        draw = jax.random.cauchy(k1, (ny, nx, L), dtype=resid.dtype)
        # clip the heavy Cauchy tail: |draw| > 1e3·scale is always rejected
        # anyway but would poison float32 intermediates.
        draw = jnp.clip(draw, -1e3, 1e3)
        jumps = jnp.exp(scale_c)[..., None] * draw
        jumps = jnp.where(valid_c[..., None], jumps, 0.0)
        if cfg.positivity:
            # reflective random walk: c' = |c + J| stays in the positive
            # orthant and the folded proposal density is symmetric, so the
            # Metropolis ratio needs no correction (flat prior on c ≥ 0).
            cur = jnp.moveaxis(
                _color_slice(clean, cy, cx, ny, nx, f), 0, -1
            )                                                # [ny,nx,L]
            jumps = jnp.abs(cur + jumps) - cur

        # --- incremental delta (C4): Δ[μ,dy,dx] = g[μ]·F[μ,dy,dx]
        g = _lsf_apply_lastaxis(jumps, p.lsf)                        # [ny,nx,L]

        # Δchi² = Σ (Δ² - 2 r Δ) w  =  Σ_μ g² (Σ F² w)  -  2 Σ_μ g (Σ F r w)
        bounds = _slab_bounds(L, cfg)
        quad_c = _color_slice(p.quad, cy, cx, ny, nx, f)             # [L,ny,nx]
        lin = _chunked_lin(p, resid, cy, cx, bounds)                 # [L,ny,nx]
        dchi2 = jnp.einsum(
            "yxl,lyx->yx", g * g, quad_c,
            precision=jax.lax.Precision.HIGHEST,
        ) - 2.0 * jnp.einsum(
            "yxl,lyx->yx", g, lin, precision=jax.lax.Precision.HIGHEST
        )

        # --- branchless Metropolis accept (C1)
        logu = jnp.log(jax.random.uniform(
            k2, (ny, nx), dtype=resid.dtype, minval=1e-37))
        accept = (logu < -0.5 * dchi2) & valid_c                     # [ny,nx]
        accf = accept.astype(resid.dtype)

        # --- commit: residual patches, clean spectra, chi² (Kahan)
        resid = _chunked_commit(
            p, resid, g * accf[..., None], cy, cx, bounds
        )

        clean_c = _color_slice(clean, cy, cx, ny, nx, f)
        clean = _color_update(
            clean, clean_c + jnp.moveaxis(jumps * accf[..., None], -1, 0),
            cy, cx, ny, nx, f,
        )

        dchi2_tot = jnp.sum(
            jnp.where(accept, dchi2, 0.0), dtype=jnp.float32
        )
        y = dchi2_tot - chi2c
        t = chi2 + y
        chi2c = (t - chi2) - y
        chi2 = t

        # --- adaptive scale (burn-in only; adapt_rate is 0 afterwards)
        log_scale = _color_update(
            log_scale,
            scale_c + adapt_rate * jnp.where(valid_c, accf - target, 0.0),
            cy, cx, ny, nx, f,
        )

        acc = acc + jnp.sum(accf, dtype=jnp.float32)
        nprop = nprop + jnp.sum(valid_c, dtype=jnp.float32)
        return (
            resid, clean, key, chi2, chi2c, log_scale, acc, nprop, adapt_rate
        ), None

    return color_step


def _lsf_apply_T_lastaxis(x: jax.Array, lsf: jax.Array) -> jax.Array:
    """out[..., l] = Σ_μ M[μ, l] · x[..., μ]  (the transpose band of
    _lsf_apply_lastaxis): out[l] = Σ_d lsf[l+half-d, d] · x[l+half-d]."""
    L = x.shape[-1]
    lw = lsf.shape[1]
    half = lw // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)])
    lsfp = jnp.pad(lsf, ((half, half), (0, 0)))
    out = jnp.zeros_like(x)
    for d in range(lw):
        s = half - d  # shift: row index l+s
        out = out + jax.lax.dynamic_slice_in_dim(
            lsfp[:, d], half + s, L
        ) * jax.lax.dynamic_slice_in_dim(xp, half + s, L, axis=-1)
    return out


def _make_gibbs_step(p: Problem):
    """One (spatial-color, λ-phase) update: exact Gaussian conditional draws
    for every voxel of the set — acceptance 1, no tuning (rebuild-only
    sampler mode; the chain targets the identical posterior as 'mh').

    Voxels at the same spaxel with λ0 offsets that are multiples of the LSF
    width have disjoint spectral footprints, so — combined with the spatial
    coloring — all draws in a set are conditionally independent and commit
    simultaneously, exactly as a sequential scan would.
    """
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    lw = int(p.lsf.shape[1])

    def gibbs_step(carry, code):
        (resid, clean, key, chi2, chi2c, log_scale, acc, nprop, adapt_rate) = carry
        color = code // lw
        clam = code % lw
        cy, cx = color // f, color % f

        valid_c = _color_slice(p.valid, cy, cx, ny, nx, f)           # [ny,nx]

        bounds = _slab_bounds(L, p.config)
        quad_c = _color_slice(p.quad, cy, cx, ny, nx, f)             # [L,ny,nx]
        lin = _chunked_lin(p, resid, cy, cx, bounds)                 # [L,ny,nx]

        # conditional N(c + linT/q, 1/q) for voxels with λ ≡ clam (mod lw)
        linT = _lsf_apply_T_lastaxis(jnp.moveaxis(lin, 0, -1), p.lsf)
        qv = jnp.moveaxis(
            _color_slice(p.qvox, cy, cx, ny, nx, f), 0, -1
        )                                                            # [ny,nx,L]
        lam_sel = (
            jnp.arange(L, dtype=jnp.int32) % lw == clam
        ).astype(linT.dtype)
        live = lam_sel * valid_c[..., None] * (qv > 0)
        key, k1 = jax.random.split(key)
        qv_safe = jnp.maximum(qv, 1e-30)
        if p.config.positivity:
            # exact one-sided truncated-normal conditional: the flat prior
            # on c' >= 0 truncates N(mu, sigma^2) at zero (VERDICT r1 #5).
            # ops/truncnorm.py inverts the log-survival function, so deeply
            # truncated voxels (|alpha| in the hundreds at high SNR) draw
            # exactly instead of saturating erf and biasing the chain.
            from .ops.truncnorm import truncated_standard_normal

            cur = jnp.moveaxis(
                _color_slice(clean, cy, cx, ny, nx, f), 0, -1
            )                                                # [ny,nx,L]
            sig = jax.lax.rsqrt(qv_safe)
            mu = cur + linT / qv_safe
            alpha = -mu / sig
            z = truncated_standard_normal(
                k1, alpha, (ny, nx, L), linT.dtype
            )
            jumps = live * (mu + sig * z - cur)
        else:
            noise = jax.random.normal(k1, (ny, nx, L), dtype=linT.dtype)
            jumps = live * (linT / qv_safe + noise * jax.lax.rsqrt(qv_safe))

        # commit (always): same separable delta machinery as MH
        g = _lsf_apply_lastaxis(jumps, p.lsf)
        dchi2 = jnp.einsum("yxl,lyx->yx", g * g, quad_c,
                           precision=jax.lax.Precision.HIGHEST) - 2.0 * (
            jnp.einsum("yxl,lyx->yx", g, lin,
                       precision=jax.lax.Precision.HIGHEST)
        )
        resid = _chunked_commit(p, resid, g, cy, cx, bounds)
        clean_c = _color_slice(clean, cy, cx, ny, nx, f)
        clean = _color_update(
            clean, clean_c + jnp.moveaxis(jumps, -1, 0), cy, cx, ny, nx, f
        )

        dchi2_tot = jnp.sum(dchi2, dtype=jnp.float32)
        y = dchi2_tot - chi2c
        t = chi2 + y
        chi2c = (t - chi2) - y
        chi2 = t

        n_upd = jnp.sum(live, dtype=jnp.float32)
        return (
            resid, clean, key, chi2, chi2c, log_scale, acc + n_upd,
            nprop + n_upd, adapt_rate,
        ), None

    return gibbs_step


def _make_block_gibbs_step(p: Problem):
    """One color update drawing every spaxel's FULL spectrum exactly.

    The conditional of spaxel s's spectrum given all others is
    N(c + A⁻¹ Mᵀ lin, A⁻¹) with banded precision A = Mᵀ diag(quad_s) M —
    drawn exactly via banded Cholesky (ops/banded.py).  One sweep therefore
    visits every spaxel once with zero λ-direction autocorrelation, which
    is what collapses the mixing time on LSF-blurred data (the single-site
    samplers random-walk along the spectral correlation).  Stationarity:
    each update is an exact conditional draw (a Gibbs kernel), and
    same-color footprints stay disjoint — the standard argument applies.
    """
    from .ops import banded

    f, ny, nx, L = p.f, p.ny, p.nx, p.L

    def block_step(carry, color):
        (resid, clean, key, chi2, chi2c, log_scale, acc, nprop, adapt_rate) = carry
        cy, cx = color // f, color % f

        valid_c = _color_slice(p.valid, cy, cx, ny, nx, f)           # [ny,nx]

        bounds = _slab_bounds(L, p.config)
        quad_c = _color_slice(p.quad, cy, cx, ny, nx, f)             # [L,ny,nx]
        lin = _chunked_lin(p, resid, cy, cx, bounds)                 # [L,ny,nx]

        # b = Mᵀ lin per spaxel; Cholesky factors precomputed in make_problem
        linT = _lsf_apply_T_lastaxis(jnp.moveaxis(lin, 0, -1), p.lsf)
        lw = int(p.lsf.shape[1])
        # masked/empty spaxels have sqrt(eps) pivots; their draws are
        # discarded by the valid mask below.
        R = jax.lax.dynamic_slice(
            p.chol.reshape(ny, f, nx, f, L, lw),
            (_i32(0), _i32(cy), _i32(0), _i32(cx), _i32(0), _i32(0)),
            (ny, 1, nx, 1, L, lw),
        ).reshape(ny, nx, L, lw)
        key, k1 = jax.random.split(key)
        noise = jax.random.normal(k1, (ny, nx, L), dtype=resid.dtype)
        jumps = banded.sample_conditional(R, linT, noise)            # δ = c'-c
        jumps = jnp.where(valid_c[..., None], jumps, 0.0)

        # commit: identical separable delta machinery as the other modes
        g = _lsf_apply_lastaxis(jumps, p.lsf)
        dchi2 = jnp.einsum("yxl,lyx->yx", g * g, quad_c,
                           precision=jax.lax.Precision.HIGHEST) - 2.0 * (
            jnp.einsum("yxl,lyx->yx", g, lin,
                       precision=jax.lax.Precision.HIGHEST)
        )
        resid = _chunked_commit(p, resid, g, cy, cx, bounds)
        clean_c = _color_slice(clean, cy, cx, ny, nx, f)
        clean = _color_update(
            clean, clean_c + jnp.moveaxis(jumps, -1, 0), cy, cx, ny, nx, f
        )

        dchi2_tot = jnp.sum(dchi2, dtype=jnp.float32)
        y = dchi2_tot - chi2c
        t = chi2 + y
        chi2c = (t - chi2) - y
        chi2 = t

        n_upd = jnp.sum(valid_c, dtype=jnp.float32) * jnp.float32(L)
        return (
            resid, clean, key, chi2, chi2c, log_scale, acc + n_upd,
            nprop + n_upd, adapt_rate,
        ), None

    return block_step


def _make_sweep(p: Problem):
    """One full Gibbs sweep: lax.scan over the update sets + trace outputs.

    'mh': f² spatial colors, one MH spectrum proposal per spaxel.
    'gibbs': f²·lw (spatial color, λ phase) sets, exact voxel draws.
    'gibbs_block': f² colors, exact whole-spectrum draws per spaxel.
    """
    if p.config.sampler == "gibbs":
        step = _make_gibbs_step(p)
        codes = jnp.arange(p.n_colors * int(p.lsf.shape[1]), dtype=jnp.int32)
    elif p.config.sampler == "gibbs_block":
        step = _make_block_gibbs_step(p)
        codes = jnp.arange(p.n_colors, dtype=jnp.int32)
    else:
        step = _make_color_step(p)
        codes = jnp.arange(p.n_colors, dtype=jnp.int32)
    validf = p.valid.astype(p.config.dtype)

    def sweep(state: SamplerState, xs):
        adapt_rate, keep = xs
        carry = (
            state.resid, state.clean, state.key, state.chi2, state.chi2_comp,
            state.log_scale, jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32), adapt_rate,
        )
        carry, _ = jax.lax.scan(step, carry, codes)
        resid, clean, key, chi2, chi2c, log_scale, acc, nprop, _ = carry

        keep_c = keep.astype(clean.dtype)
        state = SamplerState(
            clean=clean, resid=resid, key=key, chi2=chi2, chi2_comp=chi2c,
            log_scale=log_scale,
            n_accept=state.n_accept + acc,
            n_propose=state.n_propose + nprop,
            sum_clean=state.sum_clean + keep_c * clean,
            sum_sq=(
                state.sum_sq + keep_c * clean * clean
                if p.config.track_variance else state.sum_sq
            ),
            n_kept=state.n_kept + keep.astype(jnp.float32),
            sweep=state.sweep + 1,
        )
        trace = (
            chi2,
            acc / jnp.maximum(nprop, 1.0),
            jnp.sum(clean * validf[None], dtype=jnp.float32),
            clean.reshape(-1)[p.monitor_idx],
        )
        return state, trace

    return sweep


def run_sweeps(
    problem: Problem, state: SamplerState, n_sweeps: int
) -> ChainResult:
    """Run ``n_sweeps`` full Gibbs sweeps (the hot path).

    Dispatches to the fused Pallas kernels (TPU) or the pure-jnp scan — all
    produce the same ChainResult contract and sample the same posterior.

    Burn-in handling: sweeps before ``burn_in`` adapt the per-spaxel jump
    scale and are excluded from the posterior accumulators; the schedule is
    data to the scan (no recompilation at the burn-in boundary).

    With ``coarse_every`` set, a coarse-grid blocked pass (ops/coarse.py)
    runs after every ``coarse_every``-th absolute sweep — chunk boundaries
    follow the ABSOLUTE sweep counter, so any segmentation/resume applies
    the passes at identical points.

    With ``chi2_rebaseline_every`` set (auto for full-field gibbs), the
    running chi² is reset from the from-scratch FFT value at absolute-sweep
    multiples, bounding incremental f32 drift (VERDICT r3 weak #1); the
    chain itself (clean/resid/RNG) is untouched.
    """
    inner = _engine_run_sweeps
    if problem.config.chi2_rebaseline_every:
        inner = _rebaselined_engine
    if problem.config.coarse_every:
        return coarse_interleave(
            problem, state, n_sweeps, lambda s, k: inner(problem, s, k)
        )
    return inner(problem, state, n_sweeps)


def rebaseline_chi2(problem: Problem, state: SamplerState) -> SamplerState:
    """State with chi² reset to the from-scratch value (drift bound).

    Only the chi² scalar and its Kahan compensation change; the chain
    (clean cube, residual, RNG key, accumulators) is bit-untouched, so the
    sampled posterior is identical — this is bookkeeping hygiene, not a
    kernel change.
    """
    chi2 = full_chi2(problem, state).astype(jnp.float32)
    if state.clean.nbytes > 2**28:
        # huge fields: the FFT conv's multi-GB transients must complete
        # (and free) before the next segment dispatches — the async
        # tunneled backend otherwise stacks working sets (the round-2
        # OOM-by-dispatch-queue lesson).
        jax.block_until_ready(chi2)
    return dataclasses.replace(
        state, chi2=chi2, chi2_comp=jnp.zeros((), jnp.float32),
    )


def _rebaselined_engine(
    problem: Problem, state: SamplerState, n_sweeps: int
) -> ChainResult:
    return rebaseline_interleave(
        problem, state, n_sweeps,
        lambda s, k: _engine_run_sweeps(problem, s, k),
    )


def rebaseline_interleave(
    problem: Problem, state: SamplerState, n_sweeps: int, inner
) -> ChainResult:
    """Run ``inner(state, k)`` segments split at chi²-rebaseline boundaries.

    Boundaries follow the ABSOLUTE sweep counter (like coarse_interleave),
    so any segmentation — Run.run segments, checkpoint/resume, the
    full-field drive's per-cap calls — re-baselines at identical sweeps.
    Used by run_sweeps and by the chains layer's per-chain tiled loop.
    """
    every = int(problem.config.chi2_rebaseline_every)
    parts = []
    cur = state
    left = n_sweeps
    while left > 0:
        done = int(np.asarray(cur.sweep).ravel()[0])
        k = min(left, every - (done % every))
        r = inner(cur, k)
        cur = r.state
        if int(np.asarray(cur.sweep).ravel()[0]) % every == 0:
            cur = rebaseline_chi2(problem, cur)
            r = dataclasses.replace(r, state=cur)
        parts.append(r)
        left -= k
    if len(parts) == 1:
        return parts[0]
    return ChainResult(
        state=cur,
        chi2_trace=jnp.concatenate([r.chi2_trace for r in parts]),
        accept_trace=jnp.concatenate([r.accept_trace for r in parts]),
        flux_trace=jnp.concatenate([r.flux_trace for r in parts]),
        monitor_trace=jnp.concatenate([r.monitor_trace for r in parts]),
    )


#: (weakref(problem), coarse-pass constants) per (problem id, mode):
#: segmented drives (Run.run, fullfield_drive's 1-sweep segments) call
#: coarse_interleave hundreds of times, and rebuilding the constants
#: costs full-field convolutions each time; the weakref validates the
#: entry against problem-id recycling.
_COARSE_CONST_CACHE: dict = {}


def coarse_interleave(
    problem: Problem,
    state: SamplerState,
    n_sweeps: int,
    inner,
    batched: bool = False,
) -> ChainResult:
    """Run ``inner(state, k)`` segments split at coarse-pass boundaries.

    Generic composition of ANY sweep engine with the coarse pattern passes
    (ops/coarse.py): ``inner`` advances the chain ``k`` sweeps and returns a
    ``ChainResult``; this wrapper splits ``n_sweeps`` at absolute-sweep
    multiples of ``coarse_every`` and applies one coarse pass at each
    boundary, so ANY segmentation/resume applies the passes at identical
    points with identical keys.  Used by the single-device engines
    (run_sweeps), chain parallelism (chains.run_chains) and the sharded
    paths (parallel/kernel_sharded, parallel/sweep_sharded) — the sharded
    entry points hand standard-layout state across this boundary, so the
    plain-jnp coarse pass composes unchanged.

    ``batched``: state carries a leading chain axis; the coarse pass maps
    over chains (vmap normally; a serial host loop on huge per-chain states,
    where vmapping the λ-chunked in-place pass would hold every chain's
    GB-scale transients live at once).
    """
    import weakref

    from .ops.coarse import coarse_constants, coarse_pass

    cfg = problem.config
    every = int(cfg.coarse_every)
    # id() alone is unsafe as a key: a freed problem's id can be recycled
    # by a later problem of identical geometry (jit static metadata keeps
    # configs alive, so finalizers are unreliable here) — a weakref to the
    # problem itself makes the entry self-validating.
    ckey = (id(problem), cfg.coarse_mode)
    entry = _COARSE_CONST_CACHE.get(ckey)
    if entry is None or entry[0]() is not problem:
        _COARSE_CONST_CACHE[ckey] = (
            weakref.ref(problem),
            coarse_constants(problem, cfg.coarse_mode),
        )
    constants = _COARSE_CONST_CACHE[ckey][1]
    mult = float(cfg.coarse_scale)

    def one_pass(s, key):
        return coarse_pass(problem, s, constants, key, scale_mult=mult)

    def apply_pass(cur):
        if not batched:
            return one_pass(cur, jax.random.fold_in(cur.key, cur.sweep))
        sweep0 = cur.sweep[0]
        keys = jax.vmap(lambda k: jax.random.fold_in(k, sweep0))(cur.key)
        n_ch = cur.resid.shape[0]
        if cur.resid.nbytes // n_ch > 2**28:
            outs = [
                one_pass(
                    jax.tree_util.tree_map(lambda x, c=c: x[c], cur),
                    keys[c],
                )
                for c in range(n_ch)
            ]
            return jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *outs
            )
        return jax.vmap(one_pass)(cur, keys)

    axis = 1 if batched else 0
    parts = []
    cur = state
    left = n_sweeps
    while left > 0:
        done = int(np.asarray(cur.sweep).ravel()[0])
        k = min(left, every - (done % every))
        r = inner(cur, k)
        cur = r.state
        if int(np.asarray(cur.sweep).ravel()[0]) % every == 0:
            cur = apply_pass(cur)
            r = dataclasses.replace(r, state=cur)
        parts.append(r)
        left -= k
    if len(parts) == 1:
        return parts[0]
    return ChainResult(
        state=cur,
        chi2_trace=jnp.concatenate([r.chi2_trace for r in parts], axis),
        accept_trace=jnp.concatenate([r.accept_trace for r in parts], axis),
        flux_trace=jnp.concatenate([r.flux_trace for r in parts], axis),
        monitor_trace=jnp.concatenate(
            [r.monitor_trace for r in parts], axis
        ),
    )


def _engine_run_sweeps(
    problem: Problem, state: SamplerState, n_sweeps: int
) -> ChainResult:
    if problem.config.engine == "pallas":
        from .ops.pallas_sweep import pallas_run_sweeps

        return pallas_run_sweeps(problem, state, n_sweeps)
    if problem.config.engine == "pallas_tiled":
        from .ops.pallas_tiled import tiled_run_sweeps

        return tiled_run_sweeps(problem, state, n_sweeps)
    if problem.config.sampler == "direct":
        from .ops.direct import (
            PCG_WHILE_BYTES_BUDGET, _pcg_while_bytes,
            direct_run_sweeps_host,
        )

        # Full-field draws: the monolithic jitted PCG program OOMs one
        # chip's HBM (measured 18.2 GB at 300×300×3681) — run the host-
        # level draw loop with donated carries instead.  Under a trace
        # (vmapped chains) host control flow is unavailable; the jitted
        # path below handles that (and the small-problem common case).
        if (
            not isinstance(state.key, jax.core.Tracer)
            and _pcg_while_bytes(problem) > PCG_WHILE_BYTES_BUDGET
        ):
            return direct_run_sweeps_host(problem, state, n_sweeps)
    if state.resid.nbytes > 2**28:
        # Huge fields: donate the state so XLA updates the ~10 GB pytree in
        # place instead of holding input+output copies (the full MUSE field
        # OOMs 16 GB HBM otherwise).  The passed-in state is CONSUMED —
        # every production caller threads result.state forward anyway.
        return _jnp_run_sweeps_donated(problem, state, n_sweeps)
    return _jnp_run_sweeps(problem, state, n_sweeps)


def _jnp_run_sweeps_impl(
    problem: Problem, state: SamplerState, n_sweeps: int
) -> ChainResult:
    cfg = problem.config
    if cfg.sampler == "direct":
        # independent exact posterior draws (ops/direct.py) — slots into
        # the same jit/vmap/donation wrappers as the MCMC scan, so the Run
        # facade, chains layer and checkpointing all work unchanged
        from .ops.direct import direct_run_sweeps

        return direct_run_sweeps(problem, state, n_sweeps)
    sweep = _make_sweep(problem)
    idx = state.sweep + jnp.arange(n_sweeps, dtype=jnp.int32)
    burn = cfg.resolved_burn_in()
    in_burn = idx < burn
    adapt = adapt_schedule(idx, cfg)
    keep = jnp.where(
        ~in_burn & ((idx - burn) % cfg.keep_one_in == 0), 1.0, 0.0
    ).astype(jnp.float32)
    state, (chi2_t, acc_t, flux_t, mon_t) = jax.lax.scan(
        sweep, state, (adapt, keep)
    )
    return ChainResult(
        state=state, chi2_trace=chi2_t, accept_trace=acc_t, flux_trace=flux_t,
        monitor_trace=mon_t,
    )


_jnp_run_sweeps = partial(
    jax.jit, static_argnames=("n_sweeps",)
)(_jnp_run_sweeps_impl)
_jnp_run_sweeps_donated = partial(
    jax.jit, static_argnames=("n_sweeps",), donate_argnums=(1,)
)(_jnp_run_sweeps_impl)


# ---------------------------------------------------------------------------
# Host-side helpers
# ---------------------------------------------------------------------------

def full_chi2(problem: Problem, state: SamplerState) -> jax.Array:
    """Recompute chi² from scratch via the full conv path (drift check, C5).

    Above ``FULL_CHI2_CHUNK_BYTES`` of f32 cube (L·Y·X·4, the same measure
    as the other 2**28 big-field gates) this routes to the λ-chunked
    evaluation: the monolithic ``convolve_cube`` holds ~5 cube-size
    transients (spectral pad + spectral out + conv + resid on top of the
    inputs), which measured RESOURCE_EXHAUSTED on the full MUSE field with
    the tiled sampler's ~7.4 GiB standing state live — exactly the regime
    the chi²-rebaseline exists for.
    """
    p = problem
    if p.L * p.Y * p.X * 4 > FULL_CHI2_CHUNK_BYTES:
        return full_chi2_chunked(p, state)
    h = p.f // 2
    conv = cv.convolve_cube(state.clean[:, : p.Y, : p.X], p.fsf, p.lsf)
    resid = p.data_pad[:, h : h + p.Y, h : h + p.X] - conv
    w = p.w_pad[:, h : h + p.Y, h : h + p.X]
    return jnp.sum(resid * resid * w, dtype=jnp.float32)


# Same big-field threshold the coarse λ-chunking and the rebaseline auto
# rule use: a cube above this is "huge" and gets bounded-transient paths.
FULL_CHI2_CHUNK_BYTES = 2**28


def _chi2_lam_chunk(
    lsf, fsf, data_pad, w_pad, clean_padl, lo, n, h, spatial, Y, X
):
    """chi² over output λ-planes [lo, lo+n) — one bounded-size chunk.

    ``clean_padl`` is the clean cube zero-padded by the LSF half-width on
    the λ axis, so plane ``lo + s`` of it is clean plane ``lo + s − hl``
    and the 'same'-convolution edge semantics of the monolithic path are
    reproduced exactly.  Order matches convolve_cube's canonical
    ``lsf_first``: spectral stage on the slab, then the per-plane FSF.
    ``Y``/``X`` are the true field dims — data_pad carries tile padding
    beyond the h halo, so they cannot be derived from its shape.
    """
    width = int(lsf.shape[1])
    lo = jnp.asarray(lo, jnp.int32)
    slab = jax.lax.dynamic_slice_in_dim(clean_padl, lo, n + width - 1, axis=0)
    if lsf.shape[0] == 1:
        lrows = jnp.broadcast_to(lsf, (n, width))
    else:
        lrows = jax.lax.dynamic_slice_in_dim(lsf, lo, n, axis=0)
    out = jnp.zeros((n, Y, X), slab.dtype)
    for d in range(width):
        out = out + lrows[:, d, None, None] * jax.lax.slice_in_dim(
            slab, d, d + n, axis=0
        )
    if fsf.shape[0] == 1:
        frows = fsf
    else:
        frows = jax.lax.dynamic_slice_in_dim(fsf, lo, n, axis=0)
    spatial_fn = cv.apply_fsf_direct if spatial == "direct" else cv.apply_fsf
    conv = spatial_fn(out, frows)
    h32 = jnp.int32(h)
    data = jax.lax.dynamic_slice(data_pad, (lo, h32, h32), (n, Y, X))
    w = jax.lax.dynamic_slice(w_pad, (lo, h32, h32), (n, Y, X))
    resid = data - conv
    return jnp.sum(resid * resid * w, dtype=jnp.float32)


@partial(jax.jit, static_argnames=("n_chunks", "n", "h", "spatial", "Y", "X"))
def _chi2_lam_chunks_jit(
    lsf, fsf, data_pad, w_pad, clean_padl, n_chunks, n, h, spatial, Y, X
):
    """Σ of the first ``n_chunks`` equal-size λ-chunks under one fori_loop.

    One chunk's transients (~0.5 GB at chunk=256 on a 300×300 field) are
    live at a time — the loop body's buffers are reused across iterations,
    and nothing round-trips to the host between chunks.
    """

    def body(i, acc):
        return acc + _chi2_lam_chunk(
            lsf, fsf, data_pad, w_pad, clean_padl, i * n, n, h, spatial, Y, X
        )

    return jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((), jnp.float32))


@partial(jax.jit, static_argnames=("n", "h", "spatial", "Y", "X"))
def _chi2_lam_rem_jit(
    lsf, fsf, data_pad, w_pad, clean_padl, lo, n, h, spatial, Y, X
):
    return _chi2_lam_chunk(
        lsf, fsf, data_pad, w_pad, clean_padl, lo, n, h, spatial, Y, X
    )


@partial(jax.jit, static_argnames=("Y", "X", "hl"))
def _pad_clean_lam(clean, Y, X, hl):
    return jnp.pad(clean[:, :Y, :X], ((hl, hl), (0, 0), (0, 0)))


def full_chi2_chunked(
    problem: Problem, state: SamplerState, chunk: int = 256
) -> jax.Array:
    """From-scratch chi² with bounded transients (huge fields).

    Identical math to the monolithic :func:`full_chi2` (same per-plane FSF
    conv, same 'same'-padded spectral conv), evaluated over λ-chunks of
    ``chunk`` output planes; CI asserts equality against the monolithic
    path on small problems (tests/test_rebaseline.py).
    """
    p = problem
    h = p.f // 2
    hl = int(p.lsf.shape[1]) // 2
    chunk = min(int(chunk), p.L)
    # slice + λ-pad fused in one program: only the padded output buffer
    # (one cube copy) is allocated, not an intermediate for the slice
    clean_padl = _pad_clean_lam(state.clean, Y=p.Y, X=p.X, hl=hl)
    spatial = cv.resolve_spatial("auto")
    n_full, rem = divmod(p.L, chunk)
    total = _chi2_lam_chunks_jit(
        p.lsf, p.fsf, p.data_pad, p.w_pad, clean_padl,
        n_chunks=n_full, n=chunk, h=h, spatial=spatial, Y=p.Y, X=p.X,
    )
    if rem:
        total = total + _chi2_lam_rem_jit(
            p.lsf, p.fsf, p.data_pad, p.w_pad, clean_padl,
            jnp.int32(n_full * chunk),
            n=rem, h=h, spatial=spatial, Y=p.Y, X=p.X,
        )
    return total


def posterior_mean(problem: Problem, state: SamplerState) -> jax.Array:
    """Posterior-mean clean cube [L, Y, X] from the accumulators."""
    p = problem
    mean = state.sum_clean / jnp.maximum(state.n_kept, 1.0)
    return mean[:, : p.Y, : p.X]


def posterior_std(problem: Problem, state: SamplerState) -> jax.Array:
    p = problem
    if not p.config.track_variance:
        raise ValueError(
            "posterior std unavailable: the run used track_variance=False"
        )
    n = jnp.maximum(state.n_kept, 1.0)
    mean = state.sum_clean / n
    var = jnp.maximum(state.sum_sq / n - mean * mean, 0.0)
    return jnp.sqrt(var)[:, : p.Y, : p.X]
