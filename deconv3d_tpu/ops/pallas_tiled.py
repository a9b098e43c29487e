"""Tiled fused-sweep Pallas kernel — full-field TPU hot path (C10).

The whole-cube kernel (ops/pallas_sweep.py) keeps the padded residual
VMEM-resident, which caps the geometry at roughly a MUSE subcube.  This
module removes the cap: the residual and weights live in HBM and each
spatial *tile* (a ``ny_t × nx_t`` block-grid window plus its f−1 halo) is
DMA'd into VMEM, swept through all f² colors in on-chip memory, and written
back — one read + one write of the cube per sweep instead of one per color,
which is what makes a 300×300×3681 MUSE field tractable (BASELINE config #4;
the jnp fallback measured 0.032 sweeps/s in round 2, VERDICT r1 missing #1).

Correctness of the tiling (why this samples the same posterior):

* Within one color, same-color spaxels have disjoint likelihood patches by
  construction (stride = footprint), so splitting them across tiles changes
  nothing.
* Across colors/tiles, the scan is a fixed sequential order over
  (tile, color) single-site MH kernels.  Tiles are processed in raster
  order with strictly serialized window DMA: a tile's window (owned rows
  + f−1 halo rows/cols) is read after every earlier tile's write-back
  completed, so each proposal's linear term sees every previously committed
  update — exactly the condition for a valid MH-within-Gibbs scan.  The
  *visit order* differs from the whole-cube kernel (tile-major instead of
  color-major over the field), which is a different but equally valid fixed
  scan; both chains target the identical stationary distribution.
* Window write-backs include halo/alignment slack columns the tile never
  modified; those retain the values read at window start, and raster order
  guarantees no other tile wrote them in between, so the write-back is
  lossless.

Mosaic constraints (inherited from the whole-cube kernel, plus one new):
  * HBM→VMEM window DMA offsets/extents on the sublane (x) dim must respect
    the bf16 tile (16): windows start at 16-aligned columns with 16-multiple
    widths, and an in-register ``pltpu.roll`` absorbs the (tile base +
    color) misalignment in one positive dynamic shift.
  * λ lives on lanes (padded to 128); per-color lookups are one-hot
    contractions; no negative dynamic roll shifts.

Sampler modes: 'mh' (Cauchy proposal + branchless accept) and 'gibbs'
(exact per-voxel Gaussian conditionals, acceptance 1).  The gibbs λ-phase
loop runs as a ``lax.fori_loop`` purely in row space — the linear term
updates incrementally (lin ← lin − g·quad) so the slab is still read and
written once per color, and compile size stays O(lw) (the whole-cube
kernel's static unroll is O(lw²), which is what kept gibbs off this engine
in round 2).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import sampler as sm
from . import pallas_sweep as _ps
from .pallas_sweep import (
    _assemble,
    _CAUCHY_CLIP,
    _LANE,
    _pad_lanes,
    _round8,
)


def _round16(n: int) -> int:
    return -(-n // 16) * 16


def _pad_lanes_of(L: int) -> int:
    """Public alias for make_problem's quad pre-relayout."""
    return _pad_lanes(L)


def tile_geometry(f: int, ny_t: int, nx_t: int):
    """Window geometry for one tile.

    BY/BX: the tile's color-slab extent (ny_t·f rows, nx_t·f cols).
    W8:    aligned read width covering any in-window shift in [0, 8).
    S8MAX: largest 8-aligned read start (16-align slack [0,16) plus color
           offset cx ∈ [0,f)).
    Hp_t/Wpa_t: the full VMEM window (owned + halo + alignment slack);
           Wpa_t is a 16-multiple so bf16 window DMAs stay tile-aligned.
    """
    BY, BX = ny_t * f, nx_t * f
    W8 = _round8(BX + 8)
    S8MAX = 8 * ((f - 1 + 15) // 8)
    Wpa_t = _round16(S8MAX + W8)
    Hp_t = BY + f - 1
    return BY, BX, W8, Wpa_t, Hp_t


def tiled_vmem_bytes(f: int, ny_t: int, nx_t: int, L: int, lw: int,
                     S: int = 8, n_tiles: int = 1,
                     gibbs: bool = False) -> int:
    """VMEM working-set estimate for the tiled kernel at this tile size."""
    BY, BX, W8, Wpa_t, Hp_t = tile_geometry(f, ny_t, nx_t)
    Lp = _pad_lanes(L)
    nij = ny_t * nx_t
    nij8 = _round8(nij)
    n_colors = f * f
    window = Hp_t * Wpa_t * Lp * (4 + 2)          # f32 resid + bf16 w
    body_temps = 16 * nij * Lp * 4
    slab_temps = 12 * BY * W8 * _LANE * 4
    banks = S * (BY * W8 + Lp) * 4 + lw * Lp * 4
    ls_valid = 2 * n_tiles * nij8 * n_colors * 4
    blocks = 2 * (2 + 1) * nij * Lp * 4           # quad + dclean, 2×-buffered
    if gibbs:
        # qvox blocks (2×-buffered) + the phase loop's extra row-space
        # carries/temporaries (lin/gacc/emitted/normal/linT/jumps/g, f32)
        blocks += 2 * 2 * nij * Lp * 4 + 8 * nij8 * Lp * 4
    return window + body_temps + slab_temps + banks + ls_valid + blocks


def _divisors(n: int):
    return [d for d in range(1, n + 1) if n % d == 0]


def plan_tiles(f: int, ny: int, nx: int, L: int, lw: int,
               S: int = 8, budget: int | None = None,
               gibbs: bool = False):
    """Pick (ny_t, nx_t) maximizing spaxels per color step under VMEM budget.

    Returns None when no tiling fits (pathologically large L·f²).  Among
    feasible tilings with the same spaxel count, prefers the least total
    window volume (least halo/alignment overhead → least DMA traffic).
    """
    budget = _ps.VMEM_BUDGET_BYTES if budget is None else budget
    Lp = _pad_lanes(L)
    best = None
    for ny_t in _divisors(ny):
        for nx_t in _divisors(nx):
            n_tiles = (ny // ny_t) * (nx // nx_t)
            need = tiled_vmem_bytes(f, ny_t, nx_t, L, lw, S, n_tiles,
                                    gibbs=gibbs)
            if need > budget:
                continue
            _, _, _, Wpa_t, Hp_t = tile_geometry(f, ny_t, nx_t)
            volume = n_tiles * Hp_t * Wpa_t * Lp
            key = (ny_t * nx_t, -volume)
            if best is None or key > best[0]:
                best = (key, (ny_t, nx_t))
    return None if best is None else best[1]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _make_tiled_kernel(*, f, ny_t, nx_t, n_ty, n_tx, L, Lp, lw, S, target,
                       mode="mh", y_base=0, chunk=_LANE):
    """Sweep kernel over a (sweeps, tile_y, tile_x, colors) grid.

    Grid order (colors fastest, tiles raster, sweeps outermost) + strictly
    serialized window DMA give the sequential-scan semantics documented in
    the module docstring.

    ``mode='gibbs'`` replaces the MH proposal/accept with exact per-voxel
    Gaussian conditional draws, visiting all ``lw`` λ-phases of the color in
    one slab visit: the linear term updates incrementally in row space
    (lin ← lin − g·quad, exact) inside a ``lax.fori_loop`` over phases, so
    the slab is still read once and written once per color AND the compile
    size stays O(lw) instead of the whole-cube kernel's O(lw²) unroll —
    which is what makes exact-Gibbs viable at full-field λ (VERDICT r2
    next #1).
    """
    nij = ny_t * nx_t
    nij8 = _round8(nij)
    BY, BX, W8, Wpa_t, Hp_t = tile_geometry(f, ny_t, nx_t)
    half = lw // 2
    n_chunks = Lp // chunk
    n_colors = f * f

    def kernel(
        seed_ref, sweep0_ref, adapt_ref, btile_ref, m2t_ref, spec_ref,
        lsfT_ref, valid_ref, ls_in_ref, quadc_ref, qvoxc_ref, resid_hbm,
        w_hbm,
        dclean_ref, accn_ref, dchia_ref, resid_out_hbm, ls_ref,
        resid_vmem, w_vmem, sem_r, sem_w, sem_o,
    ):
        s = pl.program_id(0)
        ty = pl.program_id(1)
        tx = pl.program_id(2)
        c = pl.program_id(3)

        # window top (any align); y_base lets a sub-grid of block-rows ride
        # inside a larger HBM window buffer (kernel_sharded's edge phases)
        y0 = y_base + ty * BY
        xoff = tx * BX
        x16 = pl.multiple_of(16 * (xoff // 16), 16)   # window left (bf16 tile)
        tb = xoff - x16                               # in [0, 16)

        @pl.when((s == 0) & (ty == 0) & (tx == 0) & (c == 0))
        def _copy_ls():
            ls_ref[:, :] = ls_in_ref[:, :]

        @pl.when(c == 0)
        def _load_window():
            cp_r = pltpu.make_async_copy(
                resid_hbm.at[pl.ds(y0, Hp_t), pl.ds(x16, Wpa_t), :],
                resid_vmem, sem_r,
            )
            cp_w = pltpu.make_async_copy(
                w_hbm.at[pl.ds(y0, Hp_t), pl.ds(x16, Wpa_t), :],
                w_vmem, sem_w,
            )
            cp_r.start()
            cp_w.start()
            cp_r.wait()
            cp_w.wait()

        cy = c // f
        cx = c % f
        a = tb + cx
        start8 = pl.multiple_of(8 * (a // 8), 8)
        sh = a - start8                               # in [0, 8)
        tile = ty * n_tx + tx

        # ------- per-color lookups (one-hot over the color lane axis) ------
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (1, n_colors), 1) == c
        ).astype(jnp.float32)                         # [1, n_colors]
        ls_rows = ls_ref[pl.ds(tile * nij8, nij8), :]          # [nij8, ncol]
        v_rows = valid_ref[pl.ds(tile * nij8, nij8), :]
        # All row-space work runs at nij8 = round8(nij) rows: Mosaic cannot
        # lower lane-reductions whose output is a 1-element vector (the
        # nij=1 single-spaxel-tile case), and the pad rows are inert anyway
        # (vmask8 = 0 there → zero jumps, zero Δchi², no commits).
        ls_c = jnp.sum(ls_rows * onehot, axis=1, keepdims=True)   # [nij8, 1]
        vmask = jnp.sum(v_rows * onehot, axis=1, keepdims=True)

        # ------- RNG: one stream per (ABSOLUTE sweep, tile, color) ---------
        # The stream is keyed by the absolute sweep counter (sweep0 + s)
        # with a per-chain seed that never advances, so ANY segmentation of
        # a run — including checkpoint/resume — replays bit-identically.
        # The indices are mixed as TWO seed words (Mosaic's limit): the
        # absolute sweep rides word 1 (offset by the chain seed), the
        # (tile, color) pair — bounded by n_tiles·f² ≪ 2³¹ — rides word 2.
        # Streams stay unique for ANY run length; the previous
        # single-product form wrapped at ~92k full-field sweeps (ADVICE r2).
        pltpu.prng_seed(
            seed_ref[0] + sweep0_ref[0] + s,
            (ty * n_tx + tx) * n_colors + c,
        )

        def uniforms():
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((nij8, Lp)), jnp.uint32
            )
            # top 24 bits → int32 (positive) → f32: no uint32→f32 in Mosaic
            return pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32).astype(
                jnp.float32
            ) * jnp.float32(2.0**-24) + jnp.float32(2.0**-25)

        lam_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (nij8, Lp), 1) < L
        ).astype(jnp.float32)

        def lsf_apply(v):
            vp = jnp.pad(v, ((0, 0), (lw, lw)))
            out = jnp.zeros((nij8, Lp), jnp.float32)
            for d in range(lw):
                out = out + lsfT_ref[d, :] * vp[
                    :, lw + d - half : lw + d - half + Lp
                ]
            return out

        # ------- pass 1: lin[ij, λ] = Σ_s spec·(pattern-pooled resid·w) ----
        quad_c = jnp.pad(
            quadc_ref[:, :, :].reshape(nij, Lp), ((0, nij8 - nij), (0, 0))
        )
        bt_w = [
            pltpu.roll(btile_ref[si, :, :, :], sh, axis=1)     # [BY, W8, 1]
            for si in range(S)
        ]
        m2t_w = pltpu.roll(m2t_ref[:, :], sh, axis=0)          # [W8, nx_t]
        xmask = [m2t_w[:, j : j + 1] for j in range(nx_t)]
        lin_parts = []
        for k in range(n_chunks):
            lo = k * chunk
            rsl = resid_vmem[
                pl.ds(cy, BY), pl.ds(start8, W8), pl.ds(lo, chunk)
            ]                                                  # [BY, W8, ck]
            wsl = w_vmem[pl.ds(cy, BY), pl.ds(start8, W8), pl.ds(lo, chunk)]
            rw = rsl * wsl.astype(jnp.float32)
            spec_c = spec_ref[:, pl.ds(lo, chunk)]             # [S, ck]
            lin_c = jnp.zeros((nij8, chunk), jnp.float32)
            for si in range(S):
                t = rw * bt_w[si]                              # [BY, W8, ck]
                tsum = t.reshape(ny_t, f, W8, chunk).sum(axis=1)
                pooled = jnp.pad(
                    jnp.stack(
                        [
                            jnp.sum(tsum * xmask[j][None], axis=1)  # [ny_t,ck]
                            for j in range(nx_t)
                        ],
                        axis=1,
                    ).reshape(nij, chunk),
                    ((0, nij8 - nij), (0, 0)),
                )
                lin_c = lin_c + spec_c[si] * pooled
            lin_parts.append(lin_c)
        lin = jnp.concatenate(lin_parts, axis=1)               # [nij8, Lp]

        if mode == "mh":
            # ------- MH: Cauchy spectrum proposal + branchless accept ------
            u = uniforms()
            draw = jnp.clip(
                jnp.tan(jnp.float32(np.pi) * (u - 0.5)),
                -_CAUCHY_CLIP, _CAUCHY_CLIP,
            )
            jumps = jnp.exp(ls_c) * draw * vmask * lam_ok      # [nij8, Lp]
            g = lsf_apply(jumps)
            dchi_vec = g * g * quad_c - 2.0 * g * lin
            dchi = jnp.sum(dchi_vec, axis=1, keepdims=True)    # [nij8, 1]
            u2 = uniforms()
            accf = jnp.where(
                (jnp.log(u2[:, 0:1]) < -0.5 * dchi) & (vmask > 0), 1.0, 0.0
            )                                                  # [nij8, 1]
            gacc = g * accf
            emitted = jumps * accf
            acc_out = jnp.sum(accf, axis=0, keepdims=True)     # [1, 1]
            dchi_out = jnp.sum(dchi * accf, axis=0, keepdims=True)
        else:
            # ------- exact Gibbs: all lw λ-phases in one slab visit --------
            # The phase loop runs entirely in row space; the commit below
            # consumes the accumulated gacc exactly as in MH mode, so the
            # slab traffic is identical.  (Same math as the whole-cube
            # kernel's gibbs branch, ops/pallas_sweep.py, but fori_loop'd.)
            qv = jnp.pad(
                qvoxc_ref[:, :, :].reshape(nij, Lp),
                ((0, nij8 - nij), (0, 0)),
            )
            u1 = uniforms()
            u2 = uniforms()
            normal = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                jnp.float32(2.0 * np.pi) * u2
            )
            lam_idx = jax.lax.broadcasted_iota(jnp.int32, (nij8, Lp), 1)
            qv_safe = jnp.maximum(qv, jnp.float32(1e-30))
            live_all = vmask * lam_ok * jnp.where(qv > 0, 1.0, 0.0)
            lsfTp = jnp.pad(lsfT_ref[:, :], ((0, 0), (lw, lw)))

            def phase_body(ph, carry):
                lin, gacc, emitted, acc_s, dchi_s = carry
                sel = jnp.where(lam_idx % lw == ph, 1.0, 0.0) * live_all
                # linT[l] = Σ_μ M[μ,l]·lin[μ] (transpose band)
                lp = jnp.pad(lin, ((0, 0), (lw, lw)))
                linT = jnp.zeros((nij8, Lp), jnp.float32)
                for d in range(lw):
                    off = lw + half - d
                    linT = linT + lsfTp[d, off : off + Lp] * lp[
                        :, off : off + Lp
                    ]
                jumps_ph = sel * (
                    linT / qv_safe + normal * jax.lax.rsqrt(qv_safe)
                )
                g_ph = lsf_apply(jumps_ph)
                dchi_s = dchi_s + jnp.sum(
                    g_ph * g_ph * quad_c - 2.0 * g_ph * lin
                )
                lin = lin - g_ph * quad_c       # exact same-spaxel update
                gacc = gacc + g_ph
                emitted = emitted + jumps_ph
                acc_s = acc_s + jnp.sum(sel)
                return (lin, gacc, emitted, acc_s, dchi_s)

            lin, gacc, emitted, acc_out, dchi_out = jax.lax.fori_loop(
                0, lw, phase_body,
                (
                    lin,
                    jnp.zeros((nij8, Lp), jnp.float32),
                    jnp.zeros((nij8, Lp), jnp.float32),
                    jnp.zeros((1, 1), jnp.float32),
                    jnp.zeros((1, 1), jnp.float32),
                ),
            )

        # ------- commit: expand deltas into window coords, subtract --------
        for k in range(n_chunks):
            lo = k * chunk
            spec_c = spec_ref[:, pl.ds(lo, chunk)]
            gacc_c = jax.lax.slice_in_dim(gacc, lo, lo + chunk, axis=1)
            delta_wide = jnp.zeros((BY, W8, chunk), jnp.float32)
            for si in range(S):
                gs = (spec_c[si] * gacc_c[:nij]).reshape(ny_t, nx_t, chunk)
                eb = sum(
                    xmask[j][None] * gs[:, j : j + 1, :]       # [ny_t,W8,ck]
                    for j in range(nx_t)
                )
                ebig = jnp.concatenate([eb] * f, axis=1).reshape(
                    ny_t, f, W8, chunk
                ).reshape(BY, W8, chunk)
                delta_wide = delta_wide + ebig * bt_w[si]
            cur = resid_vmem[
                pl.ds(cy, BY), pl.ds(start8, W8), pl.ds(lo, chunk)
            ]
            resid_vmem[
                pl.ds(cy, BY), pl.ds(start8, W8), pl.ds(lo, chunk)
            ] = cur - delta_wide

        # ------- outputs + adaptive scale -----------------------------------
        dclean_ref[0, 0, 0, :, :] = emitted[:nij]
        accn_ref[0, 0, 0, :, :] = acc_out
        dchia_ref[0, 0, 0, :, :] = dchi_out
        if mode == "mh":
            new_ls = ls_c + adapt_ref[s, 0] * (accf - target) * vmask
            ls_ref[pl.ds(tile * nij8, nij8), :] = jnp.where(
                onehot > 0, new_ls, ls_rows
            )

        @pl.when(c == n_colors - 1)
        def _store_window():
            cp = pltpu.make_async_copy(
                resid_vmem,
                resid_out_hbm.at[pl.ds(y0, Hp_t), pl.ds(x16, Wpa_t), :],
                sem_o,
            )
            cp.start()
            cp.wait()     # serialize: next tile reads rows this tile wrote

    return kernel


# ---------------------------------------------------------------------------
# Host-facing wrapper: one kernel segment
# ---------------------------------------------------------------------------

def _tile_split(problem: sm.Problem):
    ny_t, nx_t = problem.config.tile  # planned in make_problem
    return ny_t, nx_t, problem.ny // ny_t, problem.nx // nx_t


@functools.partial(
    jax.jit, static_argnames=("n_sweeps", "y_base"), donate_argnums=(1,)
)
def _tiled_segment_arrays(problem: sm.Problem, carry, adapt, seed, sweep0,
                          n_sweeps: int, y_base: int = 0):
    """Run one pallas_call of ``n_sweeps`` tiled sweeps; raw per-step outputs.

    ``carry`` = (resid_k [Hp, Wpa_g, Lp] f32, w_k same bf16, ls_k
    [n_tiles·nij8, n_colors]); the carry is donated and resid_k is aliased
    through the kernel (read + written in place via window DMA).  ``seed``
    is the run-constant per-chain seed, ``sweep0`` the absolute sweep index
    of the segment start (see the kernel's RNG note).  ``y_base`` offsets
    every window read/write by that many rows — the problem's block-row
    grid then covers rows [y_base, y_base + ny·f + f−1) of a LARGER carry
    buffer (kernel_sharded's per-phase sub-grids).
    """
    p = problem
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    Lp = _pad_lanes(L)
    lw = int(p.lsf.shape[1])
    S = int(p.fsf_spec.shape[0])
    n_colors = f * f
    ny_t, nx_t, n_ty, n_tx = _tile_split(p)
    n_tiles = n_ty * n_tx
    nij_t = ny_t * nx_t
    BY, BX, W8, Wpa_t, Hp_t = tile_geometry(f, ny_t, nx_t)
    interpret = jax.default_backend() != "tpu"

    resid_k, w_k, ls_k = carry

    # tile-local FSF patterns (window coordinates, pre-roll)
    imgs = p.fsf_imgs.astype(jnp.float32)                      # [S, f, f]
    btile = jnp.tile(imgs, (1, ny_t, nx_t))                    # [S, BY, BX]
    btile = jnp.pad(btile, ((0, 0), (0, 0), (0, W8 - BX)))[..., None]
    xs = np.arange(W8)
    m2t = jnp.asarray(
        ((xs[:, None] // f) == np.arange(nx_t)[None, :]) & (xs[:, None] < BX),
        dtype=jnp.float32,
    )                                                          # [W8, nx_t]
    spec = jnp.zeros((S, Lp), jnp.float32).at[:, :L].set(
        p.fsf_spec.astype(jnp.float32)
    )
    lsfT = jnp.zeros((lw, Lp), jnp.float32).at[:, :L].set(
        p.lsf.T.astype(jnp.float32)
    )
    valid_k = _tiled_color_layout(
        p.valid.astype(jnp.float32), ny, nx, f, ny_t, nx_t
    )
    quad_k = p.quad_tiled.astype(jnp.float32)  # pre-relayouted in make_problem
    mode = p.config.sampler
    # in MH mode the qvox operand is the quad array itself (same buffer
    # passed twice — the kernel never reads it), so no HBM is wasted.
    qvox_k = (
        p.qvox_tiled.astype(jnp.float32) if mode == "gibbs" else quad_k
    )

    kernel = _make_tiled_kernel(
        f=f, ny_t=ny_t, nx_t=nx_t, n_ty=n_ty, n_tx=n_tx, L=L, Lp=Lp, lw=lw,
        S=S, target=float(p.config.target_acceptance), mode=mode,
        y_base=y_base,
    )
    out_shapes = (
        jax.ShapeDtypeStruct(
            (n_sweeps, n_colors, n_tiles, nij_t, Lp), jnp.float32
        ),
        jax.ShapeDtypeStruct((n_sweeps, n_colors, n_tiles, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_sweeps, n_colors, n_tiles, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct(resid_k.shape, jnp.float32),
        jax.ShapeDtypeStruct(ls_k.shape, jnp.float32),
    )
    grid = (n_sweeps, n_ty, n_tx, n_colors)
    dclean, accn, dchia, resid_out, ls_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # sweep0
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # adapt
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # btile
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # m2t
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # spec
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # lsfT
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # valid
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # ls_in
            pl.BlockSpec(                                          # quad
                (1, 1, nij_t * Lp),
                lambda s, ty, tx, c: (c * n_tiles + ty * n_tx + tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(                                          # qvox
                (1, 1, nij_t * Lp),
                lambda s, ty, tx, c: (c * n_tiles + ty * n_tx + tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),                  # resid
            pl.BlockSpec(memory_space=pltpu.ANY),                  # w
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, 1, nij_t, Lp),
                lambda s, ty, tx, c: (s, c, ty * n_tx + tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 1, 1),
                lambda s, ty, tx, c: (s, c, ty * n_tx + tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 1, 1),
                lambda s, ty, tx, c: (s, c, ty * n_tx + tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),                  # resid_out
            pl.BlockSpec(memory_space=pltpu.VMEM),                 # ls_out
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((Hp_t, Wpa_t, Lp), jnp.float32),
            pltpu.VMEM((Hp_t, Wpa_t, Lp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # resid_k (input 11) is read AND written through window DMA — alias
        # it onto the resid_out output so both refs are one HBM buffer.
        input_output_aliases={11: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_ps.VMEM_BUDGET_BYTES,
        ),
        interpret=interpret,
    )(
        jnp.reshape(seed, (1,)).astype(jnp.int32),
        jnp.reshape(sweep0, (1,)).astype(jnp.int32),
        adapt.astype(jnp.float32).reshape(n_sweeps, 1),
        btile, m2t, spec, lsfT, valid_k, ls_k, quad_k, qvox_k, resid_k, w_k,
    )

    # tiled raw -> per-sweep clean-increment cubes in ONE transpose
    # (HBM: a full-field dclean is 1.4 GB/sweep; going through the global
    # flat layout would hold a second copy)
    dclean_cube = (
        dclean.reshape(n_sweeps, f, f, n_ty, n_tx, ny_t, nx_t, Lp)
        .transpose(0, 7, 3, 5, 1, 4, 6, 2)   # [K, Lp, n_ty, ny_t, f, ...]
        .reshape(n_sweeps, Lp, ny * f, nx * f)[:, :L]
    )
    accn_g = jnp.sum(accn, axis=(2, 3, 4))                    # [K, ncol]
    dchia_g = jnp.sum(dchia, axis=(2, 3, 4))
    return (resid_out, w_k, ls_out), (dclean_cube, accn_g, dchia_g)


# ---------------------------------------------------------------------------
# Layout shuffles
# ---------------------------------------------------------------------------

def _tiled_color_layout(arr_yx, ny, nx, f, ny_t, nx_t):
    """[Yc, Xc] -> [n_tiles·nij8, f²]: row = tile-major spaxel, lane = color.

    Spaxel rows inside a tile are padded to a multiple of 8 so the kernel's
    dynamic row-slices stay sublane-aligned; pad rows are zero (never valid).
    """
    n_ty, n_tx = ny // ny_t, nx // nx_t
    nij = ny_t * nx_t
    nij8 = _round8(nij)
    t = (
        arr_yx.reshape(n_ty, ny_t, f, n_tx, nx_t, f)
        .transpose(0, 3, 1, 4, 2, 5)          # [n_ty, n_tx, ny_t, nx_t, f, f]
        .reshape(n_ty * n_tx, nij, f * f)
    )
    t = jnp.pad(t, ((0, 0), (0, nij8 - nij), (0, 0)))
    return t.reshape(n_ty * n_tx * nij8, f * f)


def _tiled_color_unlayout(arr, ny, nx, f, ny_t, nx_t):
    """Inverse of _tiled_color_layout: -> global color layout [nij, f²]."""
    n_ty, n_tx = ny // ny_t, nx // nx_t
    nij = ny_t * nx_t
    nij8 = _round8(nij)
    t = arr.reshape(n_ty * n_tx, nij8, f * f)[:, :nij]
    return (
        t.reshape(n_ty, n_tx, ny_t, nx_t, f * f)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ny * nx, f * f)
    )


def tiled_quad_layout(quad_lyx, ny, nx, f, ny_t, nx_t, L, Lp):
    """[L, Yc, Xc] -> [f²·n_tiles, 1, nij_t·Lp] (block per (color, tile)).

    The (color, tile) pair is flattened into the leading (untiled) dim so
    per-step blocks need no sublane-dim offsets.
    """
    n_ty, n_tx = ny // ny_t, nx // nx_t
    q = jnp.pad(quad_lyx, ((0, Lp - L), (0, 0), (0, 0)))
    return (
        q.reshape(Lp, n_ty, ny_t, f, n_tx, nx_t, f)
        .transpose(3, 6, 1, 4, 2, 5, 0)  # [f, f, n_ty, n_tx, ny_t, nx_t, Lp]
        .reshape(f * f * n_ty * n_tx, 1, ny_t * nx_t * Lp)
    )


def untiled_quad_layout(qt, ny, nx, f, ny_t, nx_t, L, Lp):
    """Inverse of :func:`tiled_quad_layout`: -> cube layout [L, Yc, Xc].

    Lets consumers that need the cube-layout quad (kernel_sharded's band
    stacks) recover it from a tiled problem by a pure relayout instead of
    re-running the depthwise weight convolution.
    """
    n_ty, n_tx = ny // ny_t, nx // nx_t
    q = qt.reshape(f, f, n_ty, n_tx, ny_t, nx_t, Lp)
    return (
        q.transpose(6, 2, 4, 0, 3, 5, 1)   # [Lp, n_ty, ny_t, f, n_tx, nx_t, f]
        .reshape(Lp, ny * f, nx * f)[:L]
    )


def _cube_to_window_layout(arr_lyx, Wpa_g, Lp):
    """[L, Hp, Wp] -> [Hp, Wpa_g, Lp] (λ on lanes, x padded to window grid)."""
    L, Hp, Wp = arr_lyx.shape
    out = jnp.moveaxis(arr_lyx, 0, -1)                  # [Hp, Wp, L]
    return jnp.pad(out, ((0, 0), (0, Wpa_g - Wp), (0, Lp - L)))


def global_window_width(f: int, nx: int, nx_t: int) -> int:
    """Global padded x extent: the last tile's 16-aligned window must fit."""
    _, BX, _, Wpa_t, _ = tile_geometry(f, ny_t=1, nx_t=nx_t)
    n_tx = nx // nx_t
    x16_last = 16 * (((n_tx - 1) * BX) // 16)
    return x16_last + Wpa_t


# ---------------------------------------------------------------------------
# Segment cap + public entry
# ---------------------------------------------------------------------------

def _max_segment(problem: sm.Problem) -> int:
    """Sweeps per pallas_call, bounded by the dclean HBM stream (~2.5 GB)."""
    p = problem
    Lp = _pad_lanes(p.L)
    per_sweep = p.f * p.f * p.ny * p.nx * Lp * 4
    return max(1, min(64, int(2.5e9 // max(per_sweep, 1))))


def _prep_carry_impl(problem: sm.Problem, resid, log_scale):
    p = problem
    Lp = _pad_lanes(p.L)
    _, nx_t = p.config.tile
    Wpa_g = global_window_width(p.f, p.nx, nx_t)
    return (
        _cube_to_window_layout(resid.astype(jnp.float32), Wpa_g, Lp),
        # w_pad is stored bf16 for this engine — relayout stays in bf16
        _cube_to_window_layout(p.w_pad, Wpa_g, Lp).astype(jnp.bfloat16),
        _tiled_color_layout(
            log_scale.astype(jnp.float32), p.ny, p.nx, p.f, *p.config.tile
        ),
    )


_prep_carry = jax.jit(_prep_carry_impl)
# huge fields: the window relayout would otherwise hold input + output
# copies of a GB-scale residual (same convention as sampler.run_sweeps —
# the passed-in state is CONSUMED on big problems)
_prep_carry_donated = jax.jit(_prep_carry_impl, donate_argnums=(1,))


def tiled_run_sweeps(
    problem: sm.Problem, state: sm.SamplerState, n_sweeps: int
) -> sm.ChainResult:
    """Drop-in run_sweeps for engine='pallas_tiled' (full-field TPU path).

    Segments are capped by the dclean HBM stream.  RNG streams are indexed
    by the absolute sweep counter with a run-constant per-chain seed, so
    any segmentation (including checkpoint/resume) is bit-exact.  On big
    problems (resid > 256 MB) the input state's residual is donated into
    the window layout — the passed-in state is consumed, as in the jnp
    engine's huge-field path.
    """
    p = problem
    cfg = p.config
    seg_cap = _max_segment(p)
    if state.clean.nbytes > 2**28 and n_sweeps > seg_cap:
        # Huge fields: full state round-trips per segment.  Carrying the
        # window layout across an in-call segment loop keeps enough extra
        # working sets live on the async backend to OOM a ~7 GiB-standing
        # full-field run; the per-call pattern is measured bounded (and the
        # extra relayout costs ~10% of a 0.5 s full-field sweep).
        parts = []
        cur = state
        left = n_sweeps
        while left > 0:
            k = min(seg_cap, left)
            r = tiled_run_sweeps(p, cur, k)
            jax.block_until_ready(r.state.chi2)
            cur = r.state
            parts.append(r)
            left -= k
        return sm.ChainResult(
            state=cur,
            chi2_trace=jnp.concatenate([r.chi2_trace for r in parts]),
            accept_trace=jnp.concatenate([r.accept_trace for r in parts]),
            flux_trace=jnp.concatenate([r.flux_trace for r in parts]),
            monitor_trace=jnp.concatenate(
                [r.monitor_trace for r in parts]
            ),
        )
    prep = (
        _prep_carry_donated if state.resid.nbytes > 2**28 else _prep_carry
    )
    carry = prep(p, state.resid, state.log_scale)
    # Run-constant per-chain seed: the key never advances under this engine
    # (streams are indexed by absolute sweep instead), so any segmentation —
    # including checkpoint/resume — replays the chain bit-exactly.
    seed = jax.random.randint(
        jax.random.fold_in(state.key, 17), (), 0, np.int32(2**31 - 1)
    ).astype(jnp.int32)
    parts = []
    left = n_sweeps
    cur_state = state
    while left > 0:
        k = min(seg_cap, left)
        ids = cur_state.sweep + jnp.arange(k, dtype=jnp.int32)
        adapt = sm.adapt_schedule(ids, cfg)
        carry, raw = _tiled_segment_arrays(
            p, carry, adapt, seed, cur_state.sweep, k
        )
        r = _assemble_tiled(p, cur_state, k, carry, raw, final=(left == k))
        cur_state = r.state
        parts.append(r)
        left -= k
        if cur_state.clean.nbytes > 2**28:
            # Serialize segment execution on huge fields: an unbounded
            # dispatch queue lets the runtime keep several segments'
            # working sets live at once (the async/tunneled backend defers
            # execution), which OOMs a ~7 GiB-standing full-field run.
            # The sync point is a scalar; segments are ~0.5 s.
            jax.block_until_ready(cur_state.chi2)
    if len(parts) == 1:
        return parts[0]
    return sm.ChainResult(
        state=cur_state,
        chi2_trace=jnp.concatenate([r.chi2_trace for r in parts]),
        accept_trace=jnp.concatenate([r.accept_trace for r in parts]),
        flux_trace=jnp.concatenate([r.flux_trace for r in parts]),
        monitor_trace=jnp.concatenate([r.monitor_trace for r in parts]),
    )


def _assemble_tiled_impl(problem, state, resid_k, ls_k, raw, n_sweeps,
                         final):
    """Adapt tiled raw outputs to the whole-cube kernel's _assemble contract
    (leading chain axis of 1; _assemble slices the window layout's padded
    x/λ off via [:, :Wp, :L]).  Jitted: the [None] expansions and squeezes
    must not materialise eager copies of the GB-scale accumulators.

    ``final=False`` (internal segments of one run_sweeps call) skips the
    residual-cube reconstruction — the carry stays in window layout and the
    intermediate state's resid is never consumed, so a full-field segment
    would otherwise waste a 1.4 GB transpose + standing buffer per sweep.
    """
    p = problem
    ny_t, nx_t, _, _ = _tile_split(p)
    ls_global = _tiled_color_unlayout(ls_k, p.ny, p.nx, p.f, ny_t, nx_t)
    key = state.key
    states1 = jax.tree_util.tree_map(lambda x: x[None], state)
    carry1 = (resid_k[None], ls_global[None], None)
    raw1 = tuple(x[None] for x in raw)
    res = _assemble(p, states1, n_sweeps, carry1, raw1,
                    skip_resid=not final)
    res = jax.tree_util.tree_map(lambda x: x[0], res)
    # _assemble split the key (whole-cube engine semantics); this engine
    # keeps the key CONSTANT — streams are indexed by absolute sweep.
    return dataclasses.replace(
        res, state=dataclasses.replace(res.state, key=key)
    )


_assemble_tiled_small = functools.partial(
    jax.jit, static_argnames=("n_sweeps", "final")
)(_assemble_tiled_impl)
# huge fields: the chain state (clean + accumulators) and the raw dclean
# stream update in place instead of holding input + output copies
_assemble_tiled_big = functools.partial(
    jax.jit, static_argnames=("n_sweeps", "final"), donate_argnums=(1, 4)
)(_assemble_tiled_impl)


def _assemble_tiled(problem, state, n_sweeps, carry, raw, final=True):
    resid_k, _w_k, ls_k = carry
    # Normalise the state's resid aval BEFORE the jit call: the input may
    # be full-shaped (first segment), a (1,1,1) dummy (internal segments),
    # or a donated dead buffer — one shared shape keeps every segment on
    # the same two compiled variants (final True/False) instead of
    # recompiling per transition (remote compiles cost ~minutes).
    state = dataclasses.replace(
        state, resid=jnp.zeros((1, 1, 1), problem.config.dtype)
    )
    fn = (
        _assemble_tiled_big if state.clean.nbytes > 2**28
        else _assemble_tiled_small
    )
    return fn(problem, state, resid_k, ls_k, raw, n_sweeps=n_sweeps,
              final=final)
