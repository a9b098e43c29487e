"""Kernel-rate spatially-sharded sampling (VERDICT r2 next #2; SURVEY §7.7).

``parallel/sweep_sharded.py`` shards one chain's sweep over a Y-mesh but
re-implements the color step in plain jnp — on a real multi-chip slice the
sweep would run ~30× below the fused-kernel rate.  This module keeps EVERY
phase of the sweep on the fused HBM-tiled Pallas kernel
(ops/pallas_tiled.py), with exactly TWO collectives per sweep:

  * The spaxel grid is Y-sharded with the halo-replicated residual layout
    of sweep_sharded (each shard stores its padded rows plus f−1 replicated
    neighbour rows), kept in the tiled kernel's window layout
    [Hpl, Wpa, Lp].
  * Each shard's block-rows split into three row bands — TOP (block-row 0),
    INTERIOR (block-rows 1..nyl−2), BOTTOM (block-row nyl−1) — and each
    band runs the tiled kernel as its own sub-grid inside the same HBM
    buffer (the kernel's ``y_base`` window offset), sweeping all f² colors
    at kernel rate.  No data is copied between bands.
  * Interaction analysis (ascending-color scans): interior patches never
    touch shard-shared rows; two shards' TOP bands only interact through a
    shard's BOTTOM band and vice versa — never top↔top or bottom↔bottom
    (their patches are ≥ nyl·f − f rows apart).  Hence the fixed scan
    order [interior | all tops | all bottoms] needs replica synchronisation
    only twice: after the tops (push top-strip deltas to the previous
    shard's tail replicas) and after the bottoms (push bottom-strip deltas
    to the next shard's head replicas) — one ``ppermute`` each.

Scan-order validity: same-color spaxels always commute (stride = footprint,
across shard boundaries too); the band decomposition is just a fixed scan
order over the same single-site kernels, so the chain targets the identical
posterior as every other engine (the whole-cube and tiled kernels already
use different — equally valid — fixed orders).

RNG: each band's kernel draws per-(shard, band, absolute sweep, tile,
color) hardware-PRNG streams (shard and band folded into the seed), so any
segmentation — including checkpoint/resume — replays bit-exactly, like the
single-device tiled engine.

Compile economics: the jitted shard program is cached per problem in
``_PROGRAM_CACHE`` (a fresh jit closure per call would recompile every
segment; remote compiles cost minutes on this toolchain).

Testing (ONE real chip; interpret mode lacks the TPU PRNG):
``interior='jnp'`` swaps each band's kernel call for a masked jnp color
step with the same row bands, order, and strip exchanges, so the whole
machinery — window layouts, band decomposition, halo strips, bookkeeping —
runs on the virtual CPU mesh.  A missed or misrouted strip breaks the
incremental-vs-full residual invariant at shard boundaries, which the CPU
suite asserts at several mesh sizes, plus chi² consistency and bit-exact
segmentation.  The pallas path is validated on-chip by
benchmarks/validate_pallas.py (invariant + determinism + throughput vs the
unsharded tiled engine).
"""

from __future__ import annotations

import dataclasses
import functools
import weakref

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import sampler as sm
from ..ops import pallas_tiled as pt
from ..ops.pallas_sweep import _from_color_layout, _pad_lanes
from .cache import evict_dead
from .sweep_sharded import overlap_shard, overlap_unshard


#: Two-level cache.  The GB-scale shard constants (window weights, quad /
#: qvox band stacks) depend only on (problem, shard count, interior) — ONE
#: copy serves every segment length and both the 1-D and chains×sp meshes.
#: The jitted program is additionally specialized on (mesh, n_sweeps,
#: chain_axis): scan length and adapt/keep shapes bake into the jaxpr, so
#: coarse-interleaved runs legitimately hold a few small program variants
#: (leading/steady/trailing segment lengths) over the SAME constants.
#: Values are (weakref(problem), payload): id() alone is unsafe as a key —
#: a freed problem's id can be recycled — and dead entries are evicted on
#: every miss so sequential problems don't pin dead constants in HBM.
_CONSTS_CACHE: dict = {}    # (id(p), ndev, interior) -> (band_geo, Wpa_g, consts)
_PROGRAM_CACHE: dict = {}   # (id(p), mesh, axis, n_sweeps, interior, chain_axis)


def _cached_program(p, mesh, axis_name, n_sweeps, interior, chain_axis=None):
    """(sharded, consts, Wpa_g) through the two-level cache."""
    evict_dead(_CONSTS_CACHE, _PROGRAM_CACHE)
    ndev = mesh.shape[axis_name]
    skey = (id(p), ndev, interior)
    ent = _CONSTS_CACHE.get(skey)
    if ent is None or ent[0]() is not p:
        _CONSTS_CACHE[skey] = (weakref.ref(p), _build_consts(p, ndev, interior))
    band_geo, Wpa_g, consts = _CONSTS_CACHE[skey][1]
    pkey = (id(p), mesh, axis_name, int(n_sweeps), interior, chain_axis)
    ent = _PROGRAM_CACHE.get(pkey)
    if ent is None or ent[0]() is not p:
        _PROGRAM_CACHE[pkey] = (weakref.ref(p), _build_program(
            p, mesh, axis_name, int(n_sweeps), interior,
            chain_axis=chain_axis, band_plan=(band_geo, Wpa_g),
        ))
    return _PROGRAM_CACHE[pkey][1], consts, Wpa_g


def _to_window_impl(resid, f, ndev, Wpa_g, Lp):
    """[L, Hp, Wp] cube -> halo-replicated window layout [ndev·Hpl, Wpa, Lp].

    One fused program: materializing overlap_shard's output separately costs
    a second cube-size transient, which is what OOMed the 1-shard full-field
    drive (state + consts + two ~1.4 GB layout copies queued by the lazy
    dispatch backend).
    """
    return pt._cube_to_window_layout(
        overlap_shard(resid.astype(jnp.float32), f, ndev), Wpa_g, Lp
    )


_to_window = jax.jit(_to_window_impl, static_argnums=(1, 2, 3, 4))
#: huge fields: consume the incoming residual (the state-consumed-on-big
#: convention of the tiled/jnp engines, ops/pallas_tiled.py `_prep_carry`)
_to_window_donated = jax.jit(
    _to_window_impl, static_argnums=(1, 2, 3, 4), donate_argnums=(0,)
)

#: cube-size threshold above which segment boundaries consume their inputs
_BIG_BYTES = 2**28


def _from_window_impl(resid_w, f, ndev, Wp, L, dtype):
    """Inverse: window layout back to the standard [L, Hp, Wp] residual."""
    return overlap_unshard(
        jnp.moveaxis(resid_w[:, :Wp, :L], -1, 0), f, ndev
    ).astype(dtype)


_from_window = jax.jit(
    _from_window_impl, static_argnums=(1, 2, 3, 4, 5)
)
_from_window_donated = jax.jit(
    _from_window_impl, static_argnums=(1, 2, 3, 4, 5), donate_argnums=(0,)
)


def _to_window_chains_impl(resid, f, ndev, Wpa_g, Lp):
    return jax.vmap(
        lambda r: _to_window_impl(r, f, ndev, Wpa_g, Lp)
    )(resid)


_to_window_chains = jax.jit(
    _to_window_chains_impl, static_argnums=(1, 2, 3, 4)
)
_to_window_chains_donated = jax.jit(
    _to_window_chains_impl, static_argnums=(1, 2, 3, 4), donate_argnums=(0,)
)


def _from_window_chains_impl(resid_w, f, ndev, Wp, L, dtype):
    return jax.vmap(
        lambda r: _from_window_impl(r, f, ndev, Wp, L, dtype)
    )(resid_w)


_from_window_chains = jax.jit(
    _from_window_chains_impl, static_argnums=(1, 2, 3, 4, 5)
)
_from_window_chains_donated = jax.jit(
    _from_window_chains_impl, static_argnums=(1, 2, 3, 4, 5),
    donate_argnums=(0,),
)


def _strided_cols(arr_rc, cx, nx, f):
    """arr[..., cx + j·f, :] for j < nx: slice + reshape (no gathers).

    Works on [..., cols, lanes]; requires cols padded so cx + nx·f fits.
    """
    sl = jax.lax.dynamic_slice_in_dim(
        arr_rc, jnp.asarray(cx, jnp.int32), nx * f, axis=-2
    )
    shp = sl.shape
    return sl.reshape(shp[:-2] + (nx, f, shp[-1]))[..., :, 0, :]


def _band_rows(nyl: int, f: int):
    """(rows0, n_blockrows, y_base) for the top/interior/bottom bands."""
    bands = [("top", 0, 1, 0)]
    if nyl > 2:
        bands.append(("interior", f, nyl - 2, f))
    bands.append(("bottom", (nyl - 1) * f, 1, (nyl - 1) * f))
    return bands


def _band_plan(p, ndev):
    """(band_geo, Wpa_g): per-band tile plans + the widest window width."""
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    nyl = ny // ndev
    lw = int(p.lsf.shape[1])
    S = int(p.fsf_spec.shape[0])
    bands = _band_rows(nyl, f)
    # per-band tile plans; the shared window buffer must cover the widest
    band_geo = []
    Wpa_g = 0
    for name, rows0, nyb, y_base in bands:
        tile_b = pt.plan_tiles(f, nyb, nx, L, lw, S)
        if tile_b is None:
            raise ValueError("no per-band tiling fits the VMEM budget")
        band_geo.append((name, rows0, nyb, y_base, tile_b))
        Wpa_g = max(Wpa_g, pt.global_window_width(f, nx, tile_b[1]))
    return band_geo, Wpa_g


def _build_consts(p, ndev, interior):
    """(band_geo, Wpa_g, consts): the GB-scale shard constants.

    Independent of segment length and chain axis — one copy per
    (problem, shard count, interior) serves every compiled program
    variant (see _CONSTS_CACHE).
    """
    cfg = p.config
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    Lp = _pad_lanes(L)
    BYl = (ny // ndev) * f
    dtype = cfg.dtype
    band_geo, Wpa_g = _band_plan(p, ndev)

    # ---- shard-constant host-side precomputation ----
    # Serialized on huge problems: the lazy dispatch backend otherwise
    # queues every GB-scale stage's working set at once (same pattern as
    # make_problem's _sync).
    _big = L * ny * nx * f * f * 4 > 2**28

    def _sync(x):
        if _big:
            jax.block_until_ready(x)

    # weights stay in their stored dtype (bf16 on tiled problems) — the
    # window copy is bf16 anyway and _quad_conv upcasts per chunk
    w_pad = p.w_pad
    if p.quad is not None:
        quad_g = p.quad
    elif p.quad_tiled is not None:
        # pure relayout beats re-running the depthwise conv
        gt = p.config.tile
        quad_g = pt.untiled_quad_layout(
            p.quad_tiled, ny, nx, f, gt[0], gt[1], L, Lp
        ).astype(dtype)
    else:
        quad_g = sm._quad_conv(w_pad, np.asarray(p.fsf), dtype)
    _sync(quad_g)
    qvox_g = None
    if cfg.sampler == "gibbs":
        # per-voxel conditional precision in cube layout (the tiled-gibbs
        # problem dropped it after its own global relayout)
        from ..ops import banded

        qvox_g = banded.precision_diag(
            p.lsf.astype(dtype), quad_g
        ).astype(dtype)
    w_ov = overlap_shard(w_pad, f, ndev)     # stays bf16 on tiled problems
    w_w0 = pt._cube_to_window_layout(w_ov, Wpa_g, Lp).astype(jnp.bfloat16)
    _sync(w_w0)
    del w_ov

    # quad in window-lane layout [Yc, Xc+f, Lp] (cols padded for strides);
    # ONLY the jnp test path reads it — the pallas path gets a dummy so a
    # full-field run does not hold a second ~1.5 GB quad copy
    if interior == "jnp":
        quad_w0 = jnp.pad(
            jnp.moveaxis(quad_g.astype(jnp.float32), 0, -1),
            ((0, 0), (0, f), (0, Lp - L)),
        )
    else:
        quad_w0 = jnp.zeros((ndev, 1, 1), jnp.float32)
    # per-(band, shard) quad_tiled (and qvox_tiled for gibbs) stacks
    def _band_stacks(src_g):
        out = []
        for name, rows0, nyb, y_base, (ny_t, nx_t) in band_geo:
            parts = [
                pt.tiled_quad_layout(
                    jax.lax.dynamic_slice_in_dim(
                        src_g, d * BYl + rows0, nyb * f, axis=1
                    ),
                    nyb, nx, f, ny_t, nx_t, L, Lp,
                )
                for d in range(ndev)
            ]
            stack = jnp.concatenate([q[None] for q in parts], axis=0)
            _sync(stack)
            out.append(stack)
        return out

    qt_stacks = _band_stacks(quad_g)
    qv_stacks = _band_stacks(qvox_g) if qvox_g is not None else qt_stacks
    del quad_g, qvox_g

    validf = p.valid.astype(dtype)                      # [Yc, Xc]
    consts = (w_w0, quad_w0, tuple(qt_stacks), tuple(qv_stacks), validf)
    return band_geo, Wpa_g, consts


def _build_program(p, mesh, axis_name, n_sweeps, interior, chain_axis=None,
                   band_plan=None):
    """Build the jitted sharded program (constants live in _CONSTS_CACHE).

    With ``chain_axis`` set (run_chains_kernel_sharded), the mesh is 2-D
    and every per-chain array carries a leading chain axis sharded over it.
    """
    cfg = p.config
    ndev = mesh.shape[axis_name]
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    nyl = ny // ndev
    Lp = _pad_lanes(L)
    BYl = nyl * f
    Hpl = BYl + f - 1
    halo = f - 1
    n_colors = f * f
    target = float(cfg.target_acceptance)
    dtype = cfg.dtype
    band_geo, Wpa_g = band_plan if band_plan else _band_plan(p, ndev)

    fsf_lanes = jnp.pad(
        jnp.moveaxis(p.fsf.astype(jnp.float32), 0, -1),
        ((0, 0), (0, 0), (0, Lp - L)),
    )                                                    # [f, f, Lp]
    lsf = p.lsf
    monitor_idx = np.asarray(p.monitor_idx)
    Yc, Xc = p.Yc, p.Xc

    # per-band local problem templates (array leaves installed per shard
    # inside shard_map; big global leaves dropped)
    band_tmpls = [
        dataclasses.replace(
            p, ny=nyb,
            config=dataclasses.replace(
                cfg, tile=tile_b, engine="pallas_tiled"
            ),
            data_pad=None, w_pad=None, quad=None, quad_tiled=None,
            quad_mean=None, qvox=None, qvox_tiled=None, chol=None,
            valid=None,
        )
        for (name, rows0, nyb, y_base, tile_b) in band_geo
    ]

    spec_yx = P(axis_name, None)
    spec_cl = P(None, axis_name, None)

    # ------------------------------------------------------------------
    # the shard program
    # ------------------------------------------------------------------
    def _program(resid_w, w_w, quad_w, qts, qvs, valid_l, clean, ls_cube,
                 sum_clean, sum_sq, key, chi2, chi2c, adapt, keep, sweep0):
        dev = jax.lax.axis_index(axis_name)
        validf_l = valid_l                               # [BYl, Xc] float
        codes = jnp.arange(n_colors, dtype=jnp.int32)

        # static per-band row masks ([BYl] bool)
        rowmasks = []
        for (name, rows0, nyb, y_base, tile_b) in band_geo:
            m = np.zeros(BYl, bool)
            m[rows0 : rows0 + nyb * f] = True
            rowmasks.append(jnp.asarray(m))

        def jnp_color_step(valid_mask):
            """Masked all-rows color step on the window layout (CPU test
            stand-in for one band's kernel call)."""

            def step(carry, xs):
                (resid_w, clean, ls_cube, chi2, chi2c, acc, nprop) = carry
                color, adapt_t, key_c = xs
                cy, cx = color // f, color % f
                slab = jax.lax.dynamic_slice(
                    resid_w, (sm._i32(cy), sm._i32(cx), sm._i32(0)),
                    (BYl, nx * f, Lp))
                wsl = jax.lax.dynamic_slice(
                    w_w, (sm._i32(cy), sm._i32(cx), sm._i32(0)),
                    (BYl, nx * f, Lp)).astype(jnp.float32)
                rw = (slab * wsl).reshape(nyl, f, nx, f, Lp)
                lin = jnp.einsum(
                    "iajbl,abl->ijl", rw, fsf_lanes,
                    precision=jax.lax.Precision.HIGHEST)[..., :L]

                quad_c = _strided_cols(
                    jax.lax.dynamic_slice_in_dim(
                        quad_w.reshape(nyl, f, Xc + f, Lp),
                        jnp.asarray(cy, jnp.int32), 1, axis=1,
                    )[:, 0], cx, nx, f,
                )[..., :L]                               # [nyl, nx, L]
                vmask = valid_mask * validf_l
                vi = vmask.reshape(nyl, f, Xc)
                valid_c = _strided_cols(
                    jnp.pad(
                        jax.lax.dynamic_slice_in_dim(
                            vi, jnp.asarray(cy, jnp.int32), 1, axis=1
                        )[:, 0],
                        ((0, 0), (0, f)),
                    )[..., None], cx, nx, f,
                )[..., 0]                                # [nyl, nx]
                lsr = ls_cube.reshape(nyl, f, Xc)
                ls_c = _strided_cols(
                    jnp.pad(
                        jax.lax.dynamic_slice_in_dim(
                            lsr, jnp.asarray(cy, jnp.int32), 1, axis=1
                        )[:, 0],
                        ((0, 0), (0, f)),
                    )[..., None], cx, nx, f,
                )[..., 0]

                k1, k2 = jax.random.split(key_c)
                draw_g = jnp.clip(
                    jax.random.cauchy(k1, (ny, nx, L), dtype=jnp.float32),
                    -1e3, 1e3)
                logu_g = jnp.log(jax.random.uniform(
                    k2, (ny, nx), dtype=jnp.float32, minval=1e-37))
                draw = jax.lax.dynamic_slice_in_dim(
                    draw_g, jnp.asarray(dev * nyl, jnp.int32), nyl, axis=0)
                logu = jax.lax.dynamic_slice_in_dim(
                    logu_g, jnp.asarray(dev * nyl, jnp.int32), nyl, axis=0)

                jumps = jnp.exp(ls_c)[..., None] * draw * valid_c[..., None]
                g = sm._lsf_apply_lastaxis(jumps, lsf)
                dchi = jnp.einsum("ijl,ijl->ij", g * g, quad_c,
                                  precision=jax.lax.Precision.HIGHEST
                                  ) - 2.0 * jnp.einsum(
                    "ijl,ijl->ij", g, lin,
                    precision=jax.lax.Precision.HIGHEST)
                accept = (logu < -0.5 * dchi) & (valid_c > 0)
                accf = accept.astype(jnp.float32)
                gacc = jnp.pad(
                    g * accf[..., None], ((0, 0), (0, 0), (0, Lp - L)))
                delta = jnp.einsum(
                    "ijl,abl->iajbl", gacc, fsf_lanes,
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(BYl, nx * f, Lp)
                cur = jax.lax.dynamic_slice(
                    resid_w, (sm._i32(cy), sm._i32(cx), sm._i32(0)),
                    (BYl, nx * f, Lp))
                resid_w = jax.lax.dynamic_update_slice(
                    resid_w, cur - delta,
                    (sm._i32(cy), sm._i32(cx), sm._i32(0)))

                jacc = (jumps * accf[..., None]).astype(clean.dtype)
                clean_c = sm._color_slice(clean, cy, cx, nyl, nx, f)
                clean = sm._color_update(
                    clean, clean_c + jnp.moveaxis(jacc, -1, 0),
                    cy, cx, nyl, nx, f)
                scale_c = sm._color_slice(ls_cube, cy, cx, nyl, nx, f)
                ls_cube = sm._color_update(
                    ls_cube,
                    scale_c + adapt_t * jnp.where(
                        valid_c > 0, accf - target, 0.0),
                    cy, cx, nyl, nx, f)

                dchi_tot = jax.lax.psum(
                    jnp.sum(jnp.where(accept, dchi, 0.0),
                            dtype=jnp.float32), axis_name)
                y = dchi_tot - chi2c
                t = chi2 + y
                chi2c = (t - chi2) - y
                chi2 = t
                acc = acc + jax.lax.psum(
                    jnp.sum(accf, dtype=jnp.float32), axis_name)
                nprop = nprop + jax.lax.psum(
                    jnp.sum(valid_c, dtype=jnp.float32), axis_name)
                return (resid_w, clean, ls_cube, chi2, chi2c, acc,
                        nprop), None

            return step

        def monitor_vals(clean):
            vals = []
            for k in range(len(monitor_idx)):
                idx = int(monitor_idx[k])
                lam, rest = divmod(idx, Yc * Xc)
                yy, xx = divmod(rest, Xc)
                ly = yy - dev * BYl
                ok = (ly >= 0) & (ly < BYl)
                v = jax.lax.dynamic_slice(
                    clean,
                    (sm._i32(lam), jnp.clip(sm._i32(ly), 0, BYl - 1),
                     sm._i32(xx)),
                    (1, 1, 1),
                ).reshape(())
                vals.append(jnp.where(ok, v, 0.0))
            return jax.lax.psum(jnp.stack(vals), axis_name)

        def sweep(carry, xs):
            (resid_w, ls_state, clean, chi2, chi2c, sum_clean, sum_sq,
             acc0, np0) = carry
            adapt_t, keep_t, a_sweep = xs
            acc_s = jnp.zeros((), jnp.float32)
            np_s = jnp.zeros((), jnp.float32)

            def run_band(bi, resid_w, ls_state, clean, chi2, chi2c,
                         acc_s, np_s):
                name, rows0, nyb, y_base, tile_b = band_geo[bi]
                if interior == "pallas":
                    seed_b = jax.random.randint(
                        jax.random.fold_in(
                            jax.random.fold_in(key, 17), dev * 8 + bi),
                        (), 0, np.int32(2**31 - 1),
                    ).astype(jnp.int32)
                    local_p = dataclasses.replace(
                        band_tmpls[bi],
                        valid=(validf_l * rowmasks[bi][:, None].astype(
                            validf_l.dtype
                        ))[rows0 : rows0 + nyb * f] > 0,
                        quad_tiled=qts[bi][0],
                        qvox_tiled=(
                            qvs[bi][0] if cfg.sampler == "gibbs" else None
                        ),
                        w_pad=jnp.zeros((1, 1, 1), jnp.bfloat16),
                    )
                    lsb = ls_state[bi]
                    carry_k = (resid_w, w_w, lsb)
                    carry_k, (dcube, accn_g, dchia_g) = (
                        pt._tiled_segment_arrays(
                            local_p, carry_k, adapt_t.reshape(1), seed_b,
                            a_sweep, 1, y_base=y_base,
                        )
                    )
                    resid_w, _, lsb = carry_k
                    ls_state = tuple(
                        lsb if j == bi else ls_state[j]
                        for j in range(len(band_geo))
                    )
                    clean = clean.at[
                        :, rows0 : rows0 + nyb * f, :
                    ].add(dcube[0].astype(clean.dtype))
                    dchi_tot = jax.lax.psum(
                        jnp.sum(dchia_g, dtype=jnp.float32), axis_name)
                    y = dchi_tot - chi2c
                    t = chi2 + y
                    chi2c = (t - chi2) - y
                    chi2 = t
                    acc_inc = jax.lax.psum(
                        jnp.sum(accn_g, dtype=jnp.float32), axis_name)
                    acc_s = acc_s + acc_inc
                    np_s = np_s + (
                        acc_inc if cfg.sampler == "gibbs"
                        else jax.lax.psum(
                            jnp.sum(
                                validf_l[rows0 : rows0 + nyb * f],
                                dtype=jnp.float32,
                            ),
                            axis_name)
                    )
                else:
                    keys_c = jax.vmap(
                        lambda c, b=bi: jax.random.fold_in(
                            jax.random.fold_in(
                                jax.random.fold_in(key, a_sweep), b), c)
                    )(codes)
                    step = jnp_color_step(
                        rowmasks[bi][:, None].astype(validf_l.dtype)
                    )
                    inner = (resid_w, clean, ls_state, chi2, chi2c,
                             acc_s, np_s)
                    inner, _ = jax.lax.scan(
                        step, inner,
                        (codes, jnp.full((n_colors,), adapt_t), keys_c))
                    (resid_w, clean, ls_state, chi2, chi2c, acc_s,
                     np_s) = inner
                return resid_w, ls_state, clean, chi2, chi2c, acc_s, np_s

            n_bands = len(band_geo)
            i_top, i_bot = 0, n_bands - 1
            # interior first (never touches shared rows)
            if n_bands == 3:
                (resid_w, ls_state, clean, chi2, chi2c, acc_s,
                 np_s) = run_band(1, resid_w, ls_state, clean, chi2,
                                  chi2c, acc_s, np_s)
            # tops: interact only with neighbours' (deferred) bottoms
            old_top = resid_w[:halo]
            (resid_w, ls_state, clean, chi2, chi2c, acc_s,
             np_s) = run_band(i_top, resid_w, ls_state, clean, chi2,
                              chi2c, acc_s, np_s)
            if ndev > 1:
                # my head-strip delta belongs on prev's tail replicas
                d_top = old_top - resid_w[:halo]
                from_next = jax.lax.ppermute(
                    d_top, axis_name,
                    [(i, (i - 1) % ndev) for i in range(ndev)])
                from_next = jnp.where(
                    dev == ndev - 1, jnp.zeros_like(from_next), from_next)
                resid_w = jax.lax.dynamic_update_slice_in_dim(
                    resid_w, resid_w[BYl:Hpl] - from_next, BYl, axis=0)
            # bottoms: see neighbours' tops via the exchange above
            old_bot = resid_w[BYl:Hpl]
            (resid_w, ls_state, clean, chi2, chi2c, acc_s,
             np_s) = run_band(i_bot, resid_w, ls_state, clean, chi2,
                              chi2c, acc_s, np_s)
            if ndev > 1:
                d_bot = old_bot - resid_w[BYl:Hpl]
                from_prev = jax.lax.ppermute(
                    d_bot, axis_name,
                    [(i, (i + 1) % ndev) for i in range(ndev)])
                from_prev = jnp.where(
                    dev == 0, jnp.zeros_like(from_prev), from_prev)
                resid_w = jax.lax.dynamic_update_slice_in_dim(
                    resid_w, resid_w[:halo] - from_prev, 0, axis=0)
                # refresh tail replicas from the owners' FINAL head rows:
                # the lumped strip deltas above land within a rounding ulp
                # of the owner's per-color op sequence, so without this the
                # replicas drift off the owners and a checkpoint/reshard
                # boundary (which rebuilds replicas from owners) would not
                # be bit-exact.  The last shard's tail rows are the true
                # global pad region — it keeps its own values.
                heads = jax.lax.ppermute(
                    resid_w[:halo], axis_name,
                    [(i, (i - 1) % ndev) for i in range(ndev)])
                tails = jnp.where(
                    dev == ndev - 1, resid_w[BYl:Hpl], heads)
                resid_w = jax.lax.dynamic_update_slice_in_dim(
                    resid_w, tails, BYl, axis=0)

            kc = keep_t.astype(clean.dtype)
            sum_clean = sum_clean + kc * clean
            if cfg.track_variance:
                sum_sq = sum_sq + kc * clean * clean
            flux = jax.lax.psum(
                jnp.sum(clean * validf_l[None].astype(clean.dtype),
                        dtype=jnp.float32), axis_name)
            trace = (chi2, acc_s / jnp.maximum(np_s, 1.0), flux,
                     monitor_vals(clean))
            return (resid_w, ls_state, clean, chi2, chi2c, sum_clean,
                    sum_sq, acc0 + acc_s, np0 + np_s), trace

        if interior == "pallas":
            ls_state0 = tuple(
                pt._tiled_color_layout(
                    ls_cube[rows0 : rows0 + nyb * f], nyb, nx, f,
                    tile_b[0], tile_b[1],
                )
                for (name, rows0, nyb, y_base, tile_b) in band_geo
            )
        else:
            ls_state0 = ls_cube
        init = (resid_w, ls_state0, clean, chi2, chi2c, sum_clean,
                sum_sq, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32))
        (resid_w, ls_state, clean, chi2, chi2c, sum_clean, sum_sq,
         acc, nprop), (chi2_t, acc_t, flux_t, mon_t) = jax.lax.scan(
            sweep, init, (adapt, keep, sweep0 + jnp.arange(
                n_sweeps, dtype=jnp.int32)))

        if interior == "pallas":
            ls_cube = jnp.concatenate(
                [
                    _from_color_layout(
                        pt._tiled_color_unlayout(
                            ls_state[bi], nyb, nx, f, tile_b[0], tile_b[1]
                        ),
                        nyb, nx, f,
                    )
                    for bi, (name, rows0, nyb, y_base, tile_b)
                    in enumerate(band_geo)
                ],
                axis=0,
            )
        else:
            ls_cube = ls_state
        return (resid_w, ls_cube, clean, sum_clean, sum_sq, chi2, chi2c,
                acc, nprop, chi2_t, acc_t, flux_t, mon_t)

    # Per-chain arrays gain a leading chain axis when the program composes
    # with chain parallelism (run_chains_kernel_sharded): one chain per
    # chain-axis mesh row, so every program instance sees a local chain
    # block of exactly 1 and the body just squeezes/restores the axis.
    # Shard constants (w_w, quad_w, band stacks, validf) keep their 1-D
    # specs — shard_map replicates them along the unmentioned chain axis.
    def _pc(*dims):
        return P(chain_axis, *dims) if chain_axis else P(*dims)

    sp_resid = _pc(axis_name, None, None)
    sp_yx = _pc(axis_name, None)
    sp_cl = _pc(None, axis_name, None)
    sp_sq = sp_cl if cfg.track_variance else _pc(None, None, None)
    sp_s = _pc()

    if chain_axis is None:
        body = _program
    else:
        def body(resid_w, w_w, quad_w, qts, qvs, valid_l, clean, ls_cube,
                 sum_clean, sum_sq, key, chi2, chi2c, adapt, keep, sweep0):
            outs = _program(
                resid_w[0], w_w, quad_w, qts, qvs, valid_l, clean[0],
                ls_cube[0], sum_clean[0], sum_sq[0], key[0], chi2[0],
                chi2c[0], adapt, keep, sweep0,
            )
            return tuple(o[None] for o in outs)

    # resid_w (arg 0) is always created by this module's own layout
    # conversion — donating it lets XLA alias the sweep's in/out window
    # buffers (~1.5 GB at full field).  On big problems the state cubes
    # (clean, sum_clean, sum_sq) are consumed too, matching the
    # state-consumed-on-big convention of the tiled/jnp engines.
    cube_bytes = L * p.Yc * p.Xc * np.dtype(dtype).itemsize
    donate = (0, 6, 8, 9) if cube_bytes > _BIG_BYTES else (0,)
    sharded = jax.jit(functools.partial(
        jax.shard_map,
        mesh=mesh,
        # pallas_call's out_shapes carry no varying-mesh-axes annotation;
        # disable the vma check (the jnp test path passes it, the pallas
        # path cannot)
        check_vma=False,
        in_specs=(
            sp_resid,                   # resid_w  [ndev·Hpl, Wpa, Lp]
            P(axis_name, None, None),   # w_w
            P(axis_name, None, None),   # quad_w
            tuple(P(axis_name, None, None, None) for _ in band_geo),
            tuple(P(axis_name, None, None, None) for _ in band_geo),
            spec_yx,                    # validf
            sp_cl,                      # clean
            sp_yx,                      # ls
            sp_cl,                      # sum_clean
            sp_sq,
            _pc(None),                  # key
            sp_s, sp_s,                 # chi2, chi2c
            P(), P(), P(),              # adapt, keep, sweep0
        ),
        out_specs=(
            sp_resid,                   # resid_w
            sp_yx,                      # ls
            sp_cl,                      # clean
            sp_cl,                      # sum_clean
            sp_sq,
            sp_s, sp_s, sp_s, sp_s,     # chi2, chi2c, acc, nprop
            _pc(None), _pc(None), _pc(None), _pc(None, None),
        ),
    )(body), donate_argnums=donate)

    return sharded


def _check_kernel_shardable(p, mesh, axis_name, interior):
    """Shared validation for the kernel-rate sharded entry points."""
    cfg = p.config
    if cfg.sampler not in ("mh", "gibbs"):
        raise ValueError(
            "kernel-rate sharding supports sampler='mh' and 'gibbs' "
            "(the band kernels carry both modes); use "
            "parallel.sweep_sharded for other modes."
        )
    if cfg.positivity:
        raise ValueError("positivity is not supported on this path")
    if p.fsf_spec is None:
        raise ValueError(
            "problem lacks low-rank FSF factors — build it with "
            "engine='pallas_tiled' (or 'pallas')"
        )
    if interior is None:
        interior = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if cfg.sampler == "gibbs" and interior == "jnp":
        raise ValueError(
            "the jnp band stand-in implements the mh step only; gibbs "
            "kernel-sharding needs the pallas interior (run on TPU)"
        )
    ndev = mesh.shape[axis_name]
    if p.ny % ndev:
        raise ValueError(
            f"ny={p.ny} color-rows must be divisible by the mesh size "
            f"{ndev}"
        )
    if p.ny // ndev < 2:
        raise ValueError(
            f"need ≥2 block-rows per shard (ny={p.ny}, D={ndev})"
        )
    return interior


def run_sweeps_kernel_sharded(
    problem: sm.Problem,
    state: sm.SamplerState,
    n_sweeps: int,
    mesh: Mesh,
    axis_name: str = "sp",
    interior: str | None = None,
) -> sm.ChainResult:
    """Run ``n_sweeps`` of ONE chain Y-sharded over ``mesh`` at kernel rate.

    ``problem`` must be built with ``sampler='mh'`` on a kernel engine
    (low-rank FSF factors present).  ``interior`` selects the band engine:
    'pallas' (default on TPU — the fused tiled kernel per band) or 'jnp'
    (masked jnp color steps; the CPU-mesh test path).  Input/output state
    uses the standard single-device layout.

    With ``coarse_every`` set, coarse pattern passes (ops/coarse.py)
    interleave at absolute-sweep boundaries exactly as on the single-device
    engines: state crosses this entry point in standard layout, so the
    plain-jnp pass composes unchanged (the sub-segment lengths add at most
    two extra compile variants of the sharded program — leading/trailing
    partials — on top of the steady-state ``coarse_every``-sweep one).
    """
    inner = lambda s, k: _run_sweeps_kernel_inner(  # noqa: E731
        problem, s, k, mesh, axis_name, interior
    )
    if problem.config.chi2_rebaseline_every:
        # same drift bound as the single-device engines (sampler.run_sweeps):
        # state crosses this entry point in standard layout, so full_chi2
        # composes unchanged
        _inner = inner
        inner = lambda s, k: sm.rebaseline_interleave(  # noqa: E731
            problem, s, k, _inner
        )
    if problem.config.coarse_every:
        return sm.coarse_interleave(problem, state, n_sweeps, inner)
    return inner(state, n_sweeps)


def _run_sweeps_kernel_inner(
    problem: sm.Problem,
    state: sm.SamplerState,
    n_sweeps: int,
    mesh: Mesh,
    axis_name: str,
    interior: str | None,
) -> sm.ChainResult:
    p = problem
    cfg = p.config
    interior = _check_kernel_shardable(p, mesh, axis_name, interior)
    ndev = mesh.shape[axis_name]
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    Lp = _pad_lanes(L)
    dtype = cfg.dtype

    sharded, consts, Wpa_g = _cached_program(
        p, mesh, axis_name, n_sweeps, interior
    )
    (w_w0, quad_w0, qt_stacks, qv_stacks, validf) = consts

    big = state.resid.nbytes > _BIG_BYTES
    to_w = _to_window_donated if big else _to_window
    resid_w0 = to_w(state.resid, f, ndev, Wpa_g, Lp)
    if big:
        # Serialize the layout stage.  The cube↔window conversions cannot
        # alias (different shapes — the donation only releases the input
        # after execution), so on the lazy/tunneled backend an unblocked
        # segment boundary queues THIS segment's conversion transients
        # (~3 GB) on top of the previous segment's program + inverse
        # conversion — which OOMed the full-field sharded drive even
        # though one serialized segment fits with ~4 GB headroom.
        jax.block_until_ready(resid_w0)

    idx_sw = state.sweep + jnp.arange(n_sweeps, dtype=jnp.int32)
    adapt = sm.adapt_schedule(idx_sw, cfg)
    burn = cfg.resolved_burn_in()
    keep = jnp.where(
        (idx_sw >= burn) & ((idx_sw - burn) % cfg.keep_one_in == 0), 1.0, 0.0
    ).astype(jnp.float32)

    (resid_w_out, ls_out, clean, sum_clean, sum_sq, chi2, chi2c, acc,
     nprop, chi2_t, acc_t, flux_t, mon_t) = sharded(
        resid_w0, w_w0, quad_w0, qt_stacks, qv_stacks, validf,
        state.clean, state.log_scale.astype(jnp.float32), state.sum_clean,
        state.sum_sq, state.key, state.chi2, state.chi2_comp, adapt, keep,
        state.sweep,
    )

    # window layout -> overlap cube layout -> global residual (fused +
    # donated: resid_w_out is internal, so its buffer is always reusable)
    if big:
        # drain the sweep program before queueing the inverse conversion:
        # overlapping the program's band transients (~1.3 GB dcube) with
        # the conversion's (~3 GB) is exactly the measured OOM margin
        jax.block_until_ready(resid_w_out)
    from_w = _from_window_donated if big else _from_window
    new_resid = from_w(resid_w_out, f, ndev, p.Wp, L, dtype)
    if big:
        # other half of the stage serialization above: callers block on
        # scalars (chi2), which the sharded program produces BEFORE this
        # inverse conversion is even dispatched
        jax.block_until_ready(new_resid)
    new_state = sm.SamplerState(
        clean=clean.astype(dtype),
        resid=new_resid,
        key=state.key,          # constant: streams keyed by absolute sweep
        chi2=chi2,
        chi2_comp=chi2c,
        log_scale=ls_out.astype(dtype),
        n_accept=state.n_accept + acc,
        n_propose=state.n_propose + nprop,
        sum_clean=sum_clean,
        sum_sq=sum_sq,
        n_kept=state.n_kept + jnp.sum(keep),
        sweep=state.sweep + n_sweeps,
    )
    return sm.ChainResult(
        state=new_state, chi2_trace=chi2_t, accept_trace=acc_t,
        flux_trace=flux_t, monitor_trace=mon_t,
    )


def run_chains_kernel_sharded(
    problem: sm.Problem,
    n_chains: int,
    n_sweeps: int,
    mesh: Mesh,
    states: sm.SamplerState | None = None,
    chain_axis: str = "ch",
    axis_name: str = "sp",
    interior: str | None = None,
):
    """Chain parallelism × kernel-rate spatial sharding on a 2-D mesh.

    The production topology for a multi-chip slice (SURVEY §2.2 + §7.7
    composed): mesh axes ``(chain_axis, axis_name)`` run ``n_chains``
    independent chains, each Y-sharded over its own row of the mesh with
    every sweep phase on the fused tiled kernel — e.g. a v5e-8 as 2 chains
    × 4-way spatial.  One chain per mesh row
    (``mesh.shape[chain_axis] == n_chains``); all collectives (halo strip
    ppermutes, chi² psums) ride ``axis_name`` only, so chain rows never
    communicate and the composition is draw-for-draw identical to running
    each chain alone on the same spatial mesh (per-chain RNG keys shard
    over ``chain_axis``; streams are keyed by the absolute sweep).

    Returns a ``chains.MultiChainResult`` (leading chain axis), so R̂/ESS
    diagnostics work unchanged.

    With ``coarse_every`` set, coarse pattern passes interleave at
    absolute-sweep boundaries, mapped over the chain axis (all chains sit
    at the same absolute sweep — the composition runs them in lock-step).
    """
    from .. import chains as ch

    p = problem
    cfg = p.config
    if cfg.coarse_every:
        if states is None:
            states = ch.init_chain_states(problem, n_chains)
        return ch.MultiChainResult(result=sm.coarse_interleave(
            problem, states, n_sweeps,
            lambda s, k: _run_chains_kernel_inner(
                problem, n_chains, k, mesh, s, chain_axis, axis_name,
                interior,
            ).result,
            batched=True,
        ))
    return _run_chains_kernel_inner(
        problem, n_chains, n_sweeps, mesh, states, chain_axis, axis_name,
        interior,
    )


def _run_chains_kernel_inner(
    problem: sm.Problem,
    n_chains: int,
    n_sweeps: int,
    mesh: Mesh,
    states: sm.SamplerState | None,
    chain_axis: str,
    axis_name: str,
    interior: str | None,
):
    from .. import chains as ch

    p = problem
    cfg = p.config
    interior = _check_kernel_shardable(p, mesh, axis_name, interior)
    if chain_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no {chain_axis!r} axis (axes: {mesh.axis_names})"
        )
    n_ch = mesh.shape[chain_axis]
    if n_chains != n_ch:
        raise ValueError(
            f"one chain per {chain_axis!r} mesh row: n_chains={n_chains} "
            f"must equal mesh.shape[{chain_axis!r}]={n_ch}"
        )
    ndev = mesh.shape[axis_name]
    f, L = p.f, p.L
    Lp = _pad_lanes(L)
    dtype = cfg.dtype

    if states is None:
        states = ch.init_chain_states(problem, n_chains)

    sharded, consts, Wpa_g = _cached_program(
        p, mesh, axis_name, n_sweeps, interior, chain_axis=chain_axis
    )
    (w_w0, quad_w0, qt_stacks, qv_stacks, validf) = consts

    big = states.resid.nbytes // max(states.resid.shape[0], 1) > _BIG_BYTES
    to_w = _to_window_chains_donated if big else _to_window_chains
    resid_w0 = to_w(states.resid, f, ndev, Wpa_g, Lp)
    if big:
        # stage serialization — see _run_sweeps_kernel_inner
        jax.block_until_ready(resid_w0)

    # all chains advance in lock-step: one shared adapt/keep schedule
    sweep0 = states.sweep[0]
    idx_sw = sweep0 + jnp.arange(n_sweeps, dtype=jnp.int32)
    adapt = sm.adapt_schedule(idx_sw, cfg)
    burn = cfg.resolved_burn_in()
    keep = jnp.where(
        (idx_sw >= burn) & ((idx_sw - burn) % cfg.keep_one_in == 0), 1.0, 0.0
    ).astype(jnp.float32)

    (resid_w_out, ls_out, clean, sum_clean, sum_sq, chi2, chi2c, acc,
     nprop, chi2_t, acc_t, flux_t, mon_t) = sharded(
        resid_w0, w_w0, quad_w0, qt_stacks, qv_stacks, validf,
        states.clean, states.log_scale.astype(jnp.float32),
        states.sum_clean, states.sum_sq, states.key, states.chi2,
        states.chi2_comp, adapt, keep, sweep0,
    )

    if big:
        jax.block_until_ready(resid_w_out)
    from_w = _from_window_chains_donated if big else _from_window_chains
    new_resid = from_w(resid_w_out, f, ndev, p.Wp, L, dtype)
    if big:
        jax.block_until_ready(new_resid)
    new_state = sm.SamplerState(
        clean=clean.astype(dtype),
        resid=new_resid,
        key=states.key,         # constant: streams keyed by absolute sweep
        chi2=chi2,
        chi2_comp=chi2c,
        log_scale=ls_out.astype(dtype),
        n_accept=states.n_accept + acc,
        n_propose=states.n_propose + nprop,
        sum_clean=sum_clean,
        sum_sq=sum_sq,
        n_kept=states.n_kept + jnp.sum(keep),
        sweep=states.sweep + n_sweeps,
    )
    return ch.MultiChainResult(result=sm.ChainResult(
        state=new_state, chi2_trace=chi2_t, accept_trace=acc_t,
        flux_trace=flux_t, monitor_trace=mon_t,
    ))
