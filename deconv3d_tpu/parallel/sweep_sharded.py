"""Spatially-sharded sampling: ONE chain's Gibbs sweep spans the device mesh.

SURVEY.md §7 step 7 / §5.7(c): for fields too large for a single chip, the
spaxel grid is sharded along Y across devices and the color-decomposed sweep
(sampler.py) runs on every shard simultaneously.  Correctness at shard
edges: a spaxel's FSF patch extends f-1 padded rows beyond its own row, so
edge updates must reach the neighbour's residual rows.

Design (halo-replicated residual + per-color delta exchange over ICI):

  * Each device owns spaxel color-rows [d·nyl, (d+1)·nyl) and stores the
    padded residual rows [d·nyl·f, d·nyl·f + nyl·f + f-1) — the last f-1
    rows REPLICATE the next device's first f-1 rows (invariant: replicas
    always hold identical values, like the zero pads of the single-device
    layout).
  * Same-color spaxels are exactly f apart globally, so their patches stay
    disjoint ACROSS shard boundaries too — the color decomposition's
    correctness argument survives sharding unchanged.
  * After each color's accepted updates, the local patch-delta slab's top
    and bottom f-1 rows are pushed to the neighbours with a ``ppermute``
    ring (parallel.sharded.halo_exchange) and added there, restoring the
    replica invariant before the next color reads.

RNG: every device draws the FULL (ny, nx, L) proposal tensor from the same
key and slices its own rows — wasteful by a factor D on a (cheap) proposal
draw, but it makes the sharded chain draw-for-draw IDENTICAL to the
single-device jnp engine, which is the strongest possible correctness test
(test_sweep_sharded.py asserts bit-level equality of clean/resid).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import sampler as sm
from .sharded import halo_exchange


# ---------------------------------------------------------------------------
# Overlap (halo-replicated) layout helpers
# ---------------------------------------------------------------------------

def overlap_shard(resid: jax.Array, f: int, ndev: int) -> jax.Array:
    """[L, Hp, Wp] -> [L, ndev·Hpl, Wp] with per-device halo replication.

    Device block d holds padded rows [d·nyl·f, d·nyl·f + Hpl) of the global
    residual, Hpl = nyl·f + f - 1; consecutive blocks overlap by f-1 rows.
    """
    L, Hp, Wp = resid.shape
    BY = Hp - (f - 1)
    if BY % ndev:
        raise ValueError(f"Yc={BY} must be divisible by the mesh size {ndev}")
    BYl = BY // ndev
    Hpl = BYl + f - 1
    blocks = [
        jax.lax.dynamic_slice_in_dim(resid, d * BYl, Hpl, axis=1)
        for d in range(ndev)
    ]
    return jnp.concatenate(blocks, axis=1)


def overlap_unshard(resid_sh: jax.Array, f: int, ndev: int) -> jax.Array:
    """Inverse of overlap_shard: drop the replicated rows."""
    L, tot, Wp = resid_sh.shape
    Hpl = tot // ndev
    BYl = Hpl - (f - 1)
    parts = [
        jax.lax.dynamic_slice_in_dim(resid_sh, d * Hpl, BYl, axis=1)
        for d in range(ndev)
    ]
    # the global tail pad rows live only in the last device's block
    tail = jax.lax.dynamic_slice_in_dim(
        resid_sh, (ndev - 1) * Hpl + BYl, f - 1, axis=1
    )
    return jnp.concatenate(parts + [tail], axis=1)


# ---------------------------------------------------------------------------
# The sharded sweep
# ---------------------------------------------------------------------------

def run_sweeps_sharded(
    problem: sm.Problem,
    state: sm.SamplerState,
    n_sweeps: int,
    mesh: Mesh,
    axis_name: str = "sp",
) -> sm.ChainResult:
    """Run ``n_sweeps`` full sweeps of ONE chain sharded over ``mesh``.

    Input/output state uses the standard single-device layout; sharding and
    unsharding happen at the boundary of this call (the amortised cost of a
    long segment).  All three sampler modes shard: 'mh' (with or without
    positivity), 'gibbs' (incl. truncated-normal positivity draws) and
    'gibbs_block' (the per-spaxel Cholesky bank shards with the rows).

    With ``coarse_every`` set, coarse pattern passes interleave at
    absolute-sweep boundaries (the state is in standard layout at this
    entry point, so the plain-jnp pass composes unchanged).
    """
    if problem.config.coarse_every:
        return sm.coarse_interleave(
            problem, state, n_sweeps,
            lambda s, k: _run_sweeps_sharded_inner(
                problem, s, k, mesh, axis_name
            ),
        )
    return _run_sweeps_sharded_inner(problem, state, n_sweeps, mesh, axis_name)


def _run_sweeps_sharded_inner(
    problem: sm.Problem,
    state: sm.SamplerState,
    n_sweeps: int,
    mesh: Mesh,
    axis_name: str,
) -> sm.ChainResult:
    p = problem
    cfg = p.config
    if cfg.sampler == "direct":
        raise ValueError(
            "sampler='direct' draws are already whole-cube solves — "
            "spatial sharding of the sweep does not apply (it would "
            "silently run MH); drop spatial_mesh for direct runs."
        )
    if p.quad is None:
        raise ValueError(
            "this Problem was built for engine='pallas_tiled' and carries "
            "no cube-layout quad — rebuild it with engine='jnp' for the "
            "sharded sweep (Run(spatial_mesh=...) does this automatically)."
        )
    ndev = mesh.shape[axis_name]
    if p.ny % ndev:
        raise ValueError(
            f"ny={p.ny} color-rows must be divisible by the mesh size {ndev}"
        )
    nyl = p.ny // ndev
    f = p.f
    BYl = nyl * f
    Hpl = BYl + f - 1

    resid_sh = overlap_shard(state.resid, f, ndev)
    w_sh = overlap_shard(p.w_pad, f, ndev)

    shard_y = NamedSharding(mesh, P(None, axis_name, None))
    shard_yx = NamedSharding(mesh, P(axis_name, None))
    repl = NamedSharding(mesh, P())

    sweep_fn = _make_sharded_sweeps(p, mesh, axis_name, ndev, n_sweeps)
    idx = state.sweep + jnp.arange(n_sweeps, dtype=jnp.int32)
    adapt = sm.adapt_schedule(idx, cfg)
    burn = cfg.resolved_burn_in()
    keep = jnp.where(
        (idx >= burn) & ((idx - burn) % cfg.keep_one_in == 0), 1.0, 0.0
    ).astype(jnp.float32)

    if cfg.sampler == "gibbs":
        extra = jax.device_put(p.qvox, shard_y)             # [L, Yc/D, Xc]
    elif cfg.sampler == "gibbs_block":
        extra = jax.device_put(
            p.chol, NamedSharding(mesh, P(axis_name, None, None, None))
        )                                                   # [Yc/D, Xc, L, lw]
    else:
        extra = jax.device_put(jnp.zeros((), cfg.dtype), repl)

    args = (
        jax.device_put(resid_sh, shard_y),
        jax.device_put(state.clean, shard_y),
        jax.device_put(state.log_scale, shard_yx),
        jax.device_put(state.sum_clean, shard_y),
        # (1,1,1) placeholder when track_variance=False cannot shard
        jax.device_put(
            state.sum_sq,
            shard_y if cfg.track_variance else repl,
        ),
        jax.device_put(w_sh, shard_y),
        jax.device_put(p.quad, shard_y),
        jax.device_put(p.valid, shard_yx),
        extra,
        jax.device_put(state.key, repl),
        jax.device_put(state.chi2, repl),
        jax.device_put(state.chi2_comp, repl),
        jax.device_put(adapt, repl),
        jax.device_put(keep, repl),
    )
    (resid_out, clean, log_scale, sum_clean, sum_sq, key, chi2, chi2c,
     acc, nprop, chi2_t, acc_t, flux_t, mon_t) = sweep_fn(*args)

    new_state = sm.SamplerState(
        clean=clean,
        resid=overlap_unshard(resid_out, f, ndev),
        key=key,
        chi2=chi2,
        chi2_comp=chi2c,
        log_scale=log_scale,
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


def _make_sharded_sweeps(p, mesh, axis_name, ndev, n_sweeps):
    f, ny, nx, L = p.f, p.ny, p.nx, p.L
    nyl = ny // ndev
    BYl = nyl * f
    Hpl = BYl + f - 1
    cfg = p.config
    target = cfg.target_acceptance
    halo = f - 1
    lsf = p.lsf
    lw = int(lsf.shape[1])
    monitor_idx = np.asarray(p.monitor_idx)
    Yc, Xc = p.Yc, p.Xc

    def slab_views(resid, w, cy, cx):
        block = jax.lax.dynamic_slice(
            resid, (sm._i32(0), sm._i32(cy), sm._i32(cx)),
            (L, nyl * f, nx * f),
        ).reshape(L, nyl, f, nx, f)
        wblock = jax.lax.dynamic_slice(
            w, (sm._i32(0), sm._i32(cy), sm._i32(cx)), (L, nyl * f, nx * f)
        ).reshape(L, nyl, f, nx, f)
        lin = jnp.einsum("lab,lyaxb->lyx", p.fsf, block * wblock,
                         precision=jax.lax.Precision.HIGHEST)
        return lin

    def commit(resid, clean, jumps, cy, cx, lin, quad_c):
        """Shared commit: patch delta, halo push, clean update, Δchi²."""
        g = sm._lsf_apply_lastaxis(jumps, lsf)
        dchi2 = jnp.einsum("yxl,lyx->yx", g * g, quad_c,
                           precision=jax.lax.Precision.HIGHEST
                           ) - 2.0 * jnp.einsum(
            "yxl,lyx->yx", g, lin, precision=jax.lax.Precision.HIGHEST)
        delta = jnp.einsum("yxl,lab->lyaxb", g, p.fsf,
                           precision=jax.lax.Precision.HIGHEST
                           ).reshape(L, nyl * f, nx * f)
        dslab = jnp.zeros((L, Hpl, resid.shape[2]), resid.dtype)
        dslab = jax.lax.dynamic_update_slice(
            dslab, delta, (sm._i32(0), sm._i32(cy), sm._i32(cx))
        )
        resid = resid - dslab
        if halo > 0:
            from_prev, from_next = halo_exchange(
                dslab, halo, axis_name=axis_name, edge_axis=1
            )
            # prev's tail delta rows land on my first f-1 rows; next's top
            # delta rows land on my replicated tail rows.
            top = jax.lax.slice_in_dim(resid, 0, halo, axis=1) - from_prev
            bot = jax.lax.slice_in_dim(resid, BYl, Hpl, axis=1) - from_next
            resid = jax.lax.dynamic_update_slice_in_dim(resid, top, 0, axis=1)
            resid = jax.lax.dynamic_update_slice_in_dim(
                resid, bot, BYl, axis=1
            )
        clean_c = sm._color_slice(clean, cy, cx, nyl, nx, f)
        clean = sm._color_update(
            clean, clean_c + jnp.moveaxis(jumps, -1, 0), cy, cx, nyl, nx, f
        )
        return resid, clean, dchi2

    def local_rows(full, dev):
        return jax.lax.dynamic_slice_in_dim(full, dev * nyl, nyl, axis=0)

    def mh_step(carry, color):
        (resid, clean, key, chi2, chi2c, log_scale, acc, nprop, adapt_rate,
         quad, valid, w, extra, dev) = carry
        cy, cx = color // f, color % f

        valid_c = sm._color_slice(valid, cy, cx, nyl, nx, f)
        scale_c = sm._color_slice(log_scale, cy, cx, nyl, nx, f)

        # --- proposals: full-grid draw, local slice (bit-matches the
        # single-device engine; see module docstring)
        key, k1, k2 = jax.random.split(key, 3)
        draw_full = jax.random.cauchy(k1, (ny, nx, L), dtype=resid.dtype)
        draw = local_rows(jnp.clip(draw_full, -1e3, 1e3), dev)
        jumps = jnp.exp(scale_c)[..., None] * draw
        jumps = jnp.where(valid_c[..., None], jumps, 0.0)
        if cfg.positivity:
            cur = jnp.moveaxis(
                sm._color_slice(clean, cy, cx, nyl, nx, f), 0, -1
            )
            jumps = jnp.abs(cur + jumps) - cur

        g = sm._lsf_apply_lastaxis(jumps, lsf)
        lin = slab_views(resid, w, cy, cx)
        quad_c = sm._color_slice(quad, cy, cx, nyl, nx, f)
        dchi2 = jnp.einsum("yxl,lyx->yx", g * g, quad_c,
                           precision=jax.lax.Precision.HIGHEST
                           ) - 2.0 * jnp.einsum(
            "yxl,lyx->yx", g, lin, precision=jax.lax.Precision.HIGHEST)

        logu_full = jnp.log(jax.random.uniform(
            k2, (ny, nx), dtype=resid.dtype, minval=1e-37))
        logu = local_rows(logu_full, dev)
        accept = (logu < -0.5 * dchi2) & valid_c
        accf = accept.astype(resid.dtype)

        resid, clean, _ = commit(
            resid, clean, jumps * accf[..., None], cy, cx, lin, quad_c
        )

        dchi2_tot = jax.lax.psum(
            jnp.sum(jnp.where(accept, dchi2, 0.0), dtype=jnp.float32),
            axis_name,
        )
        y = dchi2_tot - chi2c
        t = chi2 + y
        chi2c = (t - chi2) - y
        chi2 = t

        log_scale = sm._color_update(
            log_scale,
            scale_c + adapt_rate * jnp.where(valid_c, accf - target, 0.0),
            cy, cx, nyl, nx, f,
        )
        acc = acc + jax.lax.psum(jnp.sum(accf, dtype=jnp.float32), axis_name)
        nprop = nprop + jax.lax.psum(
            jnp.sum(valid_c, dtype=jnp.float32), axis_name
        )
        return (resid, clean, key, chi2, chi2c, log_scale, acc, nprop,
                adapt_rate, quad, valid, w, extra, dev), None

    def gibbs_step(carry, code):
        (resid, clean, key, chi2, chi2c, log_scale, acc, nprop, adapt_rate,
         quad, valid, w, qvox, dev) = carry
        color = code // lw
        clam = code % lw
        cy, cx = color // f, color % f

        valid_c = sm._color_slice(valid, cy, cx, nyl, nx, f)
        lin = slab_views(resid, w, cy, cx)
        quad_c = sm._color_slice(quad, cy, cx, nyl, nx, f)

        linT = sm._lsf_apply_T_lastaxis(jnp.moveaxis(lin, 0, -1), lsf)
        qv = jnp.moveaxis(
            sm._color_slice(qvox, cy, cx, nyl, nx, f), 0, -1
        )
        lam_sel = (
            jnp.arange(L, dtype=jnp.int32) % lw == clam
        ).astype(linT.dtype)
        live = lam_sel * valid_c[..., None] * (qv > 0)
        key, k1 = jax.random.split(key)
        qv_safe = jnp.maximum(qv, 1e-30)
        if cfg.positivity:
            from ..ops.truncnorm import transform_uniforms

            cur = jnp.moveaxis(
                sm._color_slice(clean, cy, cx, nyl, nx, f), 0, -1
            )
            sig = jax.lax.rsqrt(qv_safe)
            mu = cur + linT / qv_safe
            alpha = -mu / sig
            # same RNG consumption as ops.truncnorm.truncated_standard_
            # normal on the FULL grid, sliced locally
            ka, kb = jax.random.split(k1)
            tiny = jnp.finfo(linT.dtype).tiny
            ub = local_rows(jax.random.uniform(
                ka, (ny, nx, L), linT.dtype, minval=tiny, maxval=1.0), dev)
            ut = local_rows(jax.random.uniform(
                kb, (ny, nx, L), linT.dtype, minval=tiny, maxval=1.0), dev)
            z = transform_uniforms(alpha, ub, ut)
            jumps = live * (mu + sig * z - cur)
        else:
            noise = local_rows(jax.random.normal(
                k1, (ny, nx, L), dtype=linT.dtype), dev)
            jumps = live * (linT / qv_safe + noise * jax.lax.rsqrt(qv_safe))

        resid, clean, dchi2 = commit(resid, clean, jumps, cy, cx, lin, quad_c)

        dchi2_tot = jax.lax.psum(
            jnp.sum(dchi2, dtype=jnp.float32), axis_name
        )
        y = dchi2_tot - chi2c
        t = chi2 + y
        chi2c = (t - chi2) - y
        chi2 = t
        n_upd = jax.lax.psum(jnp.sum(live, dtype=jnp.float32), axis_name)
        return (resid, clean, key, chi2, chi2c, log_scale, acc + n_upd,
                nprop + n_upd, adapt_rate, quad, valid, w, qvox, dev), None

    def block_step(carry, color):
        from ..ops import banded

        (resid, clean, key, chi2, chi2c, log_scale, acc, nprop, adapt_rate,
         quad, valid, w, chol, dev) = carry
        cy, cx = color // f, color % f

        valid_c = sm._color_slice(valid, cy, cx, nyl, nx, f)
        lin = slab_views(resid, w, cy, cx)
        quad_c = sm._color_slice(quad, cy, cx, nyl, nx, f)

        linT = sm._lsf_apply_T_lastaxis(jnp.moveaxis(lin, 0, -1), lsf)
        R = jax.lax.dynamic_slice(
            chol.reshape(nyl, f, nx, f, L, lw),
            (sm._i32(0), sm._i32(cy), sm._i32(0), sm._i32(cx),
             sm._i32(0), sm._i32(0)),
            (nyl, 1, nx, 1, L, lw),
        ).reshape(nyl, nx, L, lw)
        key, k1 = jax.random.split(key)
        noise = local_rows(jax.random.normal(
            k1, (ny, nx, L), dtype=linT.dtype), dev)
        jumps = banded.sample_conditional(R, linT, noise)
        jumps = jnp.where(valid_c[..., None], jumps, 0.0)

        resid, clean, dchi2 = commit(resid, clean, jumps, cy, cx, lin, quad_c)

        dchi2_tot = jax.lax.psum(
            jnp.sum(dchi2, dtype=jnp.float32), axis_name
        )
        y = dchi2_tot - chi2c
        t = chi2 + y
        chi2c = (t - chi2) - y
        chi2 = t
        n_upd = jax.lax.psum(
            jnp.sum(valid_c, dtype=jnp.float32), axis_name
        ) * jnp.float32(L)
        return (resid, clean, key, chi2, chi2c, log_scale, acc + n_upd,
                nprop + n_upd, adapt_rate, quad, valid, w, chol, dev), None

    def monitor_vals(clean, dev):
        """Per-sweep monitored voxels, psum-gathered from the owning shard."""
        vals = []
        for k in range(len(monitor_idx)):
            idx = int(monitor_idx[k])
            lam, rest = divmod(idx, Yc * Xc)
            yy, xx = divmod(rest, Xc)
            ly = yy - dev * BYl
            ok = (ly >= 0) & (ly < BYl)
            v = jax.lax.dynamic_slice(
                clean,
                (sm._i32(lam), jnp.clip(sm._i32(ly), 0, BYl - 1), sm._i32(xx)),
                (1, 1, 1),
            ).reshape(())
            vals.append(jnp.where(ok, v, 0.0))
        return jax.lax.psum(jnp.stack(vals), axis_name)

    spec_y = P(None, axis_name, None)
    spec_yx = P(axis_name, None)
    # sum_sq is a (1,1,1) placeholder when variance tracking is off
    spec_ss = spec_y if cfg.track_variance else P()
    if cfg.sampler == "gibbs":
        step, n_codes, spec_extra = gibbs_step, f * f * lw, spec_y
    elif cfg.sampler == "gibbs_block":
        step, n_codes = block_step, f * f
        spec_extra = P(axis_name, None, None, None)
    else:
        step, n_codes, spec_extra = mh_step, f * f, P()

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_y, spec_y, spec_yx, spec_y, spec_ss, spec_y, spec_y,
                  spec_yx, spec_extra, P(), P(), P(), P(), P()),
        out_specs=(spec_y, spec_y, spec_yx, spec_y, spec_ss, P(), P(), P(),
                   P(), P(), P(), P(), P(), P()),
    )
    def sweeps(resid, clean, log_scale, sum_clean, sum_sq, w, quad, valid,
               extra, key, chi2, chi2c, adapt, keep):
        dev = jax.lax.axis_index(axis_name)
        validf = valid.astype(cfg.dtype)
        codes = jnp.arange(n_codes, dtype=jnp.int32)

        def sweep(carry, xs):
            (resid, clean, key, chi2, chi2c, log_scale, sum_clean, sum_sq,
             acc0, nprop0) = carry
            adapt_t, keep_t = xs
            inner = (resid, clean, key, chi2, chi2c, log_scale,
                     jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                     adapt_t, quad, valid, w, extra, dev)
            inner, _ = jax.lax.scan(step, inner, codes)
            (resid, clean, key, chi2, chi2c, log_scale, acc, nprop,
             *_rest) = inner
            kc = keep_t.astype(clean.dtype)
            sum_clean = sum_clean + kc * clean
            if cfg.track_variance:
                sum_sq = sum_sq + kc * clean * clean
            flux = jax.lax.psum(
                jnp.sum(clean * validf[None], dtype=jnp.float32), axis_name
            )
            trace = (chi2, acc / jnp.maximum(nprop, 1.0), flux,
                     monitor_vals(clean, dev))
            return (resid, clean, key, chi2, chi2c, log_scale, sum_clean,
                    sum_sq, acc0 + acc, nprop0 + nprop), trace

        init = (resid, clean, key, chi2, chi2c, log_scale, sum_clean, sum_sq,
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        (resid, clean, key, chi2, chi2c, log_scale, sum_clean, sum_sq, acc,
         nprop), (chi2_t, acc_t, flux_t, mon_t) = jax.lax.scan(
            sweep, init, (adapt, keep)
        )
        return (resid, clean, log_scale, sum_clean, sum_sq, key, chi2, chi2c,
                acc, nprop, chi2_t, acc_t, flux_t, mon_t)

    return sweeps
