"""Multi-chip direct sampler: GSPMD-sharded perturb-and-solve PCG.

``sampler='direct'`` (ops/direct.py) draws independent posterior samples by
solving  A c = b  with preconditioned CG, where every A application is a
separable convolution and the preconditioner is a Fourier-space banded
solve.  Unlike the sweep engines there is no per-spaxel sequential
structure to decompose by hand — the whole draw is a chain of convs, FFTs
and reductions, exactly the op mix XLA's SPMD partitioner shards well on
its own.  So this path is deliberately **global-view**: place the cube-like
leaves of the problem/state Y-sharded on the mesh, jit the UNCHANGED
``direct_run_sweeps`` over them with matching output shardings, and let
GSPMD insert the collectives (halo exchanges for the depthwise convs,
axis-reshards around the spatial FFTs, psums for the CG dot products) —
the "annotate shardings, let XLA do the rest" recipe, in contrast to the
hand-decomposed shard_map paths the sequential sweeps require
(parallel/sweep_sharded.py, parallel/kernel_sharded.py).

What sharding buys here is MEMORY head-room as much as speed: a full-field
direct draw carries ~5 cube-size CG vectors (~6.5 GB at 300×300×3681 f32)
plus the problem constants — Y-sharding divides all of it across the mesh,
admitting fields beyond one chip's HBM.

Reference parity note: rebuild-only capability (the reference has neither
a direct sampler nor any distribution — SURVEY.md §2.2).
"""

from __future__ import annotations

import dataclasses
import weakref

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import sampler as sm
from ..ops import direct as _dr
from ..ops.direct import direct_run_sweeps
from .cache import evict_dead

#: pytree leaf name -> index of its Y-like axis (sharded over the mesh);
#: leaves not listed (kernels, scalars, keys, indices) are replicated.
_PROBLEM_AXIS = {
    "data_pad": 1, "w_pad": 1, "quad": 1, "qvox": 1,
    "valid": 0, "quad_mean": 0, "chol": 0,
}
_STATE_AXIS = {
    "clean": 1, "resid": 1, "sum_clean": 1, "sum_sq": 1, "log_scale": 0,
}

#: (weakref(problem), jitted program), keyed like kernel_sharded's cache —
#: a fresh jit per call would recompile every segment (remote compile =
#: minutes); id() alone is unsafe against problem-id recycling.
_PROGRAM_CACHE: dict = {}


def _spec(table, name, x, mesh, axis_name):
    ax = table.get(name)
    ndim = getattr(x, "ndim", 0)
    # NamedSharding needs the dimension divisible by the mesh axis — leaves
    # that don't divide (and the (1,1,1) sum_sq stub) stay replicated.
    # Geometry note: clean-like leaves have Yc = ny·f and resid-like have
    # Hp = Yc + f − 1, so BOTH shard iff ndev | Yc and ndev | f − 1 (e.g.
    # f = 9 on an 8-way mesh, f = 5 on 4-way).  Anything replicated only
    # costs memory, never correctness — GSPMD still shards the CG internals.
    if (
        ax is None or ndim <= ax
        or x.shape[ax] % mesh.shape[axis_name] != 0
    ):
        return P()
    return P(*([None] * ax + [axis_name]))


def _placed(obj, table, mesh, axis_name):
    upd = {}
    for f in dataclasses.fields(obj):
        x = getattr(obj, f.name)
        if x is None or not hasattr(x, "shape") or f.metadata.get("static"):
            continue
        upd[f.name] = jax.device_put(
            x, NamedSharding(mesh, _spec(table, f.name, x, mesh, axis_name))
        )
    return dataclasses.replace(obj, **upd)


def _out_shardings(problem, state, mesh, axis_name):
    def sh(table, name, x):
        return NamedSharding(
            mesh, _spec(table, name, x, mesh, axis_name)
        )

    state_sh = sm.SamplerState(**{
        f.name: sh(_STATE_AXIS, f.name, getattr(state, f.name))
        for f in dataclasses.fields(sm.SamplerState)
    })
    rep = NamedSharding(mesh, P())
    return sm.ChainResult(
        state=state_sh, chi2_trace=rep, accept_trace=rep,
        flux_trace=rep, monitor_trace=rep,
    )


def run_direct_sweeps_sharded(
    problem,
    state,
    n_sweeps: int,
    mesh: Mesh,
    axis_name: str | None = None,
) -> sm.ChainResult:
    """``direct_run_sweeps`` over a device mesh (drop-in ChainResult).

    Draw-for-draw the same chain as the single-device path (the RNG keys
    are sharding-independent); floats match to reduction-order tolerance.
    """
    p = problem
    if p.config.sampler != "direct":
        raise ValueError(
            f"run_direct_sweeps_sharded needs sampler='direct', got "
            f"{p.config.sampler!r}"
        )
    if axis_name is None:
        if len(mesh.axis_names) != 1:
            raise ValueError(
                f"pass axis_name for multi-axis mesh {mesh.axis_names}"
            )
        axis_name = mesh.axis_names[0]

    evict_dead(_PROGRAM_CACHE)
    ckey = (id(p), mesh, axis_name, int(n_sweeps))
    ent = _PROGRAM_CACHE.get(ckey)
    if ent is None or ent[0]() is not p:
        fn = jax.jit(
            lambda pp, st: direct_run_sweeps(pp, st, int(n_sweeps)),
            out_shardings=_out_shardings(p, state, mesh, axis_name),
        )
        _PROGRAM_CACHE[ckey] = (weakref.ref(p), fn)
    fn = _PROGRAM_CACHE[ckey][1]

    p_sh = _placed(p, _PROBLEM_AXIS, mesh, axis_name)
    st_sh = _placed(state, _STATE_AXIS, mesh, axis_name)
    return fn(p_sh, st_sh)


def posterior_mean_sharded(
    problem,
    mesh: Mesh,
    axis_name: str | None = None,
    tol: float | None = None,
    maxiter: int | None = None,
    prior_precision: float | None = None,
):
    """``ops.direct.posterior_mean`` over a device mesh (PCGResult).

    Same global-view recipe as the draws: Y-shard the problem leaves, jit
    the unchanged solve, let GSPMD insert the collectives — so the MAP of
    a field beyond one chip's HBM runs without a sampler-specific config
    (``Run.map_estimate`` routes here when ``spatial_mesh`` is set).
    """
    p = problem
    if axis_name is None:
        if len(mesh.axis_names) != 1:
            raise ValueError(
                f"pass axis_name for multi-axis mesh {mesh.axis_names}"
            )
        axis_name = mesh.axis_names[0]

    evict_dead(_PROGRAM_CACHE)
    tol_v = p.config.direct_tol if tol is None else float(tol)
    max_v = p.config.direct_maxiter if maxiter is None else int(maxiter)
    tau_v = _dr._tau(p, prior_precision)
    ckey = ("pm", id(p), mesh, axis_name, tol_v, max_v, tau_v)
    ent = _PROGRAM_CACHE.get(ckey)
    if ent is None or ent[0]() is not p:
        x_sh = NamedSharding(
            mesh, _spec(
                {"x": 1}, "x",
                jax.ShapeDtypeStruct((p.L, p.Y, p.X), p.config.dtype),
                mesh, axis_name,
            )
        )
        rep = NamedSharding(mesh, P())
        fn = jax.jit(
            lambda pp: _dr.posterior_mean(
                pp, tol=tol_v, maxiter=max_v, prior_precision=tau_v
            ),
            out_shardings=_dr.PCGResult(
                x=x_sh, iterations=rep, rel_residual=rep
            ),
        )
        _PROGRAM_CACHE[ckey] = (weakref.ref(p), fn)
    fn = _PROGRAM_CACHE[ckey][1]
    return fn(_placed(p, _PROBLEM_AXIS, mesh, axis_name))
