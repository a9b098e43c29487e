"""Numerically robust one-sided truncated-normal draws, z ~ TN[alpha, inf).

``jax.random.truncated_normal`` inverts the CDF in *probability* space:
for alpha ≳ 6 (f32) / ≳ 8 (f64) erf saturates, the interval degenerates and
the draw returns inf — which, clamped, systematically biased the
positivity-gibbs chain toward a flat positive blob at high SNR (found on
the SNR-400 drive; the round-1 clamp hack is exactly the failure).

Robust scheme, exact for every alpha:
  * alpha ≤ 2: the library inverse-CDF draw (safe region).
  * alpha > 2: invert the *log* survival function.  Draw u ~ U(0,1); the
    target z solves  log_ndtr(-z) = log_ndtr(-alpha) + log u.  With the
    asymptotic tail guess z₀ ≈ sqrt(-2t - log(-2t) - log 2π) the Newton
    iteration  z ← z + (log_ndtr(-z) - t)·Φ(-z)/φ(z)  converges to machine
    precision in ≤ 4 steps (the hazard φ/Φ(-·) ≈ z is smooth and the log-sf
    is convex in z there).  Everything evaluates in log space — no
    saturation at any alpha (tested to alpha = 1e4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr

_LOG_2PI = 1.8378770664093453
_TAIL_SWITCH = 2.0
_NEWTON_STEPS = 4


def _log_phi(z):
    return -0.5 * (z * z) - 0.5 * _LOG_2PI


def _tail_inverse(t, dtype):
    """Solve log_ndtr(-z) = t for z, valid for t ≲ log_ndtr(-2)."""
    w = jnp.maximum(-t, jnp.asarray(2.5, dtype))       # -log sf ≥ ~2.5 here
    z = jnp.sqrt(jnp.maximum(
        2.0 * w - jnp.log(2.0 * w) - _LOG_2PI, jnp.asarray(0.25, dtype)
    ))
    for _ in range(_NEWTON_STEPS):
        f = log_ndtr(-z) - t
        # hazard h = φ(z)/Φ(-z);  Newton step z ← z + f/h
        h = jnp.exp(_log_phi(z) - log_ndtr(-z))
        z = jnp.maximum(z + f / jnp.maximum(h, jnp.asarray(1e-30, dtype)),
                        jnp.asarray(1e-3, dtype))
    return z


def transform_uniforms(alpha, u_body, u_tail) -> jax.Array:
    """Elementwise map of two U(0,1) draws to z ~ TN[alpha, inf).

    Exposed separately so distributed callers (parallel/sweep_sharded.py)
    can draw the SAME full-grid uniforms on every device, slice their rows,
    and transform with local alphas — making the sharded chain draw-for-
    draw identical to the single-device one.
    """
    from jax.scipy.special import ndtr, ndtri

    dtype = u_body.dtype
    alpha = jnp.broadcast_to(jnp.asarray(alpha, dtype), u_body.shape)
    # safe-region inverse CDF (exact for alpha ≤ ~2; discarded beyond).
    a_lo = jnp.minimum(alpha, _TAIL_SWITCH)
    p = ndtr(a_lo) + u_body * (1.0 - ndtr(a_lo))
    # p can round to 1.0 (prob ~1e-9 per draw in f32) → ndtri = inf; cap at
    # a point with ~1e-18 of conditional mass instead.
    body = jnp.minimum(ndtri(p), a_lo + 9.0)
    # tail draw via log-sf inversion (exact for alpha ≥ ~2)
    t = log_ndtr(-jnp.maximum(alpha, _TAIL_SWITCH)) + jnp.log(u_tail)
    tail = _tail_inverse(t, dtype)
    return jnp.where(alpha > _TAIL_SWITCH, tail, body)


def truncated_standard_normal(key, alpha, shape, dtype) -> jax.Array:
    """Draw z ~ N(0,1) conditioned on z ≥ alpha (elementwise alpha)."""
    k1, k2 = jax.random.split(key)
    tiny = jnp.finfo(dtype).tiny
    u_body = jax.random.uniform(k1, shape, dtype, minval=tiny, maxval=1.0)
    u_tail = jax.random.uniform(k2, shape, dtype, minval=tiny, maxval=1.0)
    return transform_uniforms(alpha, u_body, u_tail)
