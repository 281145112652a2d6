"""Differentiable isosurface intersection (reference
``docs/DifferentiableRendering.md §10``).

Root-find t* with s(x(t*); theta) = s0 by bracketing march + bisection;
gradients come from the implicit function theorem via a custom VJP:
    dt*/dtheta = - (ds/dtheta at x*) / (grad_x s . d)
    dt*/do     = - grad_x s / (grad_x s . d)
    dt*/dd     = - t* grad_x s / (grad_x s . d)
so the (non-differentiable) iteration count never enters the tape.

``field_s(params, x) -> s`` takes its parameters explicitly (a custom VJP
cannot close over traced values).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _bisect_root(f, lo, hi, iters: int = 24):
    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        below = f(mid) < 0.0
        lo = jnp.where(below, mid, lo)
        hi = jnp.where(below, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def isosurface_intersect(field_s: Callable, s0: float, n_probe: int,
                         params: Any, origins: jnp.ndarray, dirs: jnp.ndarray,
                         t_lo: jnp.ndarray, t_hi: jnp.ndarray):
    """First entering crossing of s(x) = s0 along each ray -> (t*, hit)."""
    return _solve_impl(field_s, s0, n_probe, params, origins, dirs, t_lo, t_hi)


def _solve_impl(field_s, s0, n_probe, params, origins, dirs, t_lo, t_hi):
    ts = t_lo[..., None] + (jnp.arange(n_probe) + 0.5) / n_probe \
        * (t_hi - t_lo)[..., None]
    x = origins[..., None, :] + ts[..., None] * dirs[..., None, :]
    vals = field_s(params, x) - s0  # (..., P)
    enter = (vals[..., :-1] < 0.0) & (vals[..., 1:] >= 0.0)
    has = jnp.any(enter, axis=-1)
    first = jnp.argmax(enter, axis=-1)
    lo = jnp.take_along_axis(ts, first[..., None], -1)[..., 0]
    hi = jnp.take_along_axis(ts, first[..., None] + 1, -1)[..., 0]

    def f(t):
        return field_s(params, origins + t[..., None] * dirs) - s0

    t_star = _bisect_root(f, lo, hi)
    return jnp.where(has, t_star, t_hi), has


def _iso_fwd(field_s, s0, n_probe, params, origins, dirs, t_lo, t_hi):
    t_star, has = _solve_impl(field_s, s0, n_probe, params, origins, dirs,
                              t_lo, t_hi)
    return (t_star, has), (params, origins, dirs, t_star, has)


def _iso_bwd(field_s, s0, n_probe, res, g):
    params, origins, dirs, t_star, has = res
    g_t, _ = g
    x_star = origins + t_star[..., None] * dirs

    grad_x = jax.grad(lambda x: jnp.sum(field_s(params, x)))(x_star)
    denom = jnp.sum(grad_x * dirs, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    scale = jnp.where(has, g_t / denom, 0.0)  # (...,)

    # Params gradient via VJP of s(params, x*) with cotangent -scale.
    _, vjp_p = jax.vjp(lambda p: field_s(p, x_star), params)
    (d_params,) = vjp_p(-scale)
    d_o = -scale[..., None] * grad_x
    d_d = -scale[..., None] * grad_x * t_star[..., None]
    return d_params, d_o, d_d, jnp.zeros_like(t_star), jnp.zeros_like(t_star)


isosurface_intersect.defvjp(_iso_fwd, _iso_bwd)


def intersect(field_s: Callable, params: Any, origins: jnp.ndarray,
              dirs: jnp.ndarray, s0: float = 0.0, t0=0.0, t1=4.0,
              n_probe: int = 64):
    """Convenience wrapper with scalar t bounds."""
    t_lo = jnp.broadcast_to(jnp.asarray(t0, jnp.float32), origins.shape[:-1])
    t_hi = jnp.broadcast_to(jnp.asarray(t1, jnp.float32), origins.shape[:-1])
    return isosurface_intersect(field_s, float(s0), int(n_probe), params,
                                origins, dirs, t_lo, t_hi)
