"""2-D simplex-noise demo kernel (reference R5,
``scripts/slang_test/draw.slang:1-126``) — the SlangPy harness's smoke
test, re-built as a jitted XLA image kernel.

The reference pipeline per pixel (``draw.slang:104-125``): uv from pixel
coordinates (x-normalized), advected by ``time * 0.1``, warped by two
independent simplex-noise reads, folded into a 0.2-period tile, shaded by
an SDF circle through ``smoothstep(0.2, -0.2, d)``, plus a red
mouse-proximity highlight. The simplex noise is the Ashima/McEwan
2-D variant (``draw.slang:41-88``): permutation polynomial
``mod289((34 x + 1) x)`` over a 289-ring, diamond-mapped gradients,
quartic falloff, ``130 *`` amplitude normalization — implemented here as
the same closed-form math vectorized over the whole pixel grid (one
fused XLA program; no per-pixel dispatch)."""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _mod289(x):
    return x - jnp.floor(x * (1.0 / 289.0)) * 289.0


def _permute(x):
    return _mod289((x * 34.0 + 1.0) * x)


def snoise(v: jnp.ndarray) -> jnp.ndarray:
    """Ashima 2-D simplex noise in [-1, 1]; ``v`` (..., 2) -> (...)."""
    Cx, Cy = 0.211324865405187, 0.366025403784439
    Cz, Cw = -0.577350269189626, 0.024390243902439

    i = jnp.floor(v + jnp.sum(v, -1, keepdims=True) * Cy)
    x0 = v - i + jnp.sum(i, -1, keepdims=True) * Cx

    i1x = (x0[..., 0] >= x0[..., 1]).astype(jnp.float32)
    i1 = jnp.stack([i1x, 1.0 - i1x], axis=-1)
    x1 = x0 + jnp.array([Cx, Cx]) - i1
    x2 = x0 + jnp.array([Cz, Cz])

    i = _mod289(i)
    base = jnp.stack([jnp.zeros_like(i1x), i1[..., 1],
                      jnp.ones_like(i1x)], axis=-1)
    basex = jnp.stack([jnp.zeros_like(i1x), i1[..., 0],
                       jnp.ones_like(i1x)], axis=-1)
    p = _permute(_permute(i[..., 1:2] + base) + i[..., 0:1] + basex)

    d0 = jnp.sum(x0 * x0, -1)
    d1 = jnp.sum(x1 * x1, -1)
    d2 = jnp.sum(x2 * x2, -1)
    m = jnp.maximum(0.5 - jnp.stack([d0, d1, d2], axis=-1), 0.0)
    m = m * m
    m = m * m

    x = 2.0 * (p * Cw - jnp.floor(p * Cw)) - 1.0
    h = jnp.abs(x) - 0.5
    ox = jnp.floor(x + 0.5)
    a0 = x - ox
    m = m * (1.79284291400159 - 0.85373472095314 * (a0 * a0 + h * h))

    g = jnp.stack([a0[..., 0] * x0[..., 0] + h[..., 0] * x0[..., 1],
                   a0[..., 1] * x1[..., 0] + h[..., 1] * x1[..., 1],
                   a0[..., 2] * x2[..., 0] + h[..., 2] * x2[..., 1]],
                  axis=-1)
    return 130.0 * jnp.sum(m * g, -1)


def snoise01(v: jnp.ndarray) -> jnp.ndarray:
    """Noise remapped to [0, 1] (``draw.slang:90-93``)."""
    return snoise(v) * 0.5 + 0.5


def _repeat(p, size):
    return (p / size + 0.5) - jnp.floor(p / size + 0.5) - 0.5


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render_noise_demo(width: int, height: int, time,
                      mouse_pos=None, mouse_radius=64.0,
                      noise_scale=4.0, noise_amount=0.08) -> jnp.ndarray:
    """One frame of the animated demo -> (H, W, 3) float32 in [0, ~1].

    Matches ``draw.slang:104-125``: uv = pixel / width (x-normalized),
    advected by ``time * 0.1``; uv.x warped by simplex noise, then uv.y
    warped by a second read at the x-warped uv plus a (13, 17) offset;
    0.2-period tiled SDF
    circles of radius 0.25 shaded by smoothstep(0.2, -0.2, d); a red
    highlight of ``mouse_radius`` pixels around ``mouse_pos`` (the
    pointer-interaction analog — pass None for no pointer)."""
    t = jnp.asarray(time, jnp.float32)
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]
    uv = jnp.stack([jnp.broadcast_to(px, (height, width)),
                    jnp.broadcast_to(py, (height, width))],
                   axis=-1) / float(width)
    uv = uv + t * 0.1
    # Sequential warp, matching draw.slang:117-118: uv.x shifts first and
    # the y-warp noise is read at the already-x-warped position.
    wx = snoise(uv * noise_scale) * noise_amount
    uv = jnp.stack([uv[..., 0] + wx, uv[..., 1]], axis=-1)
    wy = snoise((uv + jnp.array([13.0, 17.0])) * noise_scale) * noise_amount
    uv = jnp.stack([uv[..., 0], uv[..., 1] + wy], axis=-1)
    p = _repeat(uv, 0.2)
    d = jnp.sqrt(jnp.sum(p * p, -1)) - 0.25
    s = jnp.clip((d - 0.2) / (-0.2 - 0.2), 0.0, 1.0)
    val = s * s * (3.0 - 2.0 * s)  # smoothstep(0.2, -0.2, d)
    color = jnp.repeat(val[..., None], 3, axis=-1)
    if mouse_pos is not None:
        mp = jnp.asarray(mouse_pos, jnp.float32)
        dist = jnp.sqrt((jnp.broadcast_to(px, (height, width)) - mp[0]) ** 2
                        + (jnp.broadcast_to(py, (height, width)) - mp[1]) ** 2)
        sm = jnp.clip(dist / jnp.maximum(mouse_radius, 1e-6), 0.0, 1.0)
        glow = 1.0 - sm * sm * (3.0 - 2.0 * sm)  # smoothstep(r, 0, dist)
        color = color + glow[..., None] * jnp.array([1.0, 0.0, 0.0])
    return color
