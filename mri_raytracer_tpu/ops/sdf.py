"""Analytic SDF sphere tracer (reference R4, ``scripts/raymarch/raymarch.slang``).

All pixels trace in lockstep with per-ray convergence masks inside one
``lax.fori_loop`` — the TPU analog of the shader's divergent ``[loop]``.
Scene SDFs are composable jnp functions; the default scene matches the
reference (sphere radius 0.6 at the origin) as does the shading: spherical-UV
color on hit, vertical sky gradient on miss.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mri_raytracer_tpu.render.camera import CameraBasis, camera_rays


def sd_sphere(p: jnp.ndarray, r: float = 0.6) -> jnp.ndarray:
    return jnp.linalg.norm(p, axis=-1) - r


def sd_plane(p: jnp.ndarray, n, h: float) -> jnp.ndarray:
    n = jnp.asarray(n)
    return p @ (n / jnp.linalg.norm(n)) + h


def sd_box(p: jnp.ndarray, b) -> jnp.ndarray:
    q = jnp.abs(p) - jnp.asarray(b)
    return (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
            + jnp.minimum(jnp.max(q, axis=-1), 0.0))


def sd_union(*ds):
    return functools.reduce(jnp.minimum, ds)


def default_scene(p: jnp.ndarray) -> jnp.ndarray:
    """Reference scene: a single sphere of radius 0.6 (raymarch.slang:27-30)."""
    return sd_sphere(p, 0.6)


class SdfParams(NamedTuple):
    max_steps: jnp.ndarray  # () int32
    max_distance: jnp.ndarray  # ()
    hit_threshold: jnp.ndarray  # ()
    normal_eps: jnp.ndarray  # ()


def default_sdf_params(max_steps: int = 96, max_distance: float = 20.0,
                       hit_threshold: float = 1e-3,
                       normal_eps: float = 1e-3) -> SdfParams:
    import numpy as np

    return SdfParams(np.int32(max_steps), np.float32(max_distance),
                     np.float32(hit_threshold), np.float32(normal_eps))


def estimate_normal(sdf: Callable, p: jnp.ndarray, eps) -> jnp.ndarray:
    """Tetrahedral finite differences (raymarch.slang:33-41)."""
    k = jnp.array([[1.0, -1.0, -1.0], [-1.0, -1.0, 1.0],
                   [-1.0, 1.0, -1.0], [1.0, 1.0, 1.0]])
    d = jnp.stack([sdf(p + eps * k[i]) for i in range(4)], axis=-1)
    n = (d[..., 0:1] * k[0] + d[..., 1:2] * k[1]
         + d[..., 2:3] * k[2] + d[..., 3:4] * k[3])
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


@functools.partial(jax.jit, static_argnames=("sdf", "width", "height", "max_steps"))
def render_sdf(basis: CameraBasis, params: SdfParams, width: int = 512,
               height: int = 512, sdf: Callable = default_scene,
               max_steps: int = 256) -> jnp.ndarray:
    """Sphere-trace all pixels -> (H, W, 3). Step is clamped to [0.01, 0.25]
    exactly like the reference (raymarch.slang:79)."""
    ro, rd = camera_rays(basis, width, height)

    def body(i, state):
        t, hit = state
        p = ro + t[..., None] * rd
        d = sdf(p)
        newly_hit = (d < params.hit_threshold) & ~hit & (i < params.max_steps)
        hit = hit | newly_hit
        advance = (~hit) & (t <= params.max_distance) & (i < params.max_steps)
        t = jnp.where(advance, t + jnp.clip(d, 0.01, 0.25), t)
        return t, hit

    t0 = jnp.zeros((height, width), jnp.float32)
    hit0 = jnp.zeros((height, width), bool)
    t, hit = jax.lax.fori_loop(0, max_steps, body, (t0, hit0))

    p = ro + t[..., None] * rd
    # Hit: spherical-UV coloring on the unit normal (raymarch.slang:85-90).
    n = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    u = jnp.arctan2(n[..., 2], n[..., 0]) / (2.0 * jnp.pi) + 0.5
    v = n[..., 1] * 0.5 + 0.5
    hit_color = jnp.stack([u, v, 1.0 - u], axis=-1)
    # Miss: vertical sky gradient (raymarch.slang:93-95).
    tbg = 0.5 * (rd[..., 1] + 1.0)
    sky = ((1.0 - tbg[..., None]) * jnp.array([0.05, 0.06, 0.08])
           + tbg[..., None] * jnp.array([0.2, 0.25, 0.3]))
    return jnp.where(hit[..., None], hit_color, sky)
