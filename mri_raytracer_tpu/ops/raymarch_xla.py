"""XLA reference ray-marchers (the golden oracle, and a solid fast path).

Implements, in pure jnp with exact math parity:
  * ``render_brats``: the multi-modal BraTS emission-absorption marcher
    (reference ``inr/viewer/brats_rt.slang:85-168``): pinhole rays, slab AABB
    clip, fixed-delta-t front-to-back march, windowed/gamma transfer on the
    blended intensity, nearest-neighbor GT-seg and INR-pred label overlays
    with an 8-entry RGBA LUT, early termination at T <= 0.01.
  * ``render_grid_u8``: the u8 grid renderer (reference
    ``scripts/volumeRendering/volume_render.slang:104-148``): fixed step
    count between the near/far planes, accumulation
    ``a += (1-a) * s * 4/steps`` inside the [-1,1]^3 cube.

TPU-native design notes:
  - all pixels march in lockstep inside one ``lax.while_loop`` whose
    condition is "any ray still active" — the SIMT-divergence-free analog of
    the shader's per-thread early exit;
  - modalities are pre-blended into ONE volume before the march (trilinear
    interpolation is linear, so blending commutes with sampling) — a 4x
    bandwidth saving over the reference's four per-step fetches;
  - label LUT colors are pre-baked into RGBA voxel grids, so per-step label
    work is a 4-channel nearest gather with no integer LUT lookup.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mri_raytracer_tpu.ops.trilinear import trilinear_sample_base, nearest_sample
from mri_raytracer_tpu.render.camera import CameraBasis, camera_rays
from mri_raytracer_tpu.render.params import BratsRenderParams


def _safe_dir(d: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Avoid div-by-zero exactly like the shader (brats_rt.slang:96-99)."""
    return jnp.where(jnp.abs(d) < eps, eps, d)


def aabb_hit(ro: jnp.ndarray, rcp: jnp.ndarray, bmin: jnp.ndarray,
             bmax: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab test; returns (hit, tmin, tmax). Shapes broadcast over pixels."""
    t0 = (bmin - ro) * rcp
    t1 = (bmax - ro) * rcp
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    tmin = jnp.max(tsm, axis=-1)
    tmax = jnp.min(tbg, axis=-1)
    return tmax >= jnp.maximum(tmin, 0.0), tmin, tmax


def blend_modalities(mods: jnp.ndarray, enabled: jnp.ndarray,
                     weight: jnp.ndarray) -> jnp.ndarray:
    """(M,X,Y,Z) -> (X,Y,Z) weighted blend, normalized by the enabled-weight
    sum (matches the shader's v / wSum; zero when nothing enabled)."""
    w = enabled * weight  # (M,)
    wsum = jnp.sum(w)
    mixed = jnp.tensordot(w, mods, axes=(0, 0))
    return jnp.where(wsum > 0.0, mixed / jnp.maximum(wsum, 1e-12), jnp.zeros_like(mixed))


def bake_label_rgba(labels: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """(X,Y,Z) int labels -> (4,X,Y,Z) RGBA voxel grid via the LUT.

    Labels outside [1,8) composite as nothing; lut[0] is transparent so the
    clamp-to-0 covers them (shader check l>0 && l<8, brats_rt.slang:145).
    """
    safe = jnp.where((labels > 0) & (labels < 8), labels, 0)
    rgba = jnp.take(lut, safe, axis=0)  # (X,Y,Z,4)
    return jnp.moveaxis(rgba, -1, 0)


def transfer_function(v: jnp.ndarray, ww, wl, gamma) -> jnp.ndarray:
    """Window/level + gamma (brats_rt.slang:132-133)."""
    val = jnp.clip((v - (wl - ww * 0.5)) / ww, 0.0, 1.0)
    return jnp.power(val, gamma)


@functools.partial(jax.jit, static_argnames=("width", "height", "max_steps"))
def render_brats(mods: jnp.ndarray, seg: Optional[jnp.ndarray],
                 pred: Optional[jnp.ndarray], basis: CameraBasis,
                 p: BratsRenderParams, width: int = 512, height: int = 512,
                 max_steps: int = 1024) -> jnp.ndarray:
    """Full-parity BraTS render -> (height, width, 3) float32 RGB.

    mods: (M, X, Y, Z) float volumes (display-normalized).
    seg/pred: (X, Y, Z) int labels or None.
    """
    X, Y, Z = mods.shape[1:]
    dims = jnp.array([X, Y, Z], jnp.float32)
    mixed = blend_modalities(mods, p.vol_enabled[: mods.shape[0]],
                             p.vol_weight[: mods.shape[0]])
    seg_rgba = bake_label_rgba(seg, p.lut) if seg is not None else None
    pred_rgba = bake_label_rgba(pred, p.lut) if pred is not None else None

    ro, rd = camera_rays(basis, width, height)
    rcp = 1.0 / _safe_dir(rd)
    bmin = p.vol_min
    bmax = p.vol_min + p.voxel_size * dims
    hit, t0, t1 = aabb_hit(ro, rcp, bmin, bmax)
    t0 = jnp.maximum(t0, jnp.maximum(0.0, p.near))
    t1 = jnp.where(p.far > 0.0, jnp.minimum(t1, p.far), t1)
    valid = hit & (t1 > t0)

    dt = p.step_size
    C0 = jnp.broadcast_to(p.bg_color, (height, width, 3))
    T0 = jnp.ones((height, width), jnp.float32)
    t = jnp.where(valid, t0, t1)  # invalid rays start finished

    def composite(C, T, rgb, alpha):
        C = C + (alpha * T)[..., None] * rgb
        T = T * (1.0 - alpha)
        return C, T

    def cond(state):
        step, t, C, T = state
        active = (t < t1) & (T > 0.01) & valid
        return jnp.logical_and(step < max_steps, jnp.any(active))

    def body(state):
        step, t, C, T = state
        active = (t < t1) & (T > 0.01) & valid
        pos = ro + t[..., None] * rd
        pidx = (pos - bmin) / p.voxel_size

        v = trilinear_sample_base(mixed, pidx)
        val = transfer_function(v, p.ww, p.wl, p.gamma)
        a = 1.0 - jnp.exp(-val * p.intensity_alpha * dt)
        a = jnp.where(active, a, 0.0)
        C, T = composite(C, T, val[..., None], a)

        if seg_rgba is not None:
            rgba = jnp.stack([nearest_sample(seg_rgba[c], pidx) for c in range(4)], -1)
            a = 1.0 - jnp.exp(-rgba[..., 3] * dt)
            a = jnp.where(active & (p.show_seg > 0), a, 0.0)
            C, T = composite(C, T, rgba[..., :3], a)
        if pred_rgba is not None:
            rgba = jnp.stack([nearest_sample(pred_rgba[c], pidx) for c in range(4)], -1)
            # Prediction overlay marches at 1.5x opacity (brats_rt.slang:158).
            a = 1.0 - jnp.exp(-rgba[..., 3] * dt * 1.5)
            a = jnp.where(active & (p.show_pred > 0), a, 0.0)
            C, T = composite(C, T, rgba[..., :3], a)

        return step + 1, t + dt, C, T

    _, _, C, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), t, C0, T0))
    return C


class GridRenderParams(NamedTuple):
    step_count: jnp.ndarray  # ()
    near: jnp.ndarray  # ()
    far: jnp.ndarray  # ()


@functools.partial(jax.jit, static_argnames=("width", "height", "max_steps"))
def render_grid_u8(vol_u8: jnp.ndarray, basis: CameraBasis,
                   p: GridRenderParams, width: int = 512, height: int = 512,
                   max_steps: int = 512) -> jnp.ndarray:
    """u8 grid renderer parity (volume_render.slang): the volume occupies
    [-1,1]^3; rays step uniformly between the near and far *planes* and only
    accumulate inside the cube. Returns (H, W, 3) grayscale."""
    X, Y, Z = vol_u8.shape
    vol = vol_u8.astype(jnp.float32) / 255.0
    dims1 = jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)

    ro, rd_unit = camera_rays(basis, width, height)
    # The WGSL-style setup scales the *unnormalized* camera-space vector by
    # near/far; reconstruct it: world_near = eye + dir_cam_world * n where
    # dir_cam_world uses the unnormalized (vx, vy, 1) vector.
    # camera_rays normalized rd; recover by dividing by the z-component in
    # camera space == dot(rd, forward).
    z_cam = jnp.einsum("hwc,c->hw", rd_unit, basis.forward)
    dir_plane = rd_unit / z_cam[..., None]
    n = jnp.maximum(0.0, p.near)
    f = jnp.maximum(n, p.far)
    world_near = ro + dir_plane * n
    steps = jnp.maximum(1.0, p.step_count)
    step_vec = dir_plane * (f - n) / steps

    def body(i, carry):
        accum, pos = carry
        inside = jnp.all((pos < 1.0) & (pos > -1.0), axis=-1)
        uvw = 0.5 * (pos + 1.0)
        pidx = uvw * dims1
        s = trilinear_sample_base(vol, pidx) * (4.0 / steps)
        # Gate matches the shader's end-of-loop `accum > 0.995` break:
        # a step accumulates iff accum entering the step is <= 0.995.
        do = inside & (accum <= 0.995) & (i < p.step_count)
        accum = jnp.where(do, accum + (1.0 - accum) * s, accum)
        return accum, pos + step_vec

    accum, _ = jax.lax.fori_loop(0, max_steps, body, (jnp.zeros((height, width)), world_near))
    return jnp.repeat(accum[..., None], 3, axis=-1)


def _grid_ray_setup(vol_u8, basis, p, width, height):
    """Shared near/far-plane stepping setup of ``render_grid_u8``."""
    X, Y, Z = vol_u8.shape
    vol = vol_u8.astype(jnp.float32) / 255.0
    dims1 = jnp.array([X - 1, Y - 1, Z - 1], jnp.float32)
    ro, rd_unit = camera_rays(basis, width, height)
    z_cam = jnp.einsum("hwc,c->hw", rd_unit, basis.forward)
    dir_plane = rd_unit / z_cam[..., None]
    n = jnp.maximum(0.0, p.near)
    f = jnp.maximum(n, p.far)
    steps = jnp.maximum(1.0, p.step_count)
    return vol, dims1, ro + dir_plane * n, dir_plane * (f - n) / steps


def _grid_sample(vol, dims1, pos):
    """Trilinear sample of the [-1,1]^3 grid at world ``pos`` (masked to 0
    outside the cube)."""
    inside = jnp.all((pos < 1.0) & (pos > -1.0), axis=-1)
    pidx = 0.5 * (pos + 1.0) * dims1
    return jnp.where(inside, trilinear_sample_base(vol, pidx), 0.0), inside


@functools.partial(jax.jit, static_argnames=("width", "height", "max_steps"))
def render_grid_mip(vol_u8: jnp.ndarray, basis: CameraBasis,
                    p: GridRenderParams, width: int = 512, height: int = 512,
                    max_steps: int = 512) -> jnp.ndarray:
    """Maximum-intensity projection of the u8 grid: max of trilinear
    samples along each ray between the near/far planes — the standard
    clinical MRA/PET view. Same camera/stepping setup as
    ``render_grid_u8``; an order-independent max, so no early termination
    is needed (one ``fori_loop`` with a running max maps cleanly to TPU)."""
    vol, dims1, world_near, step_vec = _grid_ray_setup(vol_u8, basis, p,
                                                       width, height)

    def body(i, carry):
        best, pos = carry
        s, _ = _grid_sample(vol, dims1, pos)
        s = jnp.where(i < p.step_count, s, 0.0)
        return jnp.maximum(best, s), pos + step_vec

    best, _ = jax.lax.fori_loop(
        0, max_steps, body, (jnp.zeros((height, width)), world_near))
    return jnp.repeat(best[..., None], 3, axis=-1)


@functools.partial(jax.jit, static_argnames=("width", "height", "max_steps"))
def render_grid_iso(vol_u8: jnp.ndarray, basis: CameraBasis,
                    p: GridRenderParams, width: int = 512, height: int = 512,
                    max_steps: int = 512, iso: float = 0.25,
                    light_dir=(0.4, 0.6, 0.7)) -> jnp.ndarray:
    """First-crossing iso-surface render with gradient Phong shading.

    Fixed-trip masked march (TPU-friendly: no data-dependent break): the
    first step whose trilinear sample crosses ``iso`` records a linearly
    refined hit position; the surface normal is the central-difference
    intensity gradient at the hit, shaded with Lambert + Blinn-Phong
    against a fixed light plus a headlight ambient term."""
    vol, dims1, world_near, step_vec = _grid_ray_setup(vol_u8, basis, p,
                                                       width, height)
    iso_j = jnp.float32(iso)

    def body(i, carry):
        found, hit, prev_s, pos = carry
        s, inside = _grid_sample(vol, dims1, pos)
        active = (i < p.step_count)
        cross = inside & active & ~found & (prev_s < iso_j) & (s >= iso_j)
        # Linear refinement between the previous and current step. At i==0
        # there IS no previous sample (prev_s is the 0 init): the segment
        # start collapses to the near-plane point itself so the refined hit
        # can never land in front of the configured near clip.
        seg_start = jnp.where(i == 0, pos, pos - step_vec)
        frac = jnp.clip((iso_j - prev_s) / jnp.maximum(s - prev_s, 1e-6),
                        0.0, 1.0)
        hit_new = seg_start + frac[..., None] * (pos - seg_start)
        return (found | cross,
                jnp.where(cross[..., None], hit_new, hit),
                jnp.where(active, s, prev_s), pos + step_vec)

    H, W = height, width
    found, hit, _, _ = jax.lax.fori_loop(
        0, max_steps, body,
        (jnp.zeros((H, W), bool), jnp.zeros((H, W, 3)),
         jnp.zeros((H, W)), world_near))

    # Central-difference gradient at the hit (2-voxel stencil in world
    # units of the largest axis).
    eps = 2.0 / jnp.max(dims1)
    grads = []
    for a in range(3):
        d = jnp.zeros(3).at[a].set(eps)
        sp, _ = _grid_sample(vol, dims1, hit + d)
        sm, _ = _grid_sample(vol, dims1, hit - d)
        grads.append(sp - sm)
    g = jnp.stack(grads, -1)
    n_vec = -g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True),
                             1e-6)
    l = jnp.asarray(light_dir, jnp.float32)
    l = l / jnp.linalg.norm(l)
    _, rd_unit = camera_rays(basis, width, height)
    v = -rd_unit
    h = (l + v) / jnp.maximum(
        jnp.linalg.norm(l + v, axis=-1, keepdims=True), 1e-6)
    diff = jnp.maximum(0.0, jnp.einsum("hwc,c->hw", n_vec, l))
    spec = jnp.maximum(0.0, jnp.sum(n_vec * h, -1)) ** 32
    shade = jnp.clip(0.12 + 0.75 * diff + 0.35 * spec, 0.0, 1.0)
    out = jnp.where(found, shade, 0.0)
    return jnp.repeat(out[..., None], 3, axis=-1)
