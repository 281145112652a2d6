"""Volume sampling ops: trilinear + nearest-neighbor gather.

Semantics match the reference shader samplers exactly
(``inr/viewer/brats_rt.slang:60-83``):
  * trilinear: clamp point to [0, dims - 1.001], floor to the base corner,
    8-corner lerp (x fastest, then y, then z)
  * nearest: round(clamp(p, 0, dims - 1))

Volumes are indexed ``vol[x, y, z]`` — identical index semantics to the
shader's Z-major flat buffer ``idx = x + y*dimX + z*dimX*dimY``.

``trilinear_sample`` carries a custom VJP with gradients scattered back to
the grid corners (the trilinear-gradient formulas of
``docs/DifferentiableRendering.md:117-127``) plus gradients to the sample
positions — required by the differentiable-rendering path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _corner_setup(vol_shape, pts: jnp.ndarray):
    X, Y, Z = vol_shape
    dims = jnp.array([X, Y, Z], jnp.float32)
    q = jnp.clip(pts, 0.0, dims - 1.001)
    i0 = jnp.floor(q).astype(jnp.int32)
    f = q - i0.astype(jnp.float32)
    return q, i0, f


def _gather(vol: jnp.ndarray, ix, iy, iz) -> jnp.ndarray:
    """Flat gather (cheaper on TPU than 3-index fancy indexing)."""
    X, Y, Z = vol.shape
    flat = vol.reshape(-1)
    idx = (ix * Y + iy) * Z + iz
    return jnp.take(flat, idx, axis=0)


def trilinear_sample_base(vol: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """vol (X,Y,Z), pts (..., 3) in index space -> (...) samples."""
    q, i0, f = _corner_setup(vol.shape, pts)
    ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    c000 = _gather(vol, ix, iy, iz)
    c100 = _gather(vol, ix + 1, iy, iz)
    c010 = _gather(vol, ix, iy + 1, iz)
    c110 = _gather(vol, ix + 1, iy + 1, iz)
    c001 = _gather(vol, ix, iy, iz + 1)
    c101 = _gather(vol, ix + 1, iy, iz + 1)
    c011 = _gather(vol, ix, iy + 1, iz + 1)
    c111 = _gather(vol, ix + 1, iy + 1, iz + 1)
    c00 = c000 + (c100 - c000) * fx
    c10 = c010 + (c110 - c010) * fx
    c01 = c001 + (c101 - c001) * fx
    c11 = c011 + (c111 - c011) * fx
    c0 = c00 + (c10 - c00) * fy
    c1 = c01 + (c11 - c01) * fy
    return c0 + (c1 - c0) * fz


@jax.custom_vjp
def trilinear_sample(vol: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return trilinear_sample_base(vol, pts)


def _tri_fwd(vol, pts):
    return trilinear_sample_base(vol, pts), (vol, pts)


def _tri_bwd(res, g):
    vol, pts = res
    q, i0, f = _corner_setup(vol.shape, pts)
    ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    X, Y, Z = vol.shape

    # --- gradient to the grid: scatter-add trilinear weights * g
    w000 = (1 - fx) * (1 - fy) * (1 - fz)
    w100 = fx * (1 - fy) * (1 - fz)
    w010 = (1 - fx) * fy * (1 - fz)
    w110 = fx * fy * (1 - fz)
    w001 = (1 - fx) * (1 - fy) * fz
    w101 = fx * (1 - fy) * fz
    w011 = (1 - fx) * fy * fz
    w111 = fx * fy * fz
    flat_g = jnp.zeros(X * Y * Z, vol.dtype)
    gg = g.reshape(-1)
    corners = [
        (0, 0, 0, w000), (1, 0, 0, w100), (0, 1, 0, w010), (1, 1, 0, w110),
        (0, 0, 1, w001), (1, 0, 1, w101), (0, 1, 1, w011), (1, 1, 1, w111),
    ]
    ixf, iyf, izf = ix.reshape(-1), iy.reshape(-1), iz.reshape(-1)
    for dx, dy, dz, w in corners:
        idx = ((ixf + dx) * Y + (iyf + dy)) * Z + (izf + dz)
        flat_g = flat_g.at[idx].add(gg * w.reshape(-1))
    d_vol = flat_g.reshape(X, Y, Z)

    # --- gradient to positions: analytic d(sample)/d(p)
    def corner(dx, dy, dz):
        return _gather(vol, ix + dx, iy + dy, iz + dz)

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    dx_ = ((c100 - c000) * (1 - fy) * (1 - fz) + (c110 - c010) * fy * (1 - fz)
           + (c101 - c001) * (1 - fy) * fz + (c111 - c011) * fy * fz)
    dy_ = ((c010 - c000) * (1 - fx) * (1 - fz) + (c110 - c100) * fx * (1 - fz)
           + (c011 - c001) * (1 - fx) * fz + (c111 - c101) * fx * fz)
    dz_ = ((c001 - c000) * (1 - fx) * (1 - fy) + (c101 - c100) * fx * (1 - fy)
           + (c011 - c010) * (1 - fx) * fy + (c111 - c110) * fx * fy)
    # Clamped points have zero positional gradient outside the volume.
    dims = jnp.array([X, Y, Z], jnp.float32)
    inside = ((pts > 0.0) & (pts < dims - 1.001)).astype(g.dtype)
    d_pts = jnp.stack([dx_, dy_, dz_], axis=-1) * g[..., None] * inside
    return d_vol, d_pts


trilinear_sample.defvjp(_tri_fwd, _tri_bwd)


def nearest_sample(vol: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor gather (labels); vol (X,Y,Z) any dtype."""
    X, Y, Z = vol.shape
    dims = jnp.array([X, Y, Z], jnp.float32)
    q = jnp.round(jnp.clip(pts, 0.0, dims - 1.0)).astype(jnp.int32)
    return _gather(vol, q[..., 0], q[..., 1], q[..., 2])


def trilinear_sample_multi(vols: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """vols (C,X,Y,Z), pts (...,3) -> (..., C)."""
    out = jax.vmap(lambda v: trilinear_sample_base(v, pts))(vols)
    return jnp.moveaxis(out, 0, -1)


def pack_trilinear_corners(vol: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z) -> (X, Y, Z, 8) corner-row volume for
    ``trilinear_sample_packed``: channel c = vol[x+dx, y+dy, z+dz] with
    edge-clamped padding, corner order (dx, dy, dz) =
    (0,0,0),(1,0,0),(0,1,0),(1,1,0),(0,0,1),(1,0,1),(0,1,1),(1,1,1).

    8x the memory buys a single wide row-gather per trilinear sample
    instead of 8 scalar gathers — the same amortization that makes the ROI
    coarse probes affordable (``trilinear_sample_rows``), applied to the
    fine march. On TPU the per-INDEX overhead dominates gather cost, so
    one 8-channel take runs ~3x faster than 8 scalar takes; this is what
    makes protocol-scale (1920x1080) fine-step marches tractable.
    """
    p = jnp.pad(vol, ((0, 1), (0, 1), (0, 1)), mode="edge")
    X, Y, Z = vol.shape
    chans = [p[dx:dx + X, dy:dy + Y, dz:dz + Z]
             for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
    # Reorder to (dx, dy, dz) lexicographic-by-channel spec above:
    # built order is (dz, dy, dx) outer->inner == same list order as spec.
    return jnp.stack(chans, axis=-1)


def trilinear_sample_packed(vol_rows8: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sampling from a ``pack_trilinear_corners`` volume: one
    8-channel row-gather per sample, then the identical lerp chain as
    ``trilinear_sample_base`` (bitwise-equal arithmetic, gather excepted)."""
    X, Y, Z, _ = vol_rows8.shape
    q, i0, f = _corner_setup((X, Y, Z), pts)
    ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    flat = vol_rows8.reshape(-1, 8)
    idx = (ix * Y + iy) * Z + iz
    c = jnp.take(flat, idx, axis=0)
    c000, c100, c010, c110 = c[..., 0], c[..., 1], c[..., 2], c[..., 3]
    c001, c101, c011, c111 = c[..., 4], c[..., 5], c[..., 6], c[..., 7]
    c00 = c000 + (c100 - c000) * fx
    c10 = c010 + (c110 - c010) * fx
    c01 = c001 + (c101 - c001) * fx
    c11 = c011 + (c111 - c011) * fx
    c0 = c00 + (c10 - c00) * fy
    c1 = c01 + (c11 - c01) * fy
    return c0 + (c1 - c0) * fz


def trilinear_sample_rows(vol_rows: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Multi-channel trilinear gather: vol_rows (X, Y, Z, C), pts (..., 3)
    -> (..., C).

    One row-gather per corner instead of C scalar gathers per corner — on
    TPU a wide-row take measures ~3x cheaper than scalar takes (and 8 reads
    replace 8*C), which is what makes multi-feature field probes (the ROI
    policy's 8-feature coarse pass) affordable.
    """
    X, Y, Z, C = vol_rows.shape
    q, i0, f = _corner_setup((X, Y, Z), pts)
    ix, iy, iz = i0[..., 0], i0[..., 1], i0[..., 2]
    fx = f[..., 0:1]
    fy = f[..., 1:2]
    fz = f[..., 2:3]
    flat = vol_rows.reshape(-1, C)

    def rows(ax, ay, az):
        idx = (ax * Y + ay) * Z + az
        return jnp.take(flat, idx, axis=0)

    c000 = rows(ix, iy, iz)
    c100 = rows(ix + 1, iy, iz)
    c010 = rows(ix, iy + 1, iz)
    c110 = rows(ix + 1, iy + 1, iz)
    c001 = rows(ix, iy, iz + 1)
    c101 = rows(ix + 1, iy, iz + 1)
    c011 = rows(ix, iy + 1, iz + 1)
    c111 = rows(ix + 1, iy + 1, iz + 1)
    c00 = c000 + (c100 - c000) * fx
    c10 = c010 + (c110 - c010) * fx
    c01 = c001 + (c101 - c001) * fx
    c11 = c011 + (c111 - c011) * fx
    c0 = c00 + (c10 - c00) * fy
    c1 = c01 + (c11 - c01) * fy
    return c0 + (c1 - c0) * fz


def nearest_sample_rows(vol_rows: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor multi-channel gather: vol_rows (X, Y, Z, C),
    pts (..., 3) -> (..., C) — ONE row-gather per sample (vs 8 for
    ``trilinear_sample_rows``).

    Built for smooth-by-construction probe fields (the ROI policy's
    feature volume: Gaussian-smoothed P/B, max-dilated occupancy, gradient
    magnitude): a <= 0.5-voxel nearest offset sits well inside those
    fields' own smoothing radii, and the 8x gather saving is what removes
    the policy's coarse-pass overhead at protocol resolution."""
    X, Y, Z, C = vol_rows.shape
    dims = jnp.array([X, Y, Z], jnp.float32) - 1.0
    q = jnp.round(jnp.clip(pts, 0.0, dims)).astype(jnp.int32)
    flat = vol_rows.reshape(-1, C)
    idx = (q[..., 0] * Y + q[..., 1]) * Z + q[..., 2]
    return jnp.take(flat, idx, axis=0)


def mip_downsample2(vol: jnp.ndarray) -> jnp.ndarray:
    """One mip level: 2x average-pool with edge padding to even dims.
    The level-1 volume of the ROI policy's optional LOD output
    (``docs/Methodology-ROI-Neural-Volumetric-Rendering.md:43`` "optional
    LOD index/scale") — a prefiltered field whose footprint matches ~2x
    coarser sampling, the classical cone-tracing antialias knob."""
    X, Y, Z = vol.shape
    p = jnp.pad(vol, ((0, X % 2), (0, Y % 2), (0, Z % 2)), mode="edge")
    Xp, Yp, Zp = p.shape
    return p.reshape(Xp // 2, 2, Yp // 2, 2, Zp // 2, 2).mean((1, 3, 5))
