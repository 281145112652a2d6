"""Cooperative hybrid renderer (reference docs/Approach.md:48,172-205 — the
design-study hybrid the reference never implemented): volumetric primary
march + batched BVH mesh visibility (shadow) rays + mesh-seeded empty-space
skip."""
import jax.numpy as jnp
import numpy as np
import pytest

from mri_raytracer_tpu.render.camera import OrbitalCamera
from mri_raytracer_tpu.render.hybrid import (HybridRenderer,
                                             extract_boundary_mesh)


def _scene(n=48):
    """Fuzzy ball volume + a compact cube 'structure' mask beside it."""
    idx = np.indices((n, n, n)).astype(np.float32)
    c = (n - 1) / 2.0
    r = np.sqrt(((idx - c) ** 2).sum(0))
    vol = np.clip(1.0 - r / (0.42 * n), 0.0, 1.0).astype(np.float32)
    mask = np.zeros((n, n, n), bool)
    q = n // 4
    mask[c.__int__() - q: c.__int__() + q,
         c.__int__() - q: c.__int__() + q,
         c.__int__() - q: c.__int__() + q] = True
    return vol, mask


def test_boundary_mesh_cube_counts():
    mask = np.zeros((8, 8, 8), bool)
    mask[2:6, 2:6, 2:6] = True  # 4^3 cube: 6 faces x 16 quads x 2 tris
    verts, tris = extract_boundary_mesh(mask)
    assert tris.shape[0] == 6 * 16 * 2
    # Welded watertight corners: the vertex set must be exactly the cube's
    # surface lattice — the 5^3 corner lattice minus its 3^3 interior.
    assert verts.shape[0] == 5 ** 3 - 3 ** 3


def test_boundary_mesh_downsample_dilates():
    mask = np.zeros((9, 9, 9), bool)
    mask[3:6, 3:6, 3:6] = True
    v1, t1 = extract_boundary_mesh(mask)
    v2, t2 = extract_boundary_mesh(mask, downsample=3)
    assert t2.shape[0] < t1.shape[0]
    # Any-pooled occluder CONTAINS the original (conservative dilation).
    assert v2.min() <= v1.min() + 1e-6 and v2.max() >= v1.max() - 1e-6


def test_shadow_darkens_far_side():
    vol, mask = _scene(40)
    # Occluder BETWEEN the light and the ball: a slab offset along +x.
    slab = np.zeros_like(mask)
    slab[34:38, 8:32, 8:32] = True
    # theta=pi puts the eye on the +x (lit) side in the camera's base frame
    # (base right = (-1,0,0)), so the shadowed cap faces the camera.
    cam = OrbitalCamera(radius=3.0, theta=np.pi, phi=1.2)
    r_sh = HybridRenderer(vol, slab, width=96, height=96,
                          light_dir=(1.0, 0.0, 0.0), max_steps=96)
    img_on = r_sh.render_numpy(cam.basis(), shadows=True, mesh_skip=False)
    img_off = r_sh.render_numpy(cam.basis(), shadows=False, mesh_skip=False)
    assert np.all(img_on <= img_off + 1e-6)
    # and strictly darker somewhere (the shadowed cap of the ball)
    assert (img_off - img_on).max() > 0.05
    assert np.isfinite(img_on).all()


def test_mesh_skip_close_to_no_skip():
    vol, mask = _scene(40)
    # Occluder mask == the bright core of the volume itself, so the skip
    # starts marching just before the content it would have reached anyway.
    core = vol > 0.55
    cam = OrbitalCamera(radius=3.0, theta=0.8, phi=0.9)
    r = HybridRenderer(vol, core, width=96, height=96, max_steps=160)
    a = r.render_numpy(cam.basis(), mesh_skip=False)
    b = r.render_numpy(cam.basis(), mesh_skip=True)
    # Skip changes the sample lattice (and drops the faint halo outside the
    # core), so require close-but-not-necessarily-equal images.
    err = np.sqrt(np.mean((a - b) ** 2))
    assert err < 0.06, err


def test_empty_mask_renders():
    vol, _ = _scene(32)
    r = HybridRenderer(vol, np.zeros_like(vol, dtype=bool), width=64,
                       height=64, max_steps=64)
    img = r.render_numpy(OrbitalCamera(radius=3.0).basis())
    assert np.isfinite(img).all() and img.max() > 0.0


def test_boundary_mesh_noncubic_matches_volume_box():
    """The mesh's default world mapping must use the CENTERED box of
    render_hybrid (bmin = -(dims*vs)/2) — a fixed (-1,-1,-1) origin
    displaces the occluder along every non-longest axis of a non-cubic
    volume (e.g. a real 240x240x155 BraTS case)."""
    shape = (12, 12, 8)
    mask = np.ones(shape, bool)
    verts, _ = extract_boundary_mesh(mask)
    dims = np.array(shape, np.float32)
    vs = 2.0 / dims.max()
    bmin = -(dims * vs) / 2.0
    bmax = (dims * vs) / 2.0
    np.testing.assert_allclose(verts.min(0), bmin, atol=1e-6)
    np.testing.assert_allclose(verts.max(0), bmax, atol=1e-6)


def test_hybrid_shadow_noncubic_volume():
    """End-to-end on a non-cubic volume: the occluder must darken the far
    side exactly as in the cubic test (regression for the mesh/volume box
    mismatch)."""
    n, nz = 48, 36
    idx = np.indices((n, n, nz)).astype(np.float32)
    c = np.array([(n - 1) / 2, (n - 1) / 2, (nz - 1) / 2],
                 np.float32)[:, None, None, None]
    r = np.sqrt(((idx - c) ** 2).sum(0))
    vol = np.clip(1.0 - r / (0.42 * n), 0.0, 1.0).astype(np.float32)
    mask = np.zeros(vol.shape, bool)
    q = n // 4
    mask[n // 2 - q: n // 2 + q, n // 2 - q: n // 2 + q,
         nz // 2 - q // 2: nz // 2 + q // 2] = True
    rend = HybridRenderer(vol, mask, width=64, height=64)
    cam = OrbitalCamera(radius=2.6, theta=0.7, phi=1.1)
    img_sh = np.asarray(rend.render(cam.basis(), shadows=True))
    img_ns = np.asarray(rend.render(cam.basis(), shadows=False))
    assert np.isfinite(img_sh).all() and np.isfinite(img_ns).all()
    # Shadows only ever remove light, and must remove a measurable amount
    # somewhere (the mask occludes part of the ball from the light).
    assert img_sh.mean() < img_ns.mean() - 1e-4
    assert (img_ns - img_sh).max() > 0.01
