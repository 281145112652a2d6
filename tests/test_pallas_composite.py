"""Fused Pallas composite kernel vs the XLA scan (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.data import brats, synthetic
from mri_raytracer_tpu.ops import shearwarp as sw
from mri_raytracer_tpu.ops.pallas_composite import sweep_composite_pallas
from mri_raytracer_tpu.render import params as rp
from mri_raytracer_tpu.render.camera import OrbitalCamera

SHAPE = (24, 24, 20)


@pytest.fixture(scope="module")
def scene():
    mods, seg = synthetic.synthetic_case(SHAPE, seed=1)
    disp = jnp.asarray(np.stack([brats.percentile_normalize(m) for m in mods]))
    return disp, jnp.asarray(seg.astype(np.int32))


@pytest.mark.parametrize("theta,phi,with_seg", [(0.7, 1.1, True),
                                                (0.0, 1.57, False),
                                                (4.2, 2.2, True)])
def test_fused_composite_matches_scan(scene, theta, phi, with_seg):
    disp, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=theta, phi=phi)
    b = cam.basis()
    axis = sw.dominant_axis(b)
    mixed = sw.blend_modalities(disp, p.vol_enabled, p.vol_weight)
    ms = sw._perm_volume(mixed, axis)
    ss = sw._perm_volume(seg, axis) if with_seg else None
    O = 128
    geom = sw.sweep_geometry(b, p, ms.shape, axis, O)
    C1, T1 = sw.sweep_composite(ms, ss, None, geom, p, axis, O, 1,
                                use_gamma=False, use_clip=False)
    C2, T2 = sweep_composite_pallas(ms, ss, None, geom, p, axis, O,
                                    use_gamma=False, use_clip=False,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C2), atol=3e-3)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=3e-3)


def test_fused_composite_pred_overlay(scene):
    disp, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=True, show_pred=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE))
    b = cam.basis()
    axis = sw.dominant_axis(b)
    mixed = sw.blend_modalities(disp, p.vol_enabled, p.vol_weight)
    ms = sw._perm_volume(mixed, axis)
    ss = sw._perm_volume(seg, axis)
    O = 128
    geom = sw.sweep_geometry(b, p, ms.shape, axis, O)
    C1, T1 = sw.sweep_composite(ms, ss, ss, geom, p, axis, O, 1,
                                use_gamma=False, use_clip=False)
    C2, T2 = sweep_composite_pallas(ms, ss, ss, geom, p, axis, O,
                                    use_gamma=False, use_clip=False,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C2), atol=3e-3)


def test_fused_composite_slab_mode(scene):
    """Slab (z_offset/nk_global) pallas composite == scan slab composite."""
    disp, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.7, phi=1.1)
    b = cam.basis()
    axis = sw.dominant_axis(b)
    mixed = sw.blend_modalities(disp, p.vol_enabled, p.vol_weight)
    ms = sw._perm_volume(mixed, axis)
    ss = sw._perm_volume(seg, axis)
    O = 128
    nk = ms.shape[0]
    geom = sw.sweep_geometry(b, p, ms.shape, axis, O)
    lo, hi = 4, nk - 4
    C1, T1 = sw.sweep_composite(ms[lo:hi], ss[lo:hi], None, geom, p, axis, O,
                                1, use_gamma=False, use_clip=False,
                                z_offset=float(lo), nk_global=nk)
    C2, T2 = sweep_composite_pallas(ms[lo:hi], ss[lo:hi], None, geom, p,
                                    axis, O, use_gamma=False, use_clip=False,
                                    interpret=True, z_offset=float(lo),
                                    nk_global=nk)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=2e-3)
