"""Arithmetic accounting (utils/arith): the compositor's executed-plane
instrumentation (echo='planes', interpret mode) and the FLOP model."""

import numpy as np
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.data import brats, synthetic
from mri_raytracer_tpu.ops import shearwarp as sw
from mri_raytracer_tpu.ops.pallas_composite import sweep_composite_pallas
from mri_raytracer_tpu.render import params as rp
from mri_raytracer_tpu.render.camera import OrbitalCamera
from mri_raytracer_tpu.utils import arith

SHAPE = (24, 24, 20)


@pytest.fixture(scope="module")
def scene():
    mods, seg = synthetic.synthetic_case(SHAPE, seed=1)
    disp = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    return disp, jnp.asarray(seg.astype(np.int32))


def _counts(scene, theta=0.7, phi=1.1, O=128):
    disp, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=theta, phi=phi)
    b = cam.basis()
    axis = sw.dominant_axis(b)
    mixed = sw.blend_modalities(disp, p.vol_enabled, p.vol_weight)
    ms = sw._perm_volume(mixed, axis)
    ss = sw._perm_volume(seg, axis)
    geom = sw.sweep_geometry(b, p, ms.shape, axis, O)
    _, counts = sweep_composite_pallas(ms, ss, None, geom, p, axis, O,
                                       use_gamma=False, use_clip=False,
                                       interpret=True, echo="planes")
    n_planes = ms.shape[0] + 1
    return np.asarray(counts), n_planes


def test_executed_plane_counts(scene):
    counts, n_planes = _counts(scene)
    # Integer-valued, bounded by the plane budget, and some planes actually
    # ran (the scene has content).
    assert np.all(counts == np.round(counts))
    assert counts.min() >= 0 and counts.max() <= n_planes
    assert counts.max() > 0
    # (This direct call has no content crop and the tiny volume never
    # saturates opacity, so all planes may legitimately run — the exactness
    # property is the bound, not a guaranteed saving.)


def test_echo_does_not_change_image(scene):
    """The instrumented program's C channel is bit-identical to the
    production program's (the counter lives in SMEM and touches nothing
    else)."""
    disp, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.7, phi=1.1)
    b = cam.basis()
    axis = sw.dominant_axis(b)
    mixed = sw.blend_modalities(disp, p.vol_enabled, p.vol_weight)
    ms = sw._perm_volume(mixed, axis)
    ss = sw._perm_volume(seg, axis)
    geom = sw.sweep_geometry(b, p, ms.shape, axis, 128)
    C1, _ = sweep_composite_pallas(ms, ss, None, geom, p, axis, 128,
                                   use_gamma=False, use_clip=False,
                                   interpret=True)
    C2, _ = sweep_composite_pallas(ms, ss, None, geom, p, axis, 128,
                                   use_gamma=False, use_clip=False,
                                   interpret=True, echo="planes")
    np.testing.assert_array_equal(np.asarray(C1), np.asarray(C2))


def test_frame_flops_model(scene):
    counts, n_planes = _counts(scene)
    O = counts.shape[0]
    stats = {"out_res": O, "planes": n_planes, "Na": SHAPE[0],
             "Nb": SHAPE[1], "warp_win": (112, 256), "has_seg": True,
             "has_pred": False, "axis": 2}
    ub = arith.frame_flops(stats, 128, 128)
    exact = arith.frame_flops(stats, 128, 128, executed_planes=counts)
    # Exact stage 2 is bounded by the static count; stage 1 / warp match.
    assert exact["flops_stage2"] <= ub["flops_stage2"]
    assert exact["flops_stage1"] == ub["flops_stage1"]
    assert exact["flops_warp"] == ub["flops_warp"]
    assert exact["stage2_exact"] and not ub["stage2_exact"]
    assert 0 < exact["steps_per_ray_eff"] <= exact["steps_per_ray_max"]
    # Telescoped identity: stage2 == 2*Na*(1+overlays)*sum(counts).
    want = 2.0 * SHAPE[0] * 2 * counts.sum(dtype=np.float64)
    assert exact["flops_stage2"] == pytest.approx(want)


def test_mfu_accounting():
    out = arith.mfu(1e9, 100.0)
    assert out["tflops_per_s"] == pytest.approx(0.1)
    assert 0 < out["mfu"] < 1
    assert out["peak_tflops"] > 0


def test_renderer_frame_stats(scene):
    from mri_raytracer_tpu.render.brats import BratsRenderer

    disp, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=True)
    r = BratsRenderer(disp, seg, None, width=128, height=128)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.7, phi=1.1)
    stats = r.frame_stats(cam.basis(), p)
    assert stats["planes"] >= 1
    assert stats["out_res"] % 128 == 0
    assert stats["Na"] > 0 and stats["Nb"] > 0
    assert stats["has_seg"] and not stats["has_pred"]
    # Geometry must agree with what the render path uses (shared helper).
    img = r.render(cam.basis(), p)
    assert np.isfinite(np.asarray(img)).all()
    # Supersampling multiplies the marched planes (n_planes = Nk*ss + 1):
    # the accounting must charge for them (a ss=2 renderer was previously
    # billed at ss=1 FLOPs).
    r2 = BratsRenderer(disp, seg, None, width=128, height=128,
                       supersample=2)
    stats2 = r2.frame_stats(cam.basis(), p)
    assert stats2["planes"] == (stats["planes"] - 1) * 2 + 1
