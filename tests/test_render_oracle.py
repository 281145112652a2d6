"""Oracle ray-marcher invariants on synthetic volumes."""

import numpy as np
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.data import synthetic, brats
from mri_raytracer_tpu.ops import raymarch_xla as rx
from mri_raytracer_tpu.render import params as rp
from mri_raytracer_tpu.render.camera import OrbitalCamera

W = H = 48
SHAPE = (24, 24, 20)


@pytest.fixture(scope="module")
def scene():
    mods, seg = synthetic.synthetic_case(SHAPE, seed=1)
    # display normalization like the viewer path
    mods_disp = np.stack([brats.percentile_normalize(m) for m in mods])
    p = rp.default_render_params(SHAPE, show_seg=True, show_pred=False)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE))
    return jnp.asarray(mods_disp), jnp.asarray(seg.astype(np.int32)), p, cam


def test_render_shapes_and_finite(scene):
    mods, seg, p, cam = scene
    img = rx.render_brats(mods, seg, None, cam.basis(), p, W, H, max_steps=256)
    img = np.asarray(img)
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0


def test_background_at_corners_content_in_middle(scene):
    mods, seg, p, cam = scene
    img = np.asarray(rx.render_brats(mods, seg, None, cam.basis(), p, W, H, 256))
    # corners miss the AABB -> exact background
    np.testing.assert_allclose(img[0, 0], np.asarray(p.bg_color), atol=1e-6)
    # center hits the volume -> nonzero
    assert img[H // 2, W // 2].max() > 0.01


def test_zero_alpha_no_overlays_gives_background(scene):
    mods, seg, p, cam = scene
    p0 = p._replace(intensity_alpha=jnp.float32(0.0), show_seg=jnp.float32(0.0))
    img = np.asarray(rx.render_brats(mods, seg, None, cam.basis(), p0, W, H, 256))
    np.testing.assert_allclose(img, 0.0, atol=1e-6)


def test_seg_overlay_adds_color(scene):
    mods, seg, p, cam = scene
    p_no = p._replace(show_seg=jnp.float32(0.0))
    img_no = np.asarray(rx.render_brats(mods, seg, None, cam.basis(), p_no, W, H, 256))
    img_yes = np.asarray(rx.render_brats(mods, seg, None, cam.basis(), p, W, H, 256))
    assert np.abs(img_yes - img_no).max() > 0.05


def test_pred_overlay_independent_toggle(scene):
    mods, seg, p, cam = scene
    p_pred = p._replace(show_seg=jnp.float32(0.0), show_pred=jnp.float32(1.0))
    img_with = np.asarray(rx.render_brats(mods, seg, seg, cam.basis(), p_pred, W, H, 256))
    p_off = p_pred._replace(show_pred=jnp.float32(0.0))
    img_without = np.asarray(rx.render_brats(mods, seg, seg, cam.basis(), p_off, W, H, 256))
    assert np.abs(img_with - img_without).max() > 0.05


def test_transmittance_monotone_in_alpha(scene):
    """Higher intensity_alpha -> at least as much accumulated intensity."""
    mods, seg, p, cam = scene
    p1 = p._replace(show_seg=jnp.float32(0.0), intensity_alpha=jnp.float32(0.2))
    p2 = p1._replace(intensity_alpha=jnp.float32(0.8))
    i1 = np.asarray(rx.render_brats(mods, seg, None, cam.basis(), p1, W, H, 256))
    i2 = np.asarray(rx.render_brats(mods, seg, None, cam.basis(), p2, W, H, 256))
    assert i2.sum() > i1.sum()


def test_modality_blend_weights(scene):
    """Disabling all but one modality == rendering that single modality."""
    mods, seg, p, cam = scene
    only0 = p._replace(vol_enabled=jnp.array([1.0, 0, 0, 0]), show_seg=jnp.float32(0.0))
    img_sel = np.asarray(rx.render_brats(mods, seg, None, cam.basis(), only0, W, H, 256))
    img_single = np.asarray(rx.render_brats(mods[:1], seg, None, cam.basis(),
                                            only0, W, H, 256))
    np.testing.assert_allclose(img_sel, img_single, atol=1e-5)


def test_grid_u8_renderer():
    vol = synthetic.synthetic_u8_volume((24, 24, 24), seed=2)
    cam = OrbitalCamera(radius=3.0)
    p = rx.GridRenderParams(step_count=jnp.float32(64),
                            near=jnp.float32(1.0), far=jnp.float32(6.0))
    img = np.asarray(rx.render_grid_u8(jnp.asarray(vol), cam.basis(), p, W, H, 128))
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0 + 1e-5
    assert img[H // 2, W // 2, 0] > 0.05  # density visible in the middle
