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


def test_grid_mip_renderer():
    """MIP == max of trilinear samples along the ray: >= any single
    composite sample's contribution at the same pose, monotone in the
    volume, and exactly the center-voxel value for a single bright voxel
    through the center pixel."""
    vol = synthetic.synthetic_u8_volume((24, 24, 24), seed=2)
    cam = OrbitalCamera(radius=3.0)
    p = rx.GridRenderParams(step_count=jnp.float32(96),
                            near=jnp.float32(1.0), far=jnp.float32(6.0))
    img = np.asarray(rx.render_grid_mip(jnp.asarray(vol), cam.basis(), p,
                                        W, H, 128))
    assert img.shape == (H, W, 3) and np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0 + 1e-5
    # A single saturated voxel at the cube center: a fine march's MIP at
    # the center pixel must recover most of the peak (the trilinear
    # support is ~2 voxels, so the capture depends on step density — at
    # 1024 steps over the 5-unit span the step is ~1/17 voxel), and the
    # corners must stay black.
    vol1 = np.zeros((25, 25, 25), np.uint8)
    vol1[12, 12, 12] = 255
    p_fine = p._replace(step_count=jnp.float32(1024))
    img1 = np.asarray(rx.render_grid_mip(jnp.asarray(vol1), cam.basis(),
                                         p_fine, W, H, 1024))
    # The nearest ray passes up to half a pixel off the voxel center, so
    # the trilinear peak along it lands well below 1.0; assert the bright
    # spot exists, sits at the image center, and the field is black away
    # from it.
    iy, ix = np.unravel_index(img1[..., 0].argmax(), (H, W))
    assert img1[iy, ix, 0] > 0.3
    assert abs(iy - H // 2) <= 1 and abs(ix - W // 2) <= 1
    assert img1[0, 0, 0] < 1e-3
    # Monotonicity: brighter volume -> pointwise >= MIP.
    imgb = np.asarray(rx.render_grid_mip(
        jnp.asarray(np.minimum(vol.astype(np.int32) * 2, 255)
                    .astype(np.uint8)), cam.basis(), p, W, H, 128))
    assert (imgb + 1e-6 >= img).all()


def test_grid_iso_renderer():
    """Iso mode: a solid ball shows a lit surface (nonzero interior,
    black background, shading variation across the disk), and raising the
    threshold above the data yields an empty image."""
    n = 24
    idx = np.indices((n, n, n)).astype(np.float32)
    c = (n - 1) / 2.0
    r = np.sqrt(((idx - c) ** 2).sum(0))
    vol = (255 * (r < n * 0.35)).astype(np.uint8)
    cam = OrbitalCamera(radius=3.0)
    p = rx.GridRenderParams(step_count=jnp.float32(128),
                            near=jnp.float32(1.0), far=jnp.float32(6.0))
    img = np.asarray(rx.render_grid_iso(jnp.asarray(vol), cam.basis(), p,
                                        W, H, 160, iso=0.5))
    assert img.shape == (H, W, 3) and np.isfinite(img).all()
    assert img[H // 2, W // 2, 0] > 0.05      # lit surface at the center
    assert img[0, 0, 0] == 0.0                # background black
    disk = img[..., 0][img[..., 0] > 0]
    assert disk.std() > 0.02                  # Phong shading varies
    empty = np.asarray(rx.render_grid_iso(jnp.asarray(vol), cam.basis(), p,
                                          W, H, 160, iso=1.5))
    assert float(empty.max()) == 0.0
