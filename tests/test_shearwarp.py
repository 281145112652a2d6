"""Golden tests: shear-warp fast renderer vs the XLA oracle marcher.

The sweep samples at plane crossings, the oracle at uniform delta-t; both
discretize the same emission-absorption integral, so with matched effective
step sizes (oracle dt = voxel pitch) images must agree to >= 40 dB PSNR
(the BASELINE.md quality bar).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.data import synthetic, brats
from mri_raytracer_tpu.eval.metrics import psnr
from mri_raytracer_tpu.ops import raymarch_xla as rx
from mri_raytracer_tpu.ops import shearwarp as sw
from mri_raytracer_tpu.render import params as rp
from mri_raytracer_tpu.render.camera import OrbitalCamera

SHAPE = (32, 32, 28)
VOX = 1.8 / 32


@pytest.fixture(scope="module")
def scene():
    mods, seg = synthetic.synthetic_case(SHAPE, seed=1)
    mods_disp = np.stack([brats.percentile_normalize(m) for m in mods])
    return jnp.asarray(mods_disp), jnp.asarray(seg.astype(np.int32))


def _pair(scene, theta, phi, show_seg, show_pred=False, out_mult=2):
    mods, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=show_seg, show_pred=show_pred,
                                 step_size=VOX)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=theta, phi=phi)
    b = cam.basis()
    pred = seg if show_pred else None
    img_o = np.asarray(rx.render_brats(mods, seg if show_seg else None, pred,
                                       b, p, 96, 96, max_steps=2048))
    img_s = np.asarray(sw.render_brats(mods, seg if show_seg else None, pred,
                                       b, p, 96, 96, out_res=96 * out_mult))
    return img_o, img_s


# Views covering all three sweep axes + an oblique worst case.
VIEWS = [(0.0, 1.57), (1.57, 1.57), (0.1, 0.2), (2.4, 0.6), (4.2, 2.2)]


@pytest.mark.parametrize("theta,phi", VIEWS)
def test_sweep_matches_oracle_intensity(scene, theta, phi):
    img_o, img_s = _pair(scene, theta, phi, show_seg=False)
    assert psnr(img_s, img_o) >= 40.0


@pytest.mark.parametrize("theta,phi", VIEWS[:3])
def test_sweep_matches_oracle_with_overlays(scene, theta, phi):
    img_o, img_s = _pair(scene, theta, phi, show_seg=True, show_pred=True)
    assert psnr(img_s, img_o) >= 38.0  # nearest-label sampling is positional


def test_slab_equals_plane_scan(scene):
    """The slab-batched fast path must reproduce the per-plane scan exactly
    (same math, different schedule)."""
    mods, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=True, step_size=VOX)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.7, phi=1.1)
    b = cam.basis()
    axis = sw.dominant_axis(b)
    mixed = sw.blend_modalities(mods, p.vol_enabled, p.vol_weight)
    ms = sw._perm_volume(mixed, axis)
    ss = sw._perm_volume(seg, axis)
    geom = sw.sweep_geometry(b, p, ms.shape, axis, 64)
    C1, T1 = sw.sweep_composite(ms, ss, None, geom, p, axis, 64, 1)
    C2, T2 = sw.sweep_composite_slab(ms, ss, None, geom, p, axis, 64)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), atol=2e-3)


def test_supersampling_improves_or_holds(scene):
    mods, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=False, step_size=VOX * 0.5)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.0, phi=1.57)
    b = cam.basis()
    img_o = np.asarray(rx.render_brats(mods, None, None, b, p, 96, 96, 2048))
    ps = []
    for ss in (1, 2):
        img_s = np.asarray(sw.render_brats(mods, None, None, b, p, 96, 96,
                                           out_res=192, supersample=ss))
        ps.append(psnr(img_s, img_o))
    assert ps[1] >= ps[0] - 1.0  # finer planes should not get worse


def test_background_outside_shadow(scene):
    mods, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=False)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.3, phi=1.0)
    img = np.asarray(sw.render_brats(mods, None, None, cam.basis(), p, 96, 96))
    np.testing.assert_allclose(img[0, 0], np.asarray(p.bg_color), atol=1e-5)


def test_hat_matrix_rows_sum_to_one():
    W, mask = sw.hat_matrix(jnp.float32(0.3), jnp.float32(0.5), 16, 8)
    sums = np.asarray(W.sum(axis=1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-6)


def test_nearest_matrix_one_hot():
    W = sw.nearest_matrix(jnp.float32(0.3), jnp.float32(0.7), 16, 8)
    W = np.asarray(W)
    assert ((W == 0) | (W == 1)).all()
    np.testing.assert_allclose(W.sum(axis=1), 1.0)


def test_renderer_front_end_backends(scene):
    from mri_raytracer_tpu.render.brats import BratsRenderer

    mods, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE))
    for backend in ("sweep", "xla"):
        r = BratsRenderer(mods, seg, None, width=48, height=48,
                          max_steps=128, backend=backend)
        img = r.render_numpy(cam.basis(), p)
        assert img.shape == (48, 48, 3)
        assert np.isfinite(img).all()


def test_content_crop_matches_full():
    """Content-cropped render (k-slab + in-plane crop + shrunk intermediate)
    agrees with the uncropped render when empty voxels emit nothing
    (transfer(0) == 0). The crop changes the intermediate ray grid (the
    content box's projection, sampled at >= the uncropped density), so the
    images are resamplings of the same integral — compare by PSNR and
    against the oracle."""
    import jax.numpy as jnp
    from mri_raytracer_tpu.data import brats as brats_mod
    from mri_raytracer_tpu.data import synthetic
    from mri_raytracer_tpu.ops import raymarch_xla as rx2
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.brats import BratsRenderer
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    # Volume with large empty margins along every axis.
    mods, seg = synthetic.synthetic_case((24, 24, 20), seed=5)
    disp = np.stack([brats_mod.percentile_normalize(m) for m in mods])
    big = np.zeros((4, 72, 72, 64), np.float32)
    big[:, 24:48, 24:48, 22:42] = disp
    seg_big = np.zeros((72, 72, 64), np.int32)
    seg_big[24:48, 24:48, 22:42] = seg

    shape = big.shape[1:]
    p = rp.default_render_params(shape, show_seg=True, step_size=1.8 / 72)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, shape),
                        theta=0.7, phi=1.0)
    r = BratsRenderer(jnp.asarray(big), jnp.asarray(seg_big), None,
                      width=64, height=64, backend="sweep", sweep_res=256)
    assert r._bbox[0][0] >= 24 and r._bbox[0][1] <= 48
    assert r._bbox[2][0] >= 22 and r._bbox[2][1] <= 42
    img_crop = np.asarray(r.render(cam.basis(), p))

    # Force no crop by monkeypatching the bbox to the full volume.
    r2 = BratsRenderer(jnp.asarray(big), jnp.asarray(seg_big), None,
                       width=64, height=64, backend="sweep", sweep_res=256)
    r2._bbox = [(0, 72), (0, 72), (0, 64)]
    img_full = np.asarray(r2.render(cam.basis(), p))
    assert psnr(img_crop, img_full) >= 45.0

    # Both stay within the golden bar of the exact oracle.
    img_o = np.asarray(rx2.render_brats(jnp.asarray(big), jnp.asarray(seg_big),
                                        None, cam.basis(), p, 64, 64,
                                        max_steps=2048))
    assert psnr(img_crop, img_o) >= 38.0
    assert psnr(img_full, img_o) >= 38.0


@pytest.mark.parametrize("theta,phi", VIEWS)
def test_sweep_scalars_np_matches_traced(theta, phi):
    """The host (numpy) geometry twin must agree with the traced
    sweep_geometry on every map scalar — it sizes the warp kernel window
    before dispatch (warp_window_hint), so drift would silently mis-pick
    the window (cost: gather fallback, caught here instead)."""
    dims = (64, 64, 56)
    p = rp.default_render_params(dims, show_seg=False, step_size=VOX)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, dims),
                        theta=theta, phi=phi)
    b = cam.basis()
    for content in (None, ((8.0, 4.0, 6.0), (56.0, 60.0, 50.0))):
        lo, hi = content if content else (None, None)
        for axis in range(3):
            dims_perm = tuple(dims[o] for o in
                              {0: (0, 1, 2), 1: (1, 0, 2),
                               2: (2, 0, 1)}[axis])
            lo_p = hi_p = None
            if content:
                order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
                lo_p = tuple(lo[o] for o in order)
                hi_p = tuple(hi[o] for o in order)
            g = sw.sweep_geometry(
                b, p, dims_perm, axis, 128,
                None if lo_p is None else jnp.asarray(lo_p, jnp.float32),
                None if hi_p is None else jnp.asarray(hi_p, jnp.float32),
                frustum_wh=(96, 96))
            w_base, e, a0, da, b0, db = sw._sweep_scalars_np(
                b, p, dims_perm, axis, 128, lo_p, hi_p, (96, 96))
            for name, traced, host in (
                    ("w_base", g.w_base, w_base), ("a0", g.a0, a0),
                    ("da", g.da, da), ("b0", g.b0, b0), ("db", g.db, db)):
                np.testing.assert_allclose(
                    float(traced), host, rtol=2e-4, atol=2e-4,
                    err_msg=f"{name} axis={axis} pose=({theta},{phi}) "
                            f"content={content is not None}")
            np.testing.assert_allclose(np.asarray(g.e), e, rtol=1e-5)


@pytest.mark.parametrize("theta,phi", VIEWS + [(0.85, 0.85), (0.6, 1.2)])
def test_warp_window_hint_fits_device(theta, phi):
    """Whenever the hint picks a sub-maximal window, the device-side
    footprint analysis with that window must report fits=True — otherwise
    the hint saves FLOPs only to trigger the gather fallback."""
    from mri_raytracer_tpu.ops import pallas_warp as pw

    dims_perm = (64, 64, 56)
    W = H = 128
    out_res = 128
    p = rp.default_render_params((64, 64, 56), show_seg=False,
                                 step_size=VOX)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, dims_perm),
                        theta=theta, phi=phi)
    b = cam.basis()
    axis = sw.dominant_axis(b)
    win = sw.warp_window_hint(b, p, dims_perm, axis, out_res, W, H)
    assert win in pw.WINDOW_LADDER
    if win == pw.WINDOW_LADDER[-1]:
        return  # ladder max: in-program fits check is the only gate
    geom = sw.sweep_geometry(b, p, dims_perm, axis, out_res,
                             frustum_wh=(W, H))
    img = jnp.zeros((out_res, out_res, 3), jnp.float32)
    # Reproduce warp_to_screen's maps, then check the device-side fit.
    order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
    f = 1.0 / np.tan(0.5 * float(b.fov_y))
    aspect = W / float(H)
    xs = (np.arange(W) + 0.5) / W * 2.0 - 1.0
    ys = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    cx = (xs * aspect / f)[None, :]
    cy = (-ys / f)[:, None]
    R = np.array([np.asarray(b.right)[o] for o in order])
    U = np.array([np.asarray(b.up)[o] for o in order])
    F = np.array([np.asarray(b.forward)[o] for o in order])
    dk = cx * R[0] + cy * U[0] + F[0]
    denom = np.where(np.abs(dk) < 1e-6, 1e-6, dk)
    t_base = (float(geom.w_base) - float(geom.e[0])) / denom
    i_map = np.clip((float(geom.e[1]) + t_base * (cx * R[1] + cy * U[1]
                                                  + F[1])
                     - float(geom.a0)) / float(geom.da), 0, out_res - 1.0)
    j_map = np.clip((float(geom.e[2]) + t_base * (cx * R[2] + cy * U[2]
                                                  + F[2])
                     - float(geom.b0)) / float(geom.db), 0, out_res - 1.0)
    _, _, _, fits = pw.warp_fit_starts(jnp.asarray(i_map, jnp.float32),
                                       jnp.asarray(j_map, jnp.float32),
                                       out_res, H, W, win=win)
    assert bool(fits), (win, theta, phi, axis)


def test_crop_out_res_rule():
    """The shared crop->intermediate-resolution rule (ops/shearwarp
    crop_out_res) used by BOTH the production and the fused neural
    renderer: uncropped passthrough, 128 round-up/floor, never above the
    base resolution."""
    from mri_raytracer_tpu.ops.shearwarp import crop_out_res

    dims = (256, 200, 180)
    # Uncropped in-plane -> base res, flag False (k-crop alone is a slab).
    o, f = crop_out_res(1024, ((16, 240), (0, 200), (0, 180)), dims)
    assert (o, f) == (1024, False)
    # Half-content crop: 0.5 * 1024 = 512, already a 128 multiple.
    o, f = crop_out_res(1024, ((0, 256), (50, 150), (45, 135)), dims)
    assert (o, f) == (512, True)
    # Round UP to 128 (sampling density only ever raised).
    o, f = crop_out_res(1024, ((0, 256), (0, 110), (0, 99)), dims)
    assert f and o == 640 and o % 128 == 0  # ceil(0.55*1024 / 128)*128
    # Floor at 128, cap at base.
    o, _ = crop_out_res(1024, ((0, 256), (0, 8), (0, 8)), dims)
    assert o == 128
    o, _ = crop_out_res(256, ((0, 256), (0, 199), (0, 179)), dims)
    assert o == 256
