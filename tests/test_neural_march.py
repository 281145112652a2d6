"""Fused neural march (mode 2) vs bake-then-render (mode 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.config import ModelConfig
from mri_raytracer_tpu.data import synthetic, brats
from mri_raytracer_tpu.eval.metrics import psnr
from mri_raytracer_tpu.models.api import build_model
from mri_raytracer_tpu.ops import neural_march, shearwarp as sw
from mri_raytracer_tpu.render import params as rp
from mri_raytracer_tpu.render.camera import OrbitalCamera

SHAPE = (24, 24, 20)


@pytest.fixture(scope="module")
def scene():
    mods, seg = synthetic.synthetic_case(SHAPE, seed=2)
    disp = np.stack([brats.percentile_normalize(m) for m in mods])
    zsc = np.stack([brats.zscore_nonzero(m.copy()) for m in mods])
    return (jnp.asarray(disp), jnp.asarray(zsc),
            jnp.asarray(seg.astype(np.int32)))


def _const_class_model(cls: int, num_classes: int = 4):
    """MLP whose logits always favor ``cls`` (bias-only)."""
    cfg = ModelConfig(hidden_dims=(8,), fourier_freqs=2, num_classes=num_classes)
    model = build_model(cfg, num_modalities=4)
    params = model.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    params[-1]["b"] = params[-1]["b"].at[cls].set(10.0)
    return model, params


def test_constant_predictor_matches_baked_overlay(scene):
    disp, zsc, seg = scene
    model, params = _const_class_model(2)
    p = rp.default_render_params(SHAPE, show_seg=False, show_pred=True,
                                 step_size=1.8 / 24)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.5, phi=1.2)
    b = cam.basis()
    img_fused = np.asarray(neural_march.render_brats_neural(
        disp, zsc, None, model, params, b, p, 64, 64, out_res=96))
    # mode 1: bake an all-2 prediction volume, render via the sweep
    pred = jnp.full(SHAPE, 2, jnp.int32)
    img_baked = np.asarray(sw.render_brats(disp, None, pred, b, p, 64, 64,
                                           out_res=96))
    assert psnr(img_fused, img_baked) >= 45.0


def test_neural_march_with_trained_like_model(scene):
    """Smoke: a random (realistically-shaped) INR renders finite images and
    the prediction overlay responds to show_pred."""
    disp, zsc, seg = scene
    cfg = ModelConfig(hidden_dims=(16, 16), fourier_freqs=4, num_classes=4)
    model = build_model(cfg, num_modalities=4)
    params = model.init(jax.random.PRNGKey(3))
    # Nudge the logit bias toward class 3 so the INR predicts tumor
    # somewhere deterministic — the overlay must then be visible.
    params[-1]["b"] = params[-1]["b"].at[3].set(5.0)
    p = rp.default_render_params(SHAPE, show_seg=True, show_pred=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE))
    b = cam.basis()
    img_on = np.asarray(neural_march.render_brats_neural(
        disp, zsc, seg, model, params, b, p, 48, 48))
    assert np.isfinite(img_on).all()
    p_off = p._replace(show_pred=np.float32(0.0))
    img_off = np.asarray(neural_march.render_brats_neural(
        disp, zsc, seg, model, params, b, p_off, 48, 48))
    assert np.isfinite(img_off).all()
    # Toggling show_pred must change the rendered content (the round-1 test
    # only compared shapes — vacuous).
    assert float(np.abs(img_on - img_off).max()) > 1e-3


def test_separable_first_layer_matches_dense():
    """The rank-1 decomposition of [coords|ff] @ W1 equals the dense
    build_input path on a full plane grid."""
    from mri_raytracer_tpu.models import features
    from mri_raytracer_tpu.models.mlp import init_mlp
    from mri_raytracer_tpu.ops.neural_march import _separable_first_layer

    K, M, O = 4, 4, 9
    rng = np.random.default_rng(0)
    in_dim = 3 + 3 * 2 * K + M
    _, layers = init_mlp(jax.random.PRNGKey(0), in_dim, (16,), 4)

    pos_an = jnp.asarray(rng.uniform(-1, 1, O).astype(np.float32))
    pos_bn = jnp.asarray(rng.uniform(-1, 1, O).astype(np.float32))
    z_n = jnp.float32(0.37)
    intens = jnp.asarray(rng.normal(0, 1, (O, O, M)).astype(np.float32))

    for inv_order in ((0, 1, 2), (1, 0, 2), (1, 2, 0)):
        row, col, const, W1_int = _separable_first_layer(
            layers, K, M, pos_an, pos_bn, z_n, inv_order, O)
        h_fast = (row[:, None, :] + col[None, :, :] + const
                  + intens @ W1_int)

        # dense reference
        perm = (jnp.broadcast_to(z_n, (O, O)),
                jnp.broadcast_to(pos_an[:, None], (O, O)),
                jnp.broadcast_to(pos_bn[None, :], (O, O)))
        xyz = jnp.stack([perm[inv_order[0]], perm[inv_order[1]],
                         perm[inv_order[2]]], -1).reshape(-1, 3)
        x = features.build_input(xyz, intens.reshape(-1, M), K)
        h_ref = (x @ layers[0]["W"] + layers[0]["b"]).reshape(O, O, 16)
        np.testing.assert_allclose(np.asarray(h_fast), np.asarray(h_ref),
                                   rtol=2e-4, atol=2e-4)


def test_pred_stride_close_to_full(scene):
    """Stride-2 prediction evaluation approximates the full-res overlay."""
    disp, zsc, seg = scene
    model, params = _const_class_model(2)
    p = rp.default_render_params(SHAPE, show_seg=False, show_pred=True,
                                 step_size=1.8 / 24)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.5, phi=1.2)
    b = cam.basis()
    full = np.asarray(neural_march.render_brats_neural(
        disp, zsc, None, model, params, b, p, 64, 64, out_res=96))
    strided = np.asarray(neural_march.render_brats_neural(
        disp, zsc, None, model, params, b, p, 64, 64, out_res=96,
        pred_stride=2))
    # Constant prediction field: stride must be exactly equivalent.
    np.testing.assert_allclose(strided, full, atol=2e-3)


def test_pred_kstride_scan_backend(scene):
    """The scan backend honors pred_kstride (regression: it used to be
    silently ignored off-TPU, so a CPU cert run compared kstride=1 with
    itself). Constant predictor -> exact; varying predictor -> close but
    NOT bit-identical."""
    disp, zsc, seg = scene
    p = rp.default_render_params(SHAPE, show_seg=False, show_pred=True,
                                 step_size=1.8 / 24)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.5, phi=1.2)
    b = cam.basis()
    model, params = _const_class_model(2)
    full = np.asarray(neural_march.render_brats_neural(
        disp, zsc, None, model, params, b, p, 64, 64, out_res=96))
    k2 = np.asarray(neural_march.render_brats_neural(
        disp, zsc, None, model, params, b, p, 64, 64, out_res=96,
        pred_kstride=2))
    np.testing.assert_allclose(k2, full, atol=2e-3)

    cfg = ModelConfig(hidden_dims=(16, 16), fourier_freqs=4, num_classes=4)
    model = build_model(cfg, num_modalities=4)
    params = model.init(jax.random.PRNGKey(3))
    params[-1]["b"] = params[-1]["b"] + jnp.array([0.0, 0.4, 0.5, 0.45])
    full = np.asarray(neural_march.render_brats_neural(
        disp, zsc, None, model, params, b, p, 64, 64, out_res=96))
    k2 = np.asarray(neural_march.render_brats_neural(
        disp, zsc, None, model, params, b, p, 64, 64, out_res=96,
        pred_kstride=2))
    assert not np.array_equal(k2, full), "pred_kstride had no effect"
    assert psnr(k2, full) > 25.0


def test_fused_field_path_matches_scan(scene):
    """Mode-2 v2 (predict_field + fused Pallas kernel, interpret mode)
    reproduces the scan-path mode-2 image at the same stride/out_res."""
    from mri_raytracer_tpu.ops.pallas_composite import sweep_composite_pallas
    from mri_raytracer_tpu.ops.raymarch_xla import blend_modalities

    disp, zsc, seg = scene
    cfg = ModelConfig(hidden_dims=(16, 16), fourier_freqs=4, num_classes=4)
    model = build_model(cfg, num_modalities=4)
    params = model.init(jax.random.PRNGKey(3))
    # Push logits around so several classes appear somewhere.
    params[-1]["b"] = params[-1]["b"] + jnp.array([0.0, 0.4, 0.5, 0.45])

    p = rp.default_render_params(SHAPE, show_seg=True, show_pred=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.8, phi=1.1)
    b = cam.basis()
    axis = sw.dominant_axis(b)
    O, S = 128, 2
    W = H = 96

    # Both paths get the SAME precomputed geometry + prediction field:
    # geometry rebuilt inside a second jit program differs at ~1e-5, which
    # flips argmax labels of this near-tie random model and would measure
    # tie-breaking noise instead of compositing parity.
    mixed = blend_modalities(disp, p.vol_enabled, p.vol_weight)
    mixed_s = sw._perm_volume(mixed, axis)
    modsz_s = jnp.stack([sw._perm_volume(zsc[m], axis) for m in range(4)])
    seg_s = sw._perm_volume(seg, axis)
    geom = sw.sweep_geometry(b, p, mixed_s.shape, axis, O,
                             frustum_wh=(W, H))
    field = neural_march.predict_field(model, params, modsz_s, geom, p,
                                       axis, O, S, block=8)

    img_scan = np.asarray(neural_march.render_brats_neural(
        disp, zsc, seg, model, params, b, p, W, H, out_res=O, pred_stride=S,
        geom=geom, field=field))
    C, T = sweep_composite_pallas(mixed_s, seg_s, None, geom, p, axis, O,
                                  use_gamma=False, use_clip=False,
                                  interpret=True,
                                  pred_field=field.astype(jnp.bfloat16),
                                  field_stride=S)
    img_fused = np.asarray(sw.warp_to_screen(C, geom, b, axis, W, H,
                                             p.bg_color))
    assert psnr(img_fused, img_scan) >= 40.0

    # kstride=2 (field on every 2nd plane, nearest along the sweep) stays
    # close to the exact per-plane field. The bound is loose because this
    # random model's labels are spatially noisy (worst case for plane
    # skipping — trained INRs are far smoother); a row-mapping bug would
    # land way below it (misaligned planes composite unrelated labels).
    field2 = neural_march.predict_field(model, params, modsz_s, geom, p,
                                        axis, O, S, block=8, kstride=2)
    assert field2.shape[0] == -(-field.shape[0] // 2)
    C2, _ = sweep_composite_pallas(mixed_s, seg_s, None, geom, p, axis, O,
                                   use_gamma=False, use_clip=False,
                                   interpret=True,
                                   pred_field=field2.astype(jnp.bfloat16),
                                   field_stride=S, field_kstride=2)
    img_k2 = np.asarray(sw.warp_to_screen(C2, geom, b, axis, W, H,
                                          p.bg_color))
    assert psnr(img_k2, img_fused) >= 24.0
    # The prediction overlay must actually be present in both.
    p_off = p._replace(show_pred=np.float32(0.0))
    img_scan_off = np.asarray(neural_march.render_brats_neural(
        disp, zsc, seg, model, params, b, p_off, W, H, out_res=O,
        pred_stride=S))
    assert np.abs(img_scan - img_scan_off).max() > 1e-3


def test_bake_labels_matches_generic_inference(scene):
    """All-MXU voxel-grid bake == the generic chunked predictor, separable
    and non-separable (fallback) models alike."""
    from mri_raytracer_tpu.eval.inference import _predict_labels

    _, zsc, _ = scene
    cfg = ModelConfig(hidden_dims=(16, 16), fourier_freqs=4, num_classes=4)
    model = build_model(cfg, num_modalities=4)
    params = model.init(jax.random.PRNGKey(3))
    assert neural_march.model_is_separable(model)
    baked = np.asarray(neural_march.bake_labels(model, params, zsc))
    ref = np.asarray(_predict_labels(model, params, zsc))
    # bf16 hidden states can flip argmax on near-tie voxels only.
    assert np.mean(baked != ref) < 5e-3
    assert baked.shape == zsc.shape[1:]

    cfg_s = ModelConfig(kind="siren", hidden_dims=(16,), num_classes=4)
    siren = build_model(cfg_s, num_modalities=4)
    sp = siren.init(jax.random.PRNGKey(4))
    assert not neural_march.model_is_separable(siren)
    baked_s = np.asarray(neural_march.bake_labels(siren, sp, zsc))
    ref_s = np.asarray(_predict_labels(siren, sp, zsc))
    np.testing.assert_array_equal(baked_s, ref_s)


def test_rebake_backend_tracks_param_changes(scene):
    disp, zsc, seg = scene
    model, params0 = _const_class_model(1)
    _, params2 = _const_class_model(2)
    r = neural_march.NeuralBratsRenderer(disp, zsc, seg, model, params0,
                                         width=48, height=48,
                                         backend="rebake")
    p = rp.default_render_params(SHAPE, show_seg=False, show_pred=True)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE))
    img1 = np.asarray(r.render(cam.basis(), p))
    r.set_params(params2)
    img2 = np.asarray(r.render(cam.basis(), p))
    assert np.abs(img1 - img2).max() > 1e-3  # overlay color changed
