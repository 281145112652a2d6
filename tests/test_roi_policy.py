"""ROI policy-MLP adaptive renderer (ops/roi_policy + eval/roi_protocol)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_raytracer_tpu.data import brats, synthetic
from mri_raytracer_tpu.eval import roi_protocol
from mri_raytracer_tpu.ops import roi_policy
from mri_raytracer_tpu.render import params as rp
from mri_raytracer_tpu.render.camera import OrbitalCamera


CFG = roi_policy.PolicyConfig()


@pytest.fixture(scope="module")
def scene():
    mods, seg = synthetic.synthetic_case((32, 32, 28), seed=3)
    mixed = np.stack([brats.percentile_normalize(m) for m in mods]).mean(0)
    feats = roi_policy.build_feature_volumes(mixed, seg)
    p = rp.default_render_params(mixed.shape, show_seg=False)
    # Low alpha so no ray saturates (T stays > 0.01 — needed by the
    # uniform-equivalence test).
    p = p._replace(intensity_alpha=jnp.float32(1.0))
    return {"mixed": jnp.asarray(mixed),
            "feat_rows": jnp.asarray(roi_policy.pack_feature_rows(mixed,
                                                                  feats)),
            "P": jnp.asarray(feats["P"]), "B": jnp.asarray(feats["B"]),
            "params": p,
            "radius": rp.default_camera_radius(p, mixed.shape)}


def _basis(scene, theta=0.5, phi=1.1):
    return jnp.asarray(
        OrbitalCamera(radius=scene["radius"], theta=theta, phi=phi)
        .basis().pack())


def _st(scene):
    return (scene["mixed"], scene["feat_rows"])


def test_policy_output_ranges():
    pol = roi_policy.init_policy(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
    scale, skip, lod = roi_policy.apply_policy(pol, feats, CFG)
    assert scale.shape == (64,) and skip.shape == (64,)
    assert float(scale.min()) >= CFG.scale_min - 1e-3
    assert float(scale.max()) <= CFG.scale_max + 1e-3
    assert float(skip.min()) >= 0.0 and float(skip.max()) <= 1.0
    assert float(jnp.abs(lod).max()) <= 4.0
    # A legacy 2-output head loads and reports a neutral LOD offset.
    pol2 = dict(pol, W2=pol["W2"][:, :2], b2=pol["b2"][:2])
    _, _, lod2 = roi_policy.apply_policy(pol2, feats, CFG)
    assert float(jnp.abs(lod2).max()) == 0.0


def _constant_policy(scale=1.0, skip_logit=-30.0):
    """Zero-weight policy with biases pinning (scale, skip)."""
    s = (scale - CFG.scale_min) / (CFG.scale_max - CFG.scale_min)
    logit = float(np.log(s / (1.0 - s)))
    return {"W1": jnp.zeros((8, CFG.hidden)), "b1": jnp.zeros((CFG.hidden,)),
            "W2": jnp.zeros((CFG.hidden, 2)),
            "b2": jnp.asarray([logit, skip_logit], jnp.float32)}


def test_uniform_policy_matches_fixed_step(scene):
    """A constant-density policy must reproduce the fixed-step baseline
    exactly (same sample positions, same dt)."""
    n = 48
    bv = _basis(scene)
    ref, _ = roi_policy.render_fixed(scene["mixed"], bv, scene["params"],
                                     64, 64, n)
    img, stats = roi_policy.render_policy(
        _constant_policy(), *_st(scene), bv, scene["params"], 64, 64,
        n_coarse=16, n_fine=n, cfg=CFG, roi_clamp=False)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-4, atol=2e-4)
    assert float(stats["steps_per_ray"]) > 0.0


def test_roi_clamp_protects_tumor(scene):
    """An adversarial policy that skips exactly the ROI (it reads the P(x)
    feature) must be overridden by the ROI clamp: with clamps on, ROI-pixel
    error vs the fine reference improves (Methodology:45-47)."""
    bv = _basis(scene)
    p = scene["params"]
    ref, _ = roi_policy.render_fixed(scene["mixed"], bv, p, 64, 64, 256)
    # Feature 5 is P(x): skip logit ~ sigmoid(40*P - 4) => skip ROI only.
    W1 = np.zeros((8, CFG.hidden), np.float32)
    W1[5, 0] = 10.0
    W2 = np.zeros((CFG.hidden, 2), np.float32)
    W2[0, 1] = 4.0
    roi_skipper = {"W1": jnp.asarray(W1), "b1": jnp.zeros((CFG.hidden,)),
                   "W2": jnp.asarray(W2),
                   "b2": jnp.asarray([0.0, -4.0], jnp.float32)}
    img_off, _ = roi_policy.render_policy(
        roi_skipper, *_st(scene), bv, p, 64, 64, 16, 32, CFG,
        roi_clamp=False)
    img_on, _ = roi_policy.render_policy(
        roi_skipper, *_st(scene), bv, p, 64, 64, 16, 32, CFG, roi_clamp=True)
    P_img, _ = roi_policy.project_roi_maps(scene["P"], scene["B"], bv, p,
                                           64, 64)
    roi_px = np.asarray(P_img) > 0.2
    assert roi_px.sum() > 10
    err_off = np.mean((np.asarray(img_off) - np.asarray(ref)) ** 2, -1)[roi_px]
    err_on = np.mean((np.asarray(img_on) - np.asarray(ref)) ** 2, -1)[roi_px]
    assert err_on.mean() < err_off.mean()


def test_policy_training_reduces_loss(scene):
    views = [_basis(scene, 0.4, 1.2), _basis(scene, 1.5, 0.9)]
    p = scene["params"]
    refs = [np.asarray(roi_policy.render_fixed(scene["mixed"], v, p,
                                               48, 48, 192)[0])
            for v in views]
    pol, losses, sel = roi_policy.train_policy(
        jax.random.PRNGKey(0), _st(scene), views,
        [jnp.asarray(r) for r in refs], p, 48, 48, steps=30, n_coarse=12,
        n_fine=24, lr=1e-3)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert np.isfinite(losses).all()
    assert sel["steps_run"] == 30 and not sel["early_stopped"]


def test_policy_training_validation_selection(scene):
    """Methodology:53: with validation views, training early-stops on val
    ROI-wPSNR and returns the best-validation checkpoint."""
    views = [_basis(scene, 0.4, 1.2)]
    val_views = [_basis(scene, 2.9, 1.0)]
    p = scene["params"]
    refs = [jnp.asarray(roi_policy.render_fixed(scene["mixed"], v, p,
                                                48, 48, 192)[0])
            for v in views]
    val_refs = [jnp.asarray(roi_policy.render_fixed(scene["mixed"], v, p,
                                                    48, 48, 192)[0])
                for v in val_views]
    # val_budgets pinned to the training budget so the re-render below can
    # check the selected checkpoint exactly (the default validates at a SET
    # of operating budgets and records their mean).
    pol, losses, sel = roi_policy.train_policy(
        jax.random.PRNGKey(0), _st(scene), views, refs, p, 48, 48,
        steps=40, n_coarse=12, n_fine=24, lr=1e-3,
        val_views=val_views, val_refs=val_refs, eval_every=5, patience=2,
        val_budgets=(24,))
    assert sel["selected_step"] >= 5
    assert len(sel["val_wpsnr_curve"]) >= 2
    assert sel["val_budgets"] == [24]
    # The returned policy IS the selected checkpoint: its val wPSNR matches
    # the recorded best.
    img, _ = roi_policy.render_policy(pol, *_st(scene), val_views[0], p,
                                      48, 48, 12, 24)
    err = np.mean((np.asarray(img) - np.asarray(val_refs[0])) ** 2)
    q = -10.0 * np.log10(max(err, 1e-12))
    assert abs(q - sel["best_val_wpsnr"]) < 0.15


def test_rho_upsample_improves_blocky_decisions(scene):
    """rho_upsample interpolates the decision field between probe blocks:
    at a coarse probe stride it must not hurt, and typically helps (the
    piecewise-constant blocks misplace samples at content edges)."""
    p = scene["params"]
    pol = roi_policy.init_policy(jax.random.PRNGKey(0))
    bv = _basis(scene, 0.7, 1.1)
    ref, _ = roi_policy.render_fixed(scene["mixed"], bv, p, 64, 64, 192)

    def q(u):
        img, _ = roi_policy.render_policy(pol, *_st(scene), bv, p, 64, 64,
                                          16, 24, probe_stride=8,
                                          rho_upsample=u)
        mse = float(np.mean((np.asarray(img) - np.asarray(ref)) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))

    q1, q2 = q(1), q(2)
    assert np.isfinite(q1) and np.isfinite(q2)
    assert q2 >= q1 - 0.3  # never materially worse
    with pytest.raises(ValueError):
        roi_policy.render_policy(pol, *_st(scene), bv, p, 64, 64, 16, 24,
                                 probe_stride=8, rho_upsample=3)


def test_packed_trilinear_matches_base(scene):
    from mri_raytracer_tpu.ops.trilinear import (pack_trilinear_corners,
                                                 trilinear_sample_base,
                                                 trilinear_sample_packed)

    vol = scene["mixed"]
    packed = pack_trilinear_corners(vol)
    assert packed.shape == vol.shape + (8,)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (500, 3)) \
        * (jnp.asarray(vol.shape, jnp.float32) + 1.0) - 1.0
    a = trilinear_sample_base(vol, pts)
    b = trilinear_sample_packed(packed, pts)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_packed_render_matches_plain(scene):
    bv = _basis(scene)
    from mri_raytracer_tpu.ops.trilinear import pack_trilinear_corners

    packed = pack_trilinear_corners(scene["mixed"])
    a, _ = roi_policy.render_fixed(scene["mixed"], bv, scene["params"],
                                   48, 48, 32)
    b, _ = roi_policy.render_fixed(packed, bv, scene["params"], 48, 48, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_blocked_march_exact(scene):
    """Blocked (memory-bounded) marches reproduce the one-shot composite
    exactly for both the fixed baseline and the policy renderer, including
    non-divisible block sizes."""
    bv = _basis(scene, 0.9, 0.7)
    p = scene["params"]
    a, s_a = roi_policy.render_fixed(scene["mixed"], bv, p, 48, 48, 40)
    b, s_b = roi_policy.render_fixed(scene["mixed"], bv, p, 48, 48, 40,
                                     block=16)  # 40 = 2*16 + 8 pad
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert float(s_a) == float(s_b)
    pol = _constant_policy(scale=0.7, skip_logit=-2.0)
    c, _ = roi_policy.render_policy(pol, *_st(scene), bv, p, 48, 48, 12, 40,
                                    CFG, probe_stride=2)
    d, _ = roi_policy.render_policy(pol, *_st(scene), bv, p, 48, 48, 12, 40,
                                    CFG, probe_stride=2, block=16)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), atol=1e-5)


def test_ssim_jax_matches_scipy():
    from mri_raytracer_tpu.eval.metrics import ssim, ssim_jax

    rng = np.random.default_rng(0)
    a = rng.random((40, 52)).astype(np.float32)
    b = np.clip(a + 0.08 * rng.standard_normal((40, 52)), 0, 1) \
        .astype(np.float32)
    want = ssim(a, b)
    got = float(ssim_jax(jnp.asarray(a), jnp.asarray(b)))
    assert abs(want - got) < 2e-4
    assert abs(float(ssim_jax(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6


def test_median_ci():
    xs = np.arange(1, 32, dtype=np.float64)
    r = roi_protocol.median_ci(xs)
    assert r["median"] == 16.0 and r["n"] == 31
    lo, hi = r["ci95"]
    assert lo <= 16.0 <= hi and lo > 1.0 and hi < 31.0


def test_orbit_views_disjoint(scene):
    vs = roi_protocol.make_orbit_views(scene["radius"], 8)
    vh = roi_protocol.make_orbit_views(scene["radius"], 8, held_out=True)
    assert len(vs) == 8 and len(vh) == 8
    for a in vs:
        for b in vh:
            assert not np.allclose(a, b)


def test_protocol_sweep_and_success_rule(scene):
    pol = _constant_policy()
    views = roi_protocol.make_views(scene["radius"])[:1]
    sweep = roi_protocol.pareto_sweep(
        pol, scene, views, budgets=[16, 48], width=48, height=48,
        ref_steps=128, n_frames=2, n_coarse=12)
    assert len(sweep["baseline"]) == 2 and len(sweep["policy"]) == 2
    # More samples => better PSNR for the baseline.
    assert sweep["baseline"][1]["psnr"] > sweep["baseline"][0]["psnr"]
    verdict = roi_protocol.evaluate_success(sweep)
    assert set(verdict) >= {"success", "speedup", "tuned_n"}


def test_feature_volumes(scene):
    assert float(scene["P"].max()) <= 1.0 + 1e-5
    assert float(scene["B"].max()) <= 1.0 + 1e-5
    # Boundary proximity peaks at the tumor boundary, P inside the tumor.
    assert float(scene["P"].max()) > 0.3
    rows = scene["feat_rows"]
    assert rows.shape[-1] == roi_policy.N_FEATURES
    assert float(rows[..., 1].min()) >= 0.0  # gradmag channel
    np.testing.assert_allclose(np.asarray(rows[..., 5]),
                               np.asarray(scene["P"]), atol=1e-6)


def test_policy_save_load_fp16(tmp_path):
    pol = roi_policy.init_policy(jax.random.PRNGKey(1))
    roi_policy.save_policy(tmp_path / "pol.npz", pol, meta={"x": 1})
    back = roi_policy.load_policy(tmp_path / "pol.npz")
    import json
    meta = json.loads((tmp_path / "pol_meta.json").read_text())
    assert meta["dims"] == [8, roi_policy.PolicyConfig().hidden, 3]
    # fp16 round trip within half precision
    for k in pol:
        np.testing.assert_allclose(np.asarray(back[k]), np.asarray(pol[k]),
                                   atol=1e-2)
    # outputs survive the export (the reference's parity-test requirement)
    feats = jax.random.normal(jax.random.PRNGKey(2), (32, 8))
    s0, k0, _ = roi_policy.apply_policy(pol, feats, roi_policy.PolicyConfig())
    s1, k1, _ = roi_policy.apply_policy(back, feats, roi_policy.PolicyConfig())
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=2e-2)


def test_lod_blend(scene):
    """LOD (Methodology:43 optional output): lod_vol enables the mip blend;
    a strongly negative offset (lam -> 0) reproduces the no-LOD image, and
    engaging the blend changes the render toward the prefiltered field."""
    from mri_raytracer_tpu.ops.trilinear import mip_downsample2

    bv = _basis(scene, 1.1, 0.9)
    p = scene["params"]
    mip = mip_downsample2(scene["mixed"])
    pol = roi_policy.init_policy(jax.random.PRNGKey(0))
    base, _ = roi_policy.render_policy(pol, *_st(scene), bv, p, 48, 48,
                                       12, 24)
    # Offset pinned to -1: lam = clip(log2(dt_vox) - 1, 0, 1) ~ 0 at this
    # dense-ish budget -> matches the no-LOD render.
    pol_off = dict(pol, b2=pol["b2"].at[2].set(-30.0))
    img0, _ = roi_policy.render_policy(pol_off, *_st(scene), bv, p, 48, 48,
                                       12, 24, lod_vol=mip)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(base),
                               atol=5e-3)
    # Offset pinned to +1: every sample at the mip -> visibly different.
    pol_on = dict(pol, b2=pol["b2"].at[2].set(30.0))
    img1, _ = roi_policy.render_policy(pol_on, *_st(scene), bv, p, 48, 48,
                                       12, 24, lod_vol=mip)
    assert float(np.abs(np.asarray(img1) - np.asarray(base)).max()) > 1e-3


def test_window_rays_match_full_frame(scene):
    """A window render must reproduce the same pixels of the full-frame
    render bit-exactly (the foveated inset's seamlessness guarantee)."""
    bv = _basis(scene)
    n = 32
    full, _ = roi_policy.render_policy(
        _constant_policy(), *_st(scene), bv, scene["params"], 64, 64,
        n_coarse=16, n_fine=n, cfg=CFG, roi_clamp=False)
    win, _ = roi_policy.render_policy(
        _constant_policy(), *_st(scene), bv, scene["params"], 64, 64,
        n_coarse=16, n_fine=n, cfg=CFG, roi_clamp=False,
        window_origin=(jnp.float32(16.0), jnp.float32(8.0)),
        window_size=(32, 24))
    np.testing.assert_allclose(np.asarray(win),
                               np.asarray(full)[8:32, 16:48],
                               rtol=1e-5, atol=1e-5)


def test_foveated_roi_pixels_match_full_res(scene):
    """Foveated render: pixels inside the inset (feather interior) must
    match the full-resolution policy render; the background must stay
    close to it (half-res upsample of smooth content)."""
    bv = _basis(scene)
    n = 48
    corners = roi_policy.roi_world_corners(scene["P"], scene["B"],
                                           scene["params"])
    full, _ = roi_policy.render_policy(
        _constant_policy(), *_st(scene), bv, scene["params"], 64, 64,
        n_coarse=16, n_fine=n, cfg=CFG, roi_clamp=False)
    fov, stats = roi_policy.render_policy_foveated(
        _constant_policy(), *_st(scene), bv, scene["params"], 64, 64,
        corners, n_coarse=16, n_fine=n, cfg=CFG, rect_frac=0.5, feather=4)
    x0, y0, rw, rh = (int(stats["rect"][0]), int(stats["rect"][1]),
                      stats["rect"][2], stats["rect"][3])
    inner = np.asarray(fov)[y0 + 4:y0 + rh - 4, x0 + 4:x0 + rw - 4]
    ref_in = np.asarray(full)[y0 + 4:y0 + rh - 4, x0 + 4:x0 + rw - 4]
    np.testing.assert_allclose(inner, ref_in, rtol=1e-4, atol=2e-4)
    # Whole-frame quality: the half-res background of a smooth scene stays
    # within a few dB of full-res; the ROI is exact.
    mse = float(np.mean((np.asarray(fov) - np.asarray(full)) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, psnr
    # The inset tracks the ROI: projected tumor center must fall inside.
    from mri_raytracer_tpu.render.camera import unpack_basis
    px, py = roi_policy._project_to_pixels(
        unpack_basis(bv), jnp.asarray(corners), 64, 64)
    cx = float(0.5 * (px.min() + px.max()))
    cy = float(0.5 * (py.min() + py.max()))
    assert x0 <= cx <= x0 + rw and y0 <= cy <= y0 + rh


def test_protocol_sweep_foveated_kind(scene):
    """pareto_sweep(foveated=True) measures the policy_fov series and the
    success rule may pick a foveated operating point (kind is recorded)."""
    pol = _constant_policy()
    views = roi_protocol.make_views(scene["radius"])[:1]
    sweep = roi_protocol.pareto_sweep(
        pol, scene, views, budgets=[16, 48], width=48, height=48,
        ref_steps=128, n_frames=2, n_coarse=12, foveated=True)
    assert len(sweep["policy_fov"]) == 2
    for q in sweep["policy_fov"]:
        assert np.isfinite(q["wpsnr"]) and q["ms"] > 0.0
    verdict = roi_protocol.evaluate_success(sweep)
    assert verdict.get("policy_kind") in ("policy", "policy_fov", None)


def test_foveated_inset_aligned_at_probe_stride(scene):
    """At probe_stride > 1 the inset origin must land on the probe grid so
    the shared coarse probes / policy decisions / rho coincide with the
    full-resolution render's raster-anchored blocks — the bit-exactness
    guarantee the protocol relies on at 1080p (auto stride 8). Regression
    for the even-only alignment that broke it for any stride > 2."""
    bv = _basis(scene)
    S, n = 4, 32
    corners = roi_policy.roi_world_corners(scene["P"], scene["B"],
                                           scene["params"])
    full, _ = roi_policy.render_policy(
        _constant_policy(), *_st(scene), bv, scene["params"], 64, 64,
        n_coarse=16, n_fine=n, cfg=CFG, probe_stride=S, rho_upsample=2)
    fov, stats = roi_policy.render_policy_foveated(
        _constant_policy(), *_st(scene), bv, scene["params"], 64, 64,
        corners, n_coarse=16, n_fine=n, cfg=CFG, probe_stride=S,
        rho_upsample=2, rect_frac=0.5, feather=4)
    x0, y0, rw, rh = (int(stats["rect"][0]), int(stats["rect"][1]),
                      int(stats["rect"][2]), int(stats["rect"][3]))
    assert x0 % S == 0 and y0 % S == 0, (x0, y0)
    inner = np.asarray(fov)[y0 + 4:y0 + rh - 4, x0 + 4:x0 + rw - 4]
    ref_in = np.asarray(full)[y0 + 4:y0 + rh - 4, x0 + 4:x0 + rw - 4]
    np.testing.assert_allclose(inner, ref_in, rtol=1e-4, atol=2e-4)
