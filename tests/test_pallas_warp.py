"""Pallas warp kernel vs the gather warp (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.ops.pallas_warp import warp_pallas, TILE_I, TILE_J


def _gather_ref(C, i_map, j_map):
    O = C.shape[0]
    i0 = np.clip(np.floor(i_map).astype(np.int32), 0, O - 2)
    j0 = np.clip(np.floor(j_map).astype(np.int32), 0, O - 2)
    fi = np.clip(i_map - i0, 0, 1)
    fj = np.clip(j_map - j0, 0, 1)
    out = (C[i0, j0] * ((1 - fi) * (1 - fj))[..., None]
           + C[i0, j0 + 1] * ((1 - fi) * fj)[..., None]
           + C[i0 + 1, j0] * (fi * (1 - fj))[..., None]
           + C[i0 + 1, j0 + 1] * (fi * fj)[..., None])
    return out


def test_warp_pallas_matches_bilinear():
    rng = np.random.default_rng(0)
    O = 128
    H = W = 2 * TILE_I  # 2x2 tile grid
    C = rng.normal(0, 1, (O, O, 3)).astype(np.float32)
    # Rotated-ish smooth map: per-tile footprints must fit the (aligned)
    # kernel window — includes cross-terms like a real homography.
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    i_map = (yy * 0.8 + xx * 0.35 + 2.3).astype(np.float32)
    j_map = (xx * 0.85 - yy * 0.3 + 40.2).astype(np.float32)
    i_map = np.clip(i_map, 0, O - 1.01)
    j_map = np.clip(j_map, 0, O - 1.01)

    out, fits = warp_pallas(jnp.moveaxis(jnp.asarray(C), -1, 0),
                            jnp.asarray(i_map), jnp.asarray(j_map), H, W,
                            interpret=True)
    assert bool(fits)
    ref = _gather_ref(C, i_map, j_map)
    # Kernel interpolates in bf16 (f32 accumulate): ~2^-8 relative on the
    # N(0,1) test data.
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0.02, atol=0.02)


def test_warp_pallas_detects_oversized_footprint():
    O = 256
    H = W = 2 * TILE_I
    C = np.zeros((O, O, 3), np.float32)
    # Minifying map: one 32-row tile spans ~4x its size in source rows,
    # exceeding the window allowance.
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # One 32-row tile spans ~4.9x its size in source rows — beyond even the
    # enlarged 160-row window's fit bound (win_i - 1 - slack = 151).
    i_map = np.clip(yy * 4.9, 0, O - 1).astype(np.float32)
    j_map = (xx * 0.9).astype(np.float32)
    _, fits = warp_pallas(jnp.moveaxis(jnp.asarray(C), -1, 0),
                          jnp.asarray(i_map), jnp.asarray(j_map), H, W,
                          interpret=True)
    assert not bool(fits)


def test_sweep_renderer_with_pallas_flag_cpu():
    """End-to-end sweep with use_pallas + interpret fallback disabled on CPU:
    the flag path compiles via lax.cond with the real kernel only on TPU, so
    here we just verify the gather path is taken and output matches."""
    from mri_raytracer_tpu.data import synthetic, brats
    from mri_raytracer_tpu.ops import shearwarp as sw
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    SHAPE = (16, 16, 12)
    mods, seg = synthetic.synthetic_case(SHAPE, seed=0)
    disp = jnp.asarray(np.stack([brats.percentile_normalize(m) for m in mods]))
    p = rp.default_render_params(SHAPE, show_seg=False)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE))
    img = sw.render_brats(disp, None, None, cam.basis(), p, 64, 64, out_res=64)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.parametrize("win", [(112, 256), (160, 384)])
def test_warp_pallas_window_ladder(win):
    """Every compiled window variant computes the same bilinear warp —
    the production renderer switches variants per frame via the host
    footprint hint (shearwarp.warp_window_hint)."""
    rng = np.random.default_rng(1)
    O = 512
    H = W = 2 * TILE_I
    C = rng.normal(0, 1, (O, O, 3)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    i_map = (yy * 0.9 + xx * 0.25 + 7.7).astype(np.float32)
    j_map = (xx * 0.8 - yy * 0.35 + 90.1).astype(np.float32)
    i_map = np.clip(i_map, 0, O - 1.01)
    j_map = np.clip(j_map, 0, O - 1.01)
    out, fits = warp_pallas(jnp.moveaxis(jnp.asarray(C), -1, 0),
                            jnp.asarray(i_map), jnp.asarray(j_map), H, W,
                            interpret=True, win=win)
    assert bool(fits)
    ref = _gather_ref(C, i_map, j_map)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0.02, atol=0.02)


def test_choose_window_ladder():
    """Ladder *properties*, not hard-coded tiers — the ladder may be
    re-sized in a future round without this test going stale, as long as
    the invariants the renderer relies on hold."""
    from mri_raytracer_tpu.ops.pallas_warp import choose_window, WINDOW_LADDER

    # Monotone, 8/128-aligned rungs.
    for (ai, aj), (bi, bj) in zip(WINDOW_LADDER, WINDOW_LADDER[1:]):
        assert ai <= bi and aj <= bj
    for wi, wj in WINDOW_LADDER:
        assert wi % 8 == 0 and wj % 128 == 0

    # Tiny footprints select the smallest rung.
    assert choose_window(32, 32) == WINDOW_LADDER[0]
    # The measured orbit worst tile (97 x 89 per scripts/diag_warp_spans.py)
    # must NOT be pushed to the ladder max — that is the whole point of the
    # smaller rung (2.1x fewer matmul FLOPs at every bench pose but the
    # exact diagonal).
    assert choose_window(97, 89) != WINDOW_LADDER[-1] or len(WINDOW_LADDER) == 1
    # The exact-diagonal footprint (131 x 128) needs the max window, and it
    # must still fit the max window's fit bound.
    wi, wj = choose_window(131, 128)
    assert (wi, wj) == WINDOW_LADDER[-1]
    assert 131 < wi - 1 - 8 and 128 < wj - 1 - 128
    # Beyond any window: ladder max (the in-program check falls back).
    assert choose_window(500, 500) == WINDOW_LADDER[-1]
    # The chosen rung always satisfies the device-side fit bound for the
    # hinted span (margin included), whenever any rung can.
    for span in [(10, 10), (60, 60), (97, 89), (103, 120), (131, 128)]:
        wi, wj = choose_window(*span)
        if span[0] + 6 <= WINDOW_LADDER[-1][0] - 9:
            assert span[0] + 6 <= wi - 1 - 8
            assert span[1] + 6 <= wj - 1 - 128


def test_choose_window_whole_axis_drops_slack():
    """With O given, a window spanning the whole axis drops the alignment
    slack — mirrors warp_fit_starts — so small out_res picks a small rung
    the O-less hint would (needlessly) reject."""
    from mri_raytracer_tpu.ops.pallas_warp import choose_window, WINDOW_LADDER

    w0 = WINDOW_LADDER[0]
    # Span that only fits rung 0 because the j-window covers the whole axis.
    span_j = w0[1] - 130  # fails "span + 6 <= wj - 1 - 128" without O
    assert choose_window(10.0, float(span_j)) != w0 or len(WINDOW_LADDER) == 1
    assert choose_window(10.0, float(span_j), O=w0[1]) == w0
