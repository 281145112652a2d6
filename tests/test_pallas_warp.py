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
    from mri_raytracer_tpu.ops.pallas_warp import choose_window, WINDOW_LADDER

    assert choose_window(32, 32) == WINDOW_LADDER[0]
    assert choose_window(97, 89) == (112, 256)  # orbit worst tile
    assert choose_window(131, 128) == WINDOW_LADDER[-1]  # exact diagonal
    # beyond any window: ladder max (the in-program check falls back)
    assert choose_window(500, 500) == WINDOW_LADDER[-1]
