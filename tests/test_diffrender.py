"""Differentiable rendering: adjoint checks, inverse-rendering fit, POIs,
inverse-CDF sampling, isosurface implicit gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.ops import diffrender as dr
from mri_raytracer_tpu.ops import importance, isosurface
from mri_raytracer_tpu.render.camera import OrbitalCamera


def _naive_composite(colors, alphas):
    """Sequential reference recurrence (autodiff oracle)."""
    def body(carry, ca):
        C, T = carry
        c, a = ca
        C = C + (T * a)[..., None] * c
        T = T * (1.0 - a)
        return (C, T), None

    N = alphas.shape[-1]
    (C, T), _ = jax.lax.scan(
        body, (jnp.zeros(colors.shape[:-2] + (3,)), jnp.ones(alphas.shape[:-1])),
        (jnp.moveaxis(colors, -2, 0), jnp.moveaxis(alphas, -1, 0)))
    return C, T


def test_composite_forward_matches_naive():
    key = jax.random.PRNGKey(0)
    colors = jax.random.uniform(key, (5, 16, 3))
    alphas = jax.random.uniform(key, (5, 16)) * 0.5
    C1, T1 = dr.composite_fronttoback(colors, alphas)
    C2, T2 = _naive_composite(colors, alphas)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T2), rtol=1e-5)


def test_composite_manual_adjoint_matches_autodiff():
    key = jax.random.PRNGKey(1)
    colors = jax.random.uniform(key, (3, 12, 3))
    alphas = jax.random.uniform(key, (3, 12)) * 0.7

    def loss_custom(c, a):
        C, T = dr.composite_fronttoback(c, a)
        return jnp.sum(C ** 2) + jnp.sum(T ** 3)

    def loss_naive(c, a):
        C, T = _naive_composite(c, a)
        return jnp.sum(C ** 2) + jnp.sum(T ** 3)

    gc1, ga1 = jax.grad(loss_custom, argnums=(0, 1))(colors, alphas)
    gc2, ga2 = jax.grad(loss_naive, argnums=(0, 1))(colors, alphas)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga1), np.asarray(ga2), rtol=1e-4, atol=1e-6)


def test_alpha_series_stability():
    a = dr.alpha_from_sigma(jnp.array([1e-8, 1e-3, 1.0]), jnp.float32(0.01))
    assert np.isfinite(np.asarray(a)).all()
    g = jax.grad(lambda s: jnp.sum(dr.alpha_from_sigma(s, jnp.float32(0.01))))(
        jnp.array([1e-8, 1e-3, 1.0]))
    assert np.isfinite(np.asarray(g)).all()


def test_render_field_gradients_to_camera_and_grid():
    grid = jax.random.normal(jax.random.PRNGKey(2), (8, 8, 8)) * 0.2
    o = jnp.array([[[-2.0, 0.1, 0.2]]])
    d = jnp.array([[[1.0, 0.0, 0.0]]])
    d = d / jnp.linalg.norm(d)

    def loss(grid, o, d):
        field = dr.make_grid_field(grid, vol_min=jnp.array([-1.0, -1, -1]),
                                   voxel_size=jnp.array([2 / 7] * 3))
        out = dr.render_field(field, o, d, 0.5, 3.5, n_samples=32)
        return jnp.sum(out.rgb)

    g_grid, g_o, g_d = jax.grad(loss, argnums=(0, 1, 2))(grid, o, d)
    assert np.isfinite(np.asarray(g_grid)).all() and np.abs(np.asarray(g_grid)).sum() > 0
    assert np.isfinite(np.asarray(g_o)).all()
    assert np.isfinite(np.asarray(g_d)).all()


def test_checkpoint_chunks_same_grads():
    grid = jax.random.normal(jax.random.PRNGKey(3), (6, 6, 6)) * 0.3
    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])

    def loss(grid, chunks):
        field = dr.make_grid_field(grid, vol_min=jnp.array([-1.0, -1, -1]),
                                   voxel_size=jnp.array([2 / 5] * 3))
        out = dr.render_field(field, o, d, 0.5, 3.5, n_samples=32,
                              checkpoint_chunks=chunks)
        return jnp.sum(out.rgb)

    g1 = jax.grad(lambda g: loss(g, 0))(grid)
    g2 = jax.grad(lambda g: loss(g, 4))(grid)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-7)


def test_inverse_rendering_fit_from_views():
    """The reference's phase-3 goal: optimize a density grid from rendered
    images only (proves end-to-end differentiability)."""
    # target: small gaussian blob grid
    ax = jnp.linspace(-1, 1, 8)
    X, Y, Z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    target_grid = 3.0 * jnp.exp(-((X - 0.2) ** 2 + Y ** 2 + Z ** 2) / 0.15) - 3.0
    vol_min = jnp.array([-1.0, -1, -1])
    vox = jnp.array([2 / 7] * 3)

    cams = [OrbitalCamera(radius=3.0, theta=t, phi=1.2) for t in
            (0.0, 1.6, 3.1, 4.7)]
    bases = [c.basis() for c in cams]

    def render_all(grid):
        field = dr.make_grid_field(grid, vol_min=vol_min, voxel_size=vox)
        return dr.render_views(field, bases, 24, 24, 0.8, 5.2, n_samples=48)

    target = render_all(target_grid)

    def loss(grid):
        return jnp.mean((render_all(grid) - target) ** 2)

    grid = jnp.zeros((8, 8, 8)) - 1.0
    lval, g = jax.value_and_grad(loss)(grid)
    l0 = float(lval)
    step = jax.jit(lambda gr: gr - 300.0 * jax.grad(loss)(gr))
    for _ in range(60):
        grid = step(grid)
    l1 = float(loss(grid))
    assert l1 < l0 * 0.2, f"inverse rendering failed to converge: {l0} -> {l1}"


def test_poi_influence_gradients():
    x = jnp.array([[0.3, 0.2, 0.1]])
    pos = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    amp = jnp.array([1.0, 0.5])
    rad = jnp.array([0.5, 0.3])

    def f(pos, amp, rad):
        return jnp.sum(dr.poi_influence(x, pos, amp, rad))

    g_pos, g_amp, g_rad = jax.grad(f, argnums=(0, 1, 2))(pos, amp, rad)
    # finite-difference check on p_0x
    eps = 1e-4
    dp = jnp.zeros_like(pos).at[0, 0].set(eps)
    fd = (f(pos + dp, amp, rad) - f(pos - dp, amp, rad)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g_pos[0, 0]), float(fd), rtol=1e-3)


def test_inverse_cdf_sampler():
    t_bins = jnp.linspace(0.0, 1.0, 5)[None]  # 4 bins
    w = jnp.array([[0.0, 1.0, 1.0, 0.0]])
    u = jnp.array([0.25, 0.75])
    t = importance.inverse_cdf_sample(t_bins, w, u)
    # mass is uniform over [0.25, 0.75] -> quantiles at 0.375 and 0.625
    np.testing.assert_allclose(np.asarray(t[0]), [0.375, 0.625], atol=0.01)

    # gradient to weights exists and is finite
    g = jax.grad(lambda w: jnp.sum(importance.inverse_cdf_sample(t_bins, w, u)))(w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_inverse_cdf_gradient_matches_fd():
    t_bins = jnp.linspace(0.0, 2.0, 9)[None]
    w0 = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (1, 8))) + 0.2
    u = jnp.array([0.3, 0.6, 0.9])

    def f(w):
        return jnp.sum(importance.inverse_cdf_sample(t_bins, w, u))

    g = np.asarray(jax.grad(f)(w0))
    for k in (1, 4, 6):
        eps = 1e-4
        dw = jnp.zeros_like(w0).at[0, k].set(eps)
        fd = (float(f(w0 + dw)) - float(f(w0 - dw))) / (2 * eps)
        np.testing.assert_allclose(g[0, k], fd, rtol=5e-2, atol=1e-3)


def test_coarse_to_fine_concentrates_samples():
    def field(x):
        sigma = 5.0 * jnp.exp(-jnp.sum(x ** 2, -1) / 0.05)
        return sigma, jnp.ones(x.shape[:-1] + (3,))

    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    C, T, t_f = importance.coarse_to_fine_render(
        field, lambda x: field(x)[0], o, d, 0.5, 3.5, 16, 32)
    # fine samples should cluster near t=2 (the blob at origin)
    frac_near = float(jnp.mean((jnp.abs(t_f - 2.0) < 0.5).astype(jnp.float32)))
    assert frac_near > 0.6
    assert np.isfinite(np.asarray(C)).all()


def test_isosurface_implicit_gradient():
    def field_s(c, x):
        return -(jnp.linalg.norm(x - c, axis=-1) - 0.5)

    o = jnp.array([[-2.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])

    def t_of_center(cx):
        c = jnp.array([cx, 0.0, 0.0])
        t, hit = isosurface.intersect(field_s, c, o, d, s0=0.0, t0=0.1, t1=4.0)
        return jnp.sum(t)

    t0 = float(t_of_center(0.2))
    np.testing.assert_allclose(t0, 1.7, atol=0.01)  # hits sphere at x=-0.3
    g = float(jax.grad(t_of_center)(0.2))
    # moving the sphere +x by dc moves the entry point +x by dc -> dt/dc = 1
    np.testing.assert_allclose(g, 1.0, atol=0.05)


def test_smooth_step():
    s = jnp.linspace(-1, 1, 5)
    out = dr.smooth_step(s, 0.0, beta=50.0)
    assert float(out[0]) < 0.01 and float(out[-1]) > 0.99


def test_inverse_cdf_mm_bin_dt():
    """Importance-consistent per-sample dt: uniform mass reproduces the
    fixed-step spacing exactly; concentrated mass gives the local expected
    spacing in occupied bins, independent of skipped-gap widths."""
    K, n = 8, 16
    t_bins = jnp.linspace(0.0, 2.0, K + 1)[None]
    u = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n

    w_uni = jnp.ones((1, K))
    t, dt = importance.inverse_cdf_sample_mm(t_bins, w_uni, u,
                                             return_bin_dt=True)
    np.testing.assert_allclose(np.asarray(dt), 2.0 / n, rtol=1e-4)
    t_ref = importance.inverse_cdf_sample_mm(t_bins, w_uni, u)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), atol=1e-6)

    # All mass in bins 2+3 (t in [0.5, 1.0]): samples land there with the
    # local spacing 0.5/n; the surrounding empty span does not bleed in.
    w_sp = jnp.zeros((1, K)).at[0, 2:4].set(1.0)
    t, dt = importance.inverse_cdf_sample_mm(t_bins, w_sp, u,
                                             return_bin_dt=True)
    t = np.asarray(t)[0]
    assert (t >= 0.5 - 1e-4).all() and (t <= 1.0 + 1e-4).all()
    np.testing.assert_allclose(np.asarray(dt)[0], 0.5 / n, rtol=1e-3)

    # Near-zero-mass bins are capped at 2 * max(len, span/n), not unbounded.
    w_eps = jnp.full((1, K), 1e-7).at[0, 0].set(1.0)
    _, dt = importance.inverse_cdf_sample_mm(t_bins, w_eps, u,
                                             return_bin_dt=True)
    span = 2.0
    cap = 2.0 * max(span / K, span / n)
    assert float(np.max(np.asarray(dt))) <= cap + 1e-5
