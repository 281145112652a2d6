"""Trilinear/nearest sampling vs scipy oracle + gradient checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.ndimage import map_coordinates

from mri_raytracer_tpu.ops import trilinear


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(3)
    return rng.normal(0, 1, size=(9, 7, 11)).astype(np.float32)


def test_trilinear_matches_scipy(vol):
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, np.array(vol.shape) - 1.01, size=(200, 3)).astype(np.float32)
    ours = np.asarray(trilinear.trilinear_sample(jnp.asarray(vol), jnp.asarray(pts)))
    ref = map_coordinates(vol, pts.T, order=1, mode="nearest")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_trilinear_clamps_outside(vol):
    pts = jnp.array([[-5.0, -5.0, -5.0], [100.0, 100.0, 100.0]])
    out = trilinear.trilinear_sample(jnp.asarray(vol), pts)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(out[0], vol[0, 0, 0], rtol=1e-4)


def test_nearest(vol):
    pts = jnp.array([[1.2, 2.7, 3.4], [0.0, 0.0, 0.0], [8.9, 6.9, 10.9]])
    out = np.asarray(trilinear.nearest_sample(jnp.asarray(vol), pts))
    np.testing.assert_allclose(out[0], vol[1, 3, 3])
    np.testing.assert_allclose(out[1], vol[0, 0, 0])
    np.testing.assert_allclose(out[2], vol[8, 6, 10])


def test_trilinear_grad_vol(vol):
    """Custom VJP grid gradient == autodiff of the base implementation."""
    pts = jnp.array([[1.3, 2.2, 3.7], [4.9, 0.1, 8.8], [2.0, 3.0, 4.0]])
    v = jnp.asarray(vol)

    def f_custom(v):
        return jnp.sum(trilinear.trilinear_sample(v, pts) ** 2)

    def f_base(v):
        return jnp.sum(trilinear.trilinear_sample_base(v, pts) ** 2)

    g_custom = jax.grad(f_custom)(v)
    g_base = jax.grad(f_base)(v)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_base),
                               rtol=1e-4, atol=1e-5)


def test_trilinear_grad_pts(vol):
    """Positional gradient vs finite differences (interior points only)."""
    pts = jnp.array([[2.3, 3.2, 4.7], [5.1, 2.8, 7.3]])
    v = jnp.asarray(vol)

    def f(p):
        return jnp.sum(trilinear.trilinear_sample(v, p))

    g = np.asarray(jax.grad(f)(pts))
    eps = 1e-3
    for i in range(2):
        for ax in range(3):
            dp = np.zeros((2, 3), np.float32)
            dp[i, ax] = eps
            fp = float(f(pts + dp))
            fm = float(f(pts - dp))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(g[i, ax], fd, rtol=1e-2, atol=1e-3)


def test_multi_channel(vol):
    vols = jnp.stack([jnp.asarray(vol), jnp.asarray(vol) * 2.0])
    pts = jnp.array([[1.5, 2.5, 3.5]])
    out = trilinear.trilinear_sample_multi(vols, pts)
    assert out.shape == (1, 2)
    np.testing.assert_allclose(out[0, 1], out[0, 0] * 2.0, rtol=1e-5)
