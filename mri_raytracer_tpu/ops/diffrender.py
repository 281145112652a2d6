"""Differentiable volume rendering (reference ``docs/DifferentiableRendering.md``).

The reference planned this subsystem around Slang autodiff and shipped only a
1-D demo (``notebooks/sample_notebook/func.slang``); here the full spec is
implemented and gradient-checked:

  * front-to-back compositing with a hand-written O(N) reverse pass
    (custom VJP implementing the doc's §5 adjoint; residuals are just
    alphas+colors — transmittances are recomputed, not stored)
  * ``alpha_from_sigma`` with the stable small-tau series (§12)
  * a generic differentiable marcher over any field fn (grid trilinear or
    neural); gradients flow to field parameters, voxel grids, ray origins
    and directions (§6, §9), with optional ``jax.checkpoint`` chunking
  * POI Gaussian influence fields with gradients to positions/weights (§8)
  * smooth relaxations of hard thresholds (§11)

Coarse-to-fine inverse-CDF sampling (§7) lives in ``ops/importance.py``;
isosurface implicit differentiation (§10) in ``ops/isosurface.py``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mri_raytracer_tpu.ops.trilinear import trilinear_sample


# ----------------------------------------------------------------- composite
def _composite_fwd_impl(colors: jnp.ndarray, alphas: jnp.ndarray):
    """colors (..., N, 3), alphas (..., N) -> C (..., 3), T_final (...)."""
    one_m = 1.0 - alphas
    # T_excl_i = prod_{j<i} (1 - alpha_j): shifted inclusive cumprod.
    T_excl = jnp.concatenate([jnp.ones_like(alphas[..., :1]),
                              jnp.cumprod(one_m, axis=-1)[..., :-1]], axis=-1)
    C = jnp.sum((T_excl * alphas)[..., None] * colors, axis=-2)
    T_final = jnp.prod(one_m, axis=-1)
    return C, T_final, T_excl


@jax.custom_vjp
def composite_fronttoback(colors: jnp.ndarray, alphas: jnp.ndarray):
    """Emission-absorption compositing C = sum_i T_{i-1} c_i alpha_i.

    Differentiable with the manual O(N) adjoint of
    ``DifferentiableRendering.md §5``:
      c~_i     = G * T_{i-1} alpha_i
      alpha~_i = G . (T_{i-1} c_i) - S_i / (1 - alpha_i),
                 S_i = sum_{j>i} T_{j-1} alpha_j (G . c_j)
    (the second term folds the T-recurrence adjoint into a suffix sum).
    """
    C, T_final, _ = _composite_fwd_impl(colors, alphas)
    return C, T_final


def _comp_fwd(colors, alphas):
    C, T_final, _ = _composite_fwd_impl(colors, alphas)
    return (C, T_final), (colors, alphas, T_final)


def _comp_bwd(res, grads):
    colors, alphas, T_final = res
    G, G_T = grads  # dL/dC (..., 3), dL/dT_final (...)
    one_m = jnp.maximum(1.0 - alphas, 1e-20)
    T_excl = jnp.concatenate([jnp.ones_like(alphas[..., :1]),
                              jnp.cumprod(1.0 - alphas, axis=-1)[..., :-1]],
                             axis=-1)
    w = T_excl * alphas  # (..., N)
    d_colors = G[..., None, :] * w[..., None]

    gc = jnp.sum(G[..., None, :] * colors, axis=-1)  # (..., N) G.c_i
    contrib = w * gc  # T_{i-1} alpha_i (G.c_i)
    # Suffix sum S_i = sum_{j>i} contrib_j
    S = jnp.flip(jnp.cumsum(jnp.flip(contrib, -1), -1), -1) - contrib
    d_alphas = T_excl * gc - S / one_m
    # dT_final/dalpha_i = -T_final/(1-alpha_i)
    d_alphas = d_alphas - (G_T * T_final)[..., None] / one_m
    return d_colors, d_alphas


composite_fronttoback.defvjp(_comp_fwd, _comp_bwd)


def alpha_from_sigma(sigma: jnp.ndarray, dt: jnp.ndarray,
                     series_eps: float = 1e-4) -> jnp.ndarray:
    """alpha = 1 - exp(-sigma dt); series tau - tau^2/2 for tiny tau (§12)."""
    tau = sigma * dt
    return jnp.where(tau < series_eps, tau - 0.5 * tau * tau,
                     1.0 - jnp.exp(-tau))


# ---------------------------------------------------------------- field fns
def make_grid_field(sigma_grid: jnp.ndarray,
                    color_grid: Optional[jnp.ndarray] = None,
                    vol_min=None, voxel_size=None) -> Callable:
    """Voxel-grid field: x (world, (...,3)) -> (sigma (...) , rgb (...,3)).
    Gradients flow to the grids via the trilinear custom VJP and to positions
    via its analytic positional gradient."""
    vol_min = jnp.zeros(3) if vol_min is None else jnp.asarray(vol_min)
    voxel_size = jnp.ones(3) if voxel_size is None else jnp.asarray(voxel_size)

    def field(x):
        pidx = (x - vol_min) / voxel_size
        sigma = jax.nn.softplus(trilinear_sample(sigma_grid, pidx))
        if color_grid is None:
            rgb = jnp.ones(x.shape[:-1] + (3,))
        else:
            rgb = jnp.stack([trilinear_sample(color_grid[c], pidx)
                             for c in range(3)], axis=-1)
            rgb = jax.nn.sigmoid(rgb)
        return sigma, rgb

    return field


def poi_influence(x: jnp.ndarray, positions: jnp.ndarray,
                  amplitudes: jnp.ndarray, radii: jnp.ndarray) -> jnp.ndarray:
    """g(x;P) = sum_k a_k exp(-|x-p_k|^2 / (2 r_k^2)) — Gaussian POI field
    (§8); autodiff yields exactly the doc's dp_k formula."""
    d2 = jnp.sum((x[..., None, :] - positions) ** 2, axis=-1)  # (..., K)
    return jnp.sum(amplitudes * jnp.exp(-d2 / (2.0 * radii ** 2)), axis=-1)


def smooth_step(s: jnp.ndarray, s0, beta: float = 20.0) -> jnp.ndarray:
    """Sigmoid relaxation of the hard threshold 1[s > s0] (§11)."""
    return jax.nn.sigmoid(beta * (s - s0))


# ------------------------------------------------------------------ marcher
class DiffRenderOut(NamedTuple):
    rgb: jnp.ndarray  # (..., 3)
    transmittance: jnp.ndarray  # (...)


def render_field(field: Callable, origins: jnp.ndarray, dirs: jnp.ndarray,
                 t0, t1, n_samples: int = 64,
                 checkpoint_chunks: int = 0) -> DiffRenderOut:
    """Differentiable uniform-step march of ``field`` along rays.

    origins/dirs (..., 3); t0/t1 scalars or (...)-shaped. Samples at
    t_i = t0 + (i + 0.5) dt (midpoint). Gradients reach field params AND
    (o, d): dL/do = sum_i dL/dx_i, dL/dd = sum_i t_i dL/dx_i — exactly §9,
    produced by autodiff through x_i = o + t_i d.

    ``checkpoint_chunks > 0`` rematerializes the field in chunks (§12 memory
    note) instead of storing every sample's activations.
    """
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    dt = (t1 - t0) / n_samples  # (...) or scalar
    i = jnp.arange(n_samples, dtype=jnp.float32)
    ts = t0[..., None] + (i + 0.5) * dt[..., None]  # (..., N)
    x = origins[..., None, :] + ts[..., None] * dirs[..., None, :]

    def eval_field(xc):
        sig, rgb = field(xc)
        return sig, rgb

    if checkpoint_chunks > 1:
        xs = jnp.split(x, checkpoint_chunks, axis=-2)
        outs = [jax.checkpoint(eval_field)(xc) for xc in xs]
        sigma = jnp.concatenate([o[0] for o in outs], axis=-1)
        rgb = jnp.concatenate([o[1] for o in outs], axis=-2)
    else:
        sigma, rgb = eval_field(x)

    alphas = alpha_from_sigma(sigma, dt[..., None])
    C, T = composite_fronttoback(rgb, alphas)
    return DiffRenderOut(rgb=C, transmittance=T)


def render_views(field: Callable, bases, width: int, height: int,
                 t0, t1, n_samples: int = 64) -> jnp.ndarray:
    """Render a batch of camera views -> (V, H, W, 3), fully differentiable
    (the inverse-rendering training signal: fit fields from images)."""
    from mri_raytracer_tpu.render.camera import camera_rays

    imgs = []
    for basis in bases:
        ro, rd = camera_rays(basis, width, height)
        out = render_field(field, ro, rd, t0, t1, n_samples)
        imgs.append(out.rgb)
    return jnp.stack(imgs)
