"""Inverse rendering at scale: fit an INR radiance field from rendered
multi-modal views (reference phase-3 goal, ``docs/Goals.md:36-39,257`` +
``docs/DifferentiableRendering.md:133-148``).

The reference shipped only a 1-D Slang autodiff demo
(``notebooks/sample_notebook/func.slang``); this trains a real M5-class
MLP (``models/mlp``) from nothing but 2-D renders of a multi-modal volume,
through the differentiable marcher (``ops/diffrender``) with
inverse-CDF coarse-to-fine importance sampling (``ops/importance``):

  * target views: emission-absorption renders of a synthetic BraTS-like
    volume — sigma from the modality blend, COLOR CHANNELS = three raw
    modalities (t1n, t1c, t2w), so each pixel supervises a genuinely
    multi-modal field;
  * model: RFF features (M2) -> plain ReLU MLP (M5 pytree) -> softplus
    sigma + sigmoid 3-modality emission;
  * training: random pixel batches across all views, coarse->fine render
    (uniform probe of the LIVE field's density -> inverse-CDF fine
    placement), Adam + cosine decay, MSE in image space;
  * evaluation: full-res recovered renders vs targets, train AND held-out
    poses, reported as PSNR.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mri_raytracer_tpu.models import features as feats
from mri_raytracer_tpu.models import mlp as mlp_mod
from mri_raytracer_tpu.ops import diffrender as dr
from mri_raytracer_tpu.ops import importance as imp
from mri_raytracer_tpu.render.camera import OrbitalCamera, camera_rays


# ----------------------------------------------------------------- target
def make_target_field(mods_disp: jnp.ndarray, sigma_scale: float = 6.0):
    """Ground-truth multi-modal field from a display-normalized (M,H,W,D)
    volume stack: sigma = scale * trilinear(blend of all modalities),
    rgb = trilinear of modalities 0..2. World frame: volume centered at the
    origin in [-1, 1]^3 (longest axis)."""
    from mri_raytracer_tpu.ops.trilinear import trilinear_sample

    shape = mods_disp.shape[1:]
    n = max(shape)
    vol_min = -jnp.asarray(shape, jnp.float32) / n
    voxel = jnp.full((3,), 2.0 / n, jnp.float32)
    blend = jnp.mean(mods_disp, axis=0)

    def field(x):
        pidx = (x - vol_min) / voxel
        sigma = sigma_scale * trilinear_sample(blend, pidx)
        rgb = jnp.stack([trilinear_sample(mods_disp[c], pidx)
                         for c in range(3)], axis=-1)
        return sigma, rgb

    return field


def make_orbit_bases(n_views: int, radius: float = 2.6,
                     phi: float = 1.15, phase: float = 0.0,
                     fov_y: float = 0.9) -> List:
    """Evenly-spaced orbit poses; ``phase`` shifts the orbit so held-out
    views are disjoint from training views."""
    bases = []
    for i in range(n_views):
        theta = phase + 2.0 * np.pi * i / n_views
        cam = OrbitalCamera(radius=radius, theta=theta,
                            phi=phi + 0.25 * np.sin(3.1 * i), fov_y=fov_y)
        bases.append(cam.basis())
    return bases


def render_target_views(field, bases, res: int, t0: float, t1: float,
                        n_samples: int = 192, row_chunk: int = 64
                        ) -> np.ndarray:
    """(V, res, res, 3) reference renders, row-chunked to bound memory."""
    @jax.jit
    def rows(ro, rd):
        return dr.render_field(field, ro, rd, t0, t1, n_samples).rgb

    views = []
    for basis in bases:
        ro, rd = camera_rays(basis, res, res)
        img = np.concatenate(
            [np.asarray(rows(ro[r:r + row_chunk], rd[r:r + row_chunk]))
             for r in range(0, res, row_chunk)], axis=0)
        views.append(img)
    return np.stack(views)


# ------------------------------------------------------------------- model
def init_inr_field(key, rff_dim: int = 96, rff_sigma: float = 1.6,
                   hidden=(128, 128, 128, 128)):
    """RFF + M5 MLP radiance field params: {'B': (3,F), 'mlp': [{'W','b'}]}."""
    kB, kM = jax.random.split(key)
    B = feats.init_rff(kB, 3, rff_dim, rff_sigma)
    _, params = mlp_mod.init_mlp(kM, 2 * rff_dim, hidden, 4)
    return {"B": B, "mlp": params}


def make_inr_field(params, sigma_scale: float = 6.0):
    def field(x):
        h = feats.rff_features(x, params["B"])
        o = mlp_mod.apply_mlp(params["mlp"], h)
        sigma = sigma_scale * jax.nn.sigmoid(o[..., 0])
        # Support bound: the scene is the volume box ([-1,1]^3 on the
        # longest axis) and the target field is identically zero outside
        # it. Without this mask the MLP is free to hallucinate density in
        # the (train-ray-unsupervised) shell between the box and a NOVEL
        # camera, which occludes the scene and collapses held-out PSNR
        # (~8 dB measured) while train views still fit.
        inside = jnp.all(jnp.abs(x) <= 1.0, axis=-1)
        sigma = sigma * inside.astype(sigma.dtype)
        rgb = jax.nn.sigmoid(o[..., 1:4])
        return sigma, rgb

    return field


# ---------------------------------------------------------------- training
def fit_from_views(targets: np.ndarray, bases, t0: float, t1: float,
                   steps: int = 2500, batch_rays: int = 4096,
                   n_coarse: int = 48, n_fine: int = 96, lr: float = 3e-3,
                   sigma_scale: float = 6.0, key=None,
                   params=None, log_every: int = 250,
                   log_fn=print) -> Tuple[Dict, List[float]]:
    """Optimize the INR from target images only. Returns (params, losses)."""
    import optax

    key = jax.random.PRNGKey(0) if key is None else key
    key, kinit = jax.random.split(key)
    if params is None:
        params = init_inr_field(kinit)

    V, R = targets.shape[0], targets.shape[1]
    ros, rds = [], []
    for basis in bases:
        ro, rd = camera_rays(basis, R, R)
        ros.append(ro)
        rds.append(rd)
    all_ro = jnp.asarray(np.stack(ros)).reshape(V * R * R, 3)
    all_rd = jnp.asarray(np.stack(rds)).reshape(V * R * R, 3)
    all_tg = jnp.asarray(targets).reshape(V * R * R, 3)

    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.02)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    def render_batch(params, ro, rd):
        field = make_inr_field(params, sigma_scale)

        def importance_fn(x):
            # Coarse probe of the LIVE field's own density (stop-grad: the
            # fine march already differentiates through sample PLACEMENT
            # via the inverse CDF; probing gradients add cost, not signal).
            s, _ = field(jax.lax.stop_gradient(x))
            return jax.lax.stop_gradient(s) + 1e-3

        C, _, _ = imp.coarse_to_fine_render(field, importance_fn, ro, rd,
                                            t0, t1, n_coarse=n_coarse,
                                            n_fine=n_fine)
        return C

    def loss_fn(params, ro, rd, tg):
        return jnp.mean((render_batch(params, ro, rd) - tg) ** 2)

    @jax.jit
    def step_fn(params, opt_state, key):
        key, kb = jax.random.split(key)
        idx = jax.random.randint(kb, (batch_rays,), 0, V * R * R)
        loss, g = jax.value_and_grad(loss_fn)(
            params, all_ro[idx], all_rd[idx], all_tg[idx])
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, loss

    losses = []
    for it in range(steps):
        params, opt_state, key, loss = step_fn(params, opt_state, key)
        if it % log_every == 0 or it == steps - 1:
            lval = float(loss)
            losses.append(lval)
            log_fn(f"[fit] step {it}/{steps} loss {lval:.3e}")
    return params, losses


def render_inr_views(params, bases, res: int, t0: float, t1: float,
                     n_coarse: int = 48, n_fine: int = 96,
                     sigma_scale: float = 6.0,
                     row_chunk: int = 64) -> np.ndarray:
    """Recovered renders with the SAME coarse-to-fine sampler used in
    training (V, res, res, 3)."""
    field = make_inr_field(params, sigma_scale)

    def importance_fn(x):
        s, _ = field(x)
        return s + 1e-3

    @jax.jit
    def rows(ro, rd):
        C, _, _ = imp.coarse_to_fine_render(field, importance_fn, ro, rd,
                                            t0, t1, n_coarse=n_coarse,
                                            n_fine=n_fine)
        return C

    views = []
    for basis in bases:
        ro, rd = camera_rays(basis, res, res)
        img = np.concatenate(
            [np.asarray(rows(ro[r:r + row_chunk], rd[r:r + row_chunk]))
             for r in range(0, res, row_chunk)], axis=0)
        views.append(img)
    return np.stack(views)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - b) ** 2))
    return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))


# ------------------------------------- fitting THROUGH the fast renderer
def init_modality_inr(key, n_mods: int = 4, rff_dim: int = 96,
                      rff_sigma: float = 1.6, hidden=(128, 128, 128)):
    """RFF + M5 MLP predicting per-modality display intensities."""
    kB, kM = jax.random.split(key)
    B = feats.init_rff(kB, 3, rff_dim, rff_sigma)
    _, params = mlp_mod.init_mlp(kM, 2 * rff_dim, hidden, n_mods)
    return {"B": B, "mlp": params}


def bake_modalities(params, shape, chunk: int = 8192) -> jnp.ndarray:
    """Differentiably evaluate the INR on the full voxel grid ->
    (M, X, Y, Z) display volumes. Coordinates use the training convention
    (index/max-dim in [0, 1)); chunked ``lax.map`` with ``jax.checkpoint``
    keeps the bake's backward memory at O(chunk)."""
    X, Y, Z = shape
    n = float(max(shape))
    ii, jj, kk = jnp.meshgrid(jnp.arange(X), jnp.arange(Y), jnp.arange(Z),
                              indexing="ij")
    coords = jnp.stack([ii, jj, kk], -1).reshape(-1, 3).astype(jnp.float32)
    coords = coords / n
    pad = (-coords.shape[0]) % chunk
    coords = jnp.pad(coords, ((0, pad), (0, 0)))

    @jax.checkpoint
    def block(c):
        h = feats.rff_features(c, params["B"])
        return jax.nn.sigmoid(mlp_mod.apply_mlp(params["mlp"], h))

    out = jax.lax.map(block, coords.reshape(-1, chunk, 3))
    out = out.reshape(-1, out.shape[-1])[: X * Y * Z]
    return jnp.moveaxis(out.reshape(X, Y, Z, -1), -1, 0)


def fit_views_shearwarp(targets: np.ndarray, bases, p, shape,
                        out_res: int = 128, steps: int = 300,
                        views_per_step: int = 2, lr: float = 2e-3,
                        key=None, params=None, log_every: int = 25,
                        log_fn=print) -> Tuple[Dict, List[float]]:
    """Fit the INR against images rendered by the PRODUCTION shear-warp
    renderer (``composite='scan_remat'``): each step differentiably bakes
    the INR to the full voxel grid (MXU matmuls), renders full frames
    through the sweep, and backprops the image MSE through bake + sweep +
    warp. The trainable fast-renderer path (Goals.md:36-39) — no
    side-channel marcher anywhere in the loss."""
    import optax

    from mri_raytracer_tpu.ops import shearwarp as sw

    key = jax.random.PRNGKey(0) if key is None else key
    key, kinit = jax.random.split(key)
    if params is None:
        params = init_modality_inr(kinit)

    # One compiled grad program per sweep axis: the axis is a host-side
    # static (it selects the volume permutation), so views are grouped by
    # dominant_axis and each step draws its mini-batch from one group.
    groups: Dict[int, List[int]] = {}
    for i, b in enumerate(bases):
        groups.setdefault(sw.dominant_axis(b), []).append(i)
    axes = sorted(groups)
    basis_vecs = jnp.stack([b.pack() for b in bases])
    tg = jnp.asarray(targets)
    R = targets.shape[1]

    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    import functools

    @functools.partial(jax.jit, static_argnames=("axis",))
    def step_fn(params, opt_state, vecs, tgs, axis):
        def loss_fn(params):
            mods = bake_modalities(params, shape)

            def one(vec, t):
                img = sw.render_brats(mods, None, None, vec, p, R, R,
                                      out_res=out_res,
                                      composite="scan_remat",
                                      use_gamma=False, use_clip=False,
                                      axis=axis)
                return jnp.mean((img - t) ** 2)

            return jnp.mean(jax.vmap(one)(vecs, tgs))

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2**31 - 1)))
    losses = []
    for it in range(steps):
        axis = axes[it % len(axes)]
        idx = rng.choice(groups[axis], size=views_per_step, replace=True)
        idx = jnp.asarray(idx)
        params, opt_state, loss = step_fn(params, opt_state,
                                          basis_vecs[idx], tg[idx], axis)
        if it % log_every == 0 or it == steps - 1:
            lval = float(loss)
            losses.append(lval)
            log_fn(f"[fit-sw] step {it}/{steps} axis {axis} "
                   f"loss {lval:.3e}")
    return params, losses


def run_shearwarp(shape=(64, 64, 64), res: int = 256, out_res: int = 128,
                  n_train_views: int = 16, n_held_views: int = 4,
                  steps: int = 300, views_per_step: int = 2, seed: int = 0,
                  log_fn=print) -> Dict:
    """Inverse rendering with the PRODUCTION renderer end to end: targets,
    loss, and evaluation all use ``shearwarp.render_brats``."""
    from mri_raytracer_tpu.data import brats as brats_mod
    from mri_raytracer_tpu.data import synthetic
    from mri_raytracer_tpu.ops import shearwarp as sw
    from mri_raytracer_tpu.render import params as rp

    mods, _ = synthetic.synthetic_case(shape, seed=seed)
    disp = jnp.asarray(np.stack([brats_mod.percentile_normalize(m)
                                 for m in mods]))
    p = rp.default_render_params(shape, show_seg=False)
    radius = rp.default_camera_radius(p, shape)

    bases_tr = make_orbit_bases(n_train_views, radius=radius)
    bases_ho = make_orbit_bases(n_held_views, radius=radius,
                                phase=np.pi / n_train_views, phi=1.3)

    def render_views(vols, bases):
        return np.stack([np.asarray(sw.render_brats(
            vols, None, None, b, p, res, res, out_res=out_res,
            composite="scan", use_gamma=False, use_clip=False))
            for b in bases])

    t_start = time.perf_counter()
    tg_tr = render_views(disp, bases_tr)
    tg_ho = render_views(disp, bases_ho)
    t_targets = time.perf_counter() - t_start

    t_start = time.perf_counter()
    params, losses = fit_views_shearwarp(
        tg_tr, bases_tr, p, shape, out_res=out_res, steps=steps,
        views_per_step=views_per_step, key=jax.random.PRNGKey(seed),
        log_fn=log_fn)
    t_fit = time.perf_counter() - t_start

    baked = bake_modalities(params, shape)
    rec_tr = render_views(baked, bases_tr)
    rec_ho = render_views(baked, bases_ho)

    psnr_tr = [psnr(rec_tr[i], tg_tr[i]) for i in range(len(bases_tr))]
    psnr_ho = [psnr(rec_ho[i], tg_ho[i]) for i in range(len(bases_ho))]
    return {
        "renderer": "shearwarp", "shape": list(shape), "res": res,
        "out_res": out_res, "n_train_views": n_train_views,
        "n_held_views": n_held_views, "steps": steps,
        "views_per_step": views_per_step,
        "n_params": mlp_mod.count_params(params["mlp"]),
        "losses": losses,
        "psnr_train_mean": float(np.mean(psnr_tr)),
        "psnr_train_min": float(np.min(psnr_tr)),
        "psnr_heldout_mean": float(np.mean(psnr_ho)),
        "psnr_heldout_min": float(np.min(psnr_ho)),
        "wall_s_targets": round(t_targets, 1),
        "wall_s_fit": round(t_fit, 1),
        "volume_psnr_db": psnr(np.asarray(baked), np.asarray(disp)),
        "_recovered": rec_tr, "_targets": tg_tr,
        "_recovered_ho": rec_ho, "_targets_ho": tg_ho,
    }


def run(shape=(64, 64, 64), res: int = 256, n_train_views: int = 16,
        n_held_views: int = 4, steps: int = 2500, batch_rays: int = 4096,
        n_coarse: int = 48, n_fine: int = 96, seed: int = 0,
        log_fn=print) -> Dict:
    """End-to-end protocol; returns the result record (see the script)."""
    from mri_raytracer_tpu.data import brats, synthetic

    mods, _ = synthetic.synthetic_case(shape, seed=seed)
    disp = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    target_field = make_target_field(disp)
    t0, t1 = 0.9, 4.3  # orbit radius 2.6 vs unit-box scene

    bases_tr = make_orbit_bases(n_train_views)
    bases_ho = make_orbit_bases(n_held_views,
                                phase=np.pi / n_train_views, phi=1.3)

    t_start = time.perf_counter()
    tg_tr = render_target_views(target_field, bases_tr, res, t0, t1)
    tg_ho = render_target_views(target_field, bases_ho, res, t0, t1)
    t_targets = time.perf_counter() - t_start

    t_start = time.perf_counter()
    params, losses = fit_from_views(tg_tr, bases_tr, t0, t1, steps=steps,
                                    batch_rays=batch_rays,
                                    n_coarse=n_coarse, n_fine=n_fine,
                                    key=jax.random.PRNGKey(seed),
                                    log_fn=log_fn)
    t_fit = time.perf_counter() - t_start

    t_start = time.perf_counter()
    rec_tr = render_inr_views(params, bases_tr, res, t0, t1,
                              n_coarse=n_coarse, n_fine=n_fine)
    rec_ho = render_inr_views(params, bases_ho, res, t0, t1,
                              n_coarse=n_coarse, n_fine=n_fine)
    t_render = time.perf_counter() - t_start

    psnr_tr = [psnr(rec_tr[i], tg_tr[i]) for i in range(len(bases_tr))]
    psnr_ho = [psnr(rec_ho[i], tg_ho[i]) for i in range(len(bases_ho))]
    return {
        "shape": list(shape), "res": res,
        "n_train_views": n_train_views, "n_held_views": n_held_views,
        "steps": steps, "batch_rays": batch_rays,
        "n_coarse": n_coarse, "n_fine": n_fine,
        "n_params": mlp_mod.count_params(params["mlp"]),
        "losses": losses,
        "psnr_train_mean": float(np.mean(psnr_tr)),
        "psnr_train_min": float(np.min(psnr_tr)),
        "psnr_heldout_mean": float(np.mean(psnr_ho)),
        "psnr_heldout_min": float(np.min(psnr_ho)),
        "wall_s_targets": round(t_targets, 1),
        "wall_s_fit": round(t_fit, 1),
        "wall_s_render": round(t_render, 1),
        "_recovered": rec_tr, "_targets": tg_tr,
        "_recovered_ho": rec_ho, "_targets_ho": tg_ho,
    }
