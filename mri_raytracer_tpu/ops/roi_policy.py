"""ROI-aware policy-MLP adaptive renderer (reference
``docs/Methodology-ROI-Neural-Volumetric-Rendering.md``).

The reference design puts a tiny in-shader MLP in the march loop that emits
a per-step delta-t scale in [0.25, 2.0] and a skip probability, with ROI
clamps (high tumor probability or near-boundary => fine steps, no skipping)
(``Methodology-ROI-Neural-Volumetric-Rendering.md:40-47``). Per-thread
divergent step sizes do not map to TPU vector units, so this module uses the
mathematically equivalent TPU-native formulation: **policy-guided sample
redistribution under a fixed budget**.

  Phase 1 (coarse): N_c uniform probes per ray gather an 8-feature vector
  (density, gradient magnitude, view-gradient alignment, coarse
  transmittance, normalized depth, tumor probability P(x), boundary
  proximity B(x), uncertainty U(x) — the methodology's feature list at
  :35-39). The policy MLP (8 -> H -> 2, ReLU; :40-44) maps each probe to a
  delta-t scale and skip probability.

  Phase 2 (fine): the per-segment sampling DENSITY rho_k proportional to
  (1 - skip_k) / scale_k drives differentiable inverse-CDF placement of N_f
  fine samples (``ops/importance.py``); per-sample dt is the realized
  spacing, so small scale == dense sampling == small dt, exactly the
  reference's delta-t modulation — but with static shapes, and the MLP
  batched over (rays x probes) rows on the MXU.

ROI clamps (:45-47): where P(x) > p_hi or boundary proximity > b_hi the
density is floored at the un-skipped base rate so tumor/boundary regions
never lose resolution regardless of what the policy says.

The whole path is differentiable (compositing via the O(N) adjoint in
``ops/diffrender``), so the policy trains directly against rendered
references with J = ROI-weighted image error + alpha * sample cost
(:49-53) — no PyTorch->shader export step is needed; FP16 parity of the
reference's weight upload is covered by running the MLP in bfloat16.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mri_raytracer_tpu.ops.diffrender import composite_fronttoback
from mri_raytracer_tpu.ops.importance import inverse_cdf_sample_mm
from mri_raytracer_tpu.ops.raymarch_xla import (aabb_hit, _safe_dir,
                                                transfer_function)
from mri_raytracer_tpu.ops.trilinear import trilinear_sample_base
from mri_raytracer_tpu.render.camera import CameraBasis, camera_rays
from mri_raytracer_tpu.render.params import BratsRenderParams

N_FEATURES = 8


class PolicyConfig(NamedTuple):
    hidden: int = 24  # 16-32 per the methodology (:42)
    scale_min: float = 0.25  # delta-t scale range (:43)
    scale_max: float = 2.0
    p_hi: float = 0.5  # ROI clamp thresholds (:45-46)
    b_hi: float = 0.5
    skip_floor: float = 0.02  # density floor so no segment fully starves


def init_policy(key, cfg: PolicyConfig = PolicyConfig()) -> Dict[str, jnp.ndarray]:
    """Tiny policy MLP: 8 -> hidden -> 3 (dt-scale logit, skip logit,
    LOD-offset logit — the methodology's optional third output, :43).

    Occupancy-informed initialization: dt-scale pinned at 1 (uniform
    stratified sampling is optimal for fully-visible smooth content) and
    skip = sigmoid(8 * relu(1 - 50 * occupancy) - 4) — skip hard exactly
    where the DILATED occupancy feature proves no content exists near the
    probe. Measured: this start already dominates the fixed-step baseline
    at every budget, while a random start renders far worse than uniform
    and gradient descent takes thousands of steps to claw back to par.
    Training refines scale/skip from here (ROI awareness, gradient-adaptive
    density).
    """
    k1, k2 = jax.random.split(key)
    s1 = float(np.sqrt(2.0 / N_FEATURES))
    s_one = (1.0 - cfg.scale_min) / (cfg.scale_max - cfg.scale_min)
    b_scale = float(np.log(s_one / (1.0 - s_one)))
    W1 = jax.random.normal(k1, (N_FEATURES, cfg.hidden)) * (0.05 * s1)
    W1 = W1.at[7, 0].set(-50.0)  # hidden 0 = relu(1 - 50*occupancy)
    b1 = jnp.zeros((cfg.hidden,)).at[0].set(1.0)
    W2 = jax.random.normal(k2, (cfg.hidden, 3)) * 0.01
    W2 = W2.at[0, 1].set(8.0)  # -> skip logit
    W2 = W2.at[0, 0].set(0.0)  # keep dt-scale at 1 regardless of occupancy
    W2 = W2.at[0, 2].set(0.0)  # LOD offset starts neutral
    return {"W1": W1, "b1": b1, "W2": W2,
            "b2": jnp.asarray([b_scale, -4.0, 0.0], jnp.float32)}


def apply_policy(params, feats: jnp.ndarray, cfg: PolicyConfig,
                 dtype=jnp.bfloat16
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """feats (..., 8) -> (dt_scale in [scale_min, scale_max], skip in [0,1],
    lod_offset in (-4, 4)).

    ``lod_offset`` shifts the dt-matched mip level of the fine march
    (see ``render_policy(lod_vol=...)``); checkpoints saved with the older
    2-output head load fine and report a neutral 0 offset. Runs in bfloat16
    (the TPU analog of the reference's FP16 weight path, Methodology:44)
    with float32 outputs.
    """
    x = feats.astype(dtype)
    h = jax.nn.relu(x @ params["W1"].astype(dtype) + params["b1"].astype(dtype))
    out = (h @ params["W2"].astype(dtype) + params["b2"].astype(dtype)) \
        .astype(jnp.float32)
    s = jax.nn.sigmoid(out[..., 0])
    dt_scale = cfg.scale_min + (cfg.scale_max - cfg.scale_min) * s
    skip = jax.nn.sigmoid(out[..., 1])
    if params["W2"].shape[-1] >= 3:
        # (-4, 4): wide enough to fully DISABLE the blend at coarse budgets
        # (lam = clip(log2(dt_vox) + off, 0, 1) needs off <= -log2(dt_vox),
        # and dt_vox reaches ~8-16 voxels at the smallest budgets).
        lod_off = 4.0 * jnp.tanh(out[..., 2])
    else:
        lod_off = jnp.zeros_like(skip)
    return dt_scale, skip, lod_off


# ------------------------------------------------------------ feature volumes
def build_feature_volumes(mixed: np.ndarray, seg: Optional[np.ndarray],
                          smooth_sigma: float = 2.0) -> Dict[str, np.ndarray]:
    """Precompute the ROI feature volumes (host-side, once per case).

    P(x): smoothed tumor probability from labels (Methodology:24);
    B(x): boundary proximity 1/(1+EDT) (:25, same map as the boundary loss);
    gradmag: finite-difference gradient magnitude of the blended volume and
    its direction (for view alignment, :36-38); U(x): zeros placeholder
    (:26 'otherwise U(x)=0').
    """
    from scipy import ndimage

    mixed = np.asarray(mixed, np.float32)
    gx, gy, gz = np.gradient(mixed)
    gradmag = np.sqrt(gx * gx + gy * gy + gz * gz).astype(np.float32)
    gnorm = np.maximum(gradmag, 1e-6)
    graddir = np.stack([gx / gnorm, gy / gnorm, gz / gnorm]).astype(np.float32)
    # Dilated occupancy: max intensity within a neighborhood comparable to
    # a coarse-segment span. A MIDPOINT probe reading ~0 does not make a
    # segment safe to skip (content can cross its interior); max-filtered
    # intensity ~0 does. This is the occupancy-grid idea (Methodology:34
    # 'optional occupancy grid') expressed as a policy feature.
    # Dilation radius: half a coarse-segment span (diag-chord/n_coarse/2 ~ 2
    # voxels at 96^3 / 48 probes) + trilinear support. Measured: size 5 beats
    # size 9 by ~1.8 dB at equal budget on 96^3 scenes (over-dilation
    # reclassifies skippable segments as occupied); size 3 under-protects.
    occ_r = max(5, min(mixed.shape) // 20) | 1
    occupancy = ndimage.maximum_filter(mixed, size=occ_r).astype(np.float32)

    if seg is not None:
        tumor = (np.asarray(seg) > 0).astype(np.float32)
        P = ndimage.gaussian_filter(tumor, smooth_sigma).astype(np.float32)
        if tumor.any() and not tumor.all():
            d_out = ndimage.distance_transform_edt(tumor == 0)
            d_in = ndimage.distance_transform_edt(tumor == 1)
            dist = np.where(tumor > 0, d_in, d_out).astype(np.float32)
            B = (1.0 / (1.0 + dist)).astype(np.float32)
        else:
            B = np.zeros_like(tumor)
    else:
        P = np.zeros_like(mixed)
        B = np.zeros_like(mixed)
    return {"P": P, "B": B, "gradmag": gradmag, "graddir": graddir,
            "occupancy": occupancy}


def pack_feature_rows(mixed: np.ndarray, feats: Dict[str, np.ndarray]) -> np.ndarray:
    """(X, Y, Z, 8) channel-packed probe volume: [raw intensity, gradmag,
    graddir_xyz, P, B, dilated occupancy]. One multi-channel trilinear
    row-gather per coarse probe replaces 7+ scalar-volume gathers (the
    probes dominated policy render time otherwise). The last slot is the
    reference's optional U(x) channel (:26 'otherwise U(x)=0'), repurposed
    for the occupancy field — the feature that makes skip decisions SAFE."""
    return np.stack([mixed, feats["gradmag"], feats["graddir"][0],
                     feats["graddir"][1], feats["graddir"][2], feats["P"],
                     feats["B"],
                     feats.get("occupancy", np.zeros_like(mixed))], axis=-1) \
        .astype(np.float32)


def _ray_setup(basis: CameraBasis, p: BratsRenderParams, dims,
               width: int, height: int, window=None):
    """``window``: optional ((x0, y0) traced, (win_w, win_h) static) —
    rays for a sub-rectangle of the ``width x height`` frame (foveated
    inset), bit-identical to the same pixels of the full frame."""
    if window is None:
        ro, rd = camera_rays(basis, width, height)
    else:
        from mri_raytracer_tpu.render.camera import camera_rays_window

        (x0, y0), (win_w, win_h) = window
        ro, rd = camera_rays_window(basis, width, height, x0, y0,
                                    win_w, win_h)
    rcp = 1.0 / _safe_dir(rd)
    bmin = p.vol_min
    bmax = p.vol_min + p.voxel_size * dims
    hit, t0, t1 = aabb_hit(ro, rcp, bmin, bmax)
    t0 = jnp.maximum(t0, jnp.maximum(0.0, p.near))
    t1 = jnp.where(p.far > 0.0, jnp.minimum(t1, p.far), t1)
    valid = hit & (t1 > t0)
    t0 = jnp.where(valid, t0, 0.0)
    t1 = jnp.where(valid, t1, 1e-3)
    return ro, rd, t0, t1, valid, bmin


def _sample_any(vol, pidx):
    if vol.ndim == 4:
        from mri_raytracer_tpu.ops.trilinear import trilinear_sample_packed
        return trilinear_sample_packed(vol, pidx)
    return trilinear_sample_base(vol, pidx)


def _march_composite(mixed, pidx, dt, p, valid, lod_vol=None, lam=None):
    """Shared fine-phase compositing: trilinear sample -> transfer ->
    alpha -> front-to-back (O(N) adjoint via ops/diffrender).

    ``mixed`` may be the plain (X, Y, Z) volume or the (X, Y, Z, 8)
    corner-packed form (``ops.trilinear.pack_trilinear_corners``) — the
    packed form does one wide row-gather per sample instead of 8 scalar
    gathers (~3x faster march; required at protocol scale).

    ``lod_vol``/``lam``: optional LOD blend — the sample lerps toward the
    2x-downsampled mip (``ops.trilinear.mip_downsample2``) by per-sample
    level ``lam`` in [0, 1] (the policy's optional LOD output,
    Methodology:43). Level-1 index space is voxel-center aligned:
    l1 = (l0 - 0.5) / 2."""
    v = _sample_any(mixed, pidx)
    if lod_vol is not None:
        v1 = _sample_any(lod_vol, (pidx - 0.5) * 0.5)
        v = v + (v1 - v) * lam
    val = transfer_function(v, p.ww, p.wl, p.gamma)
    a = 1.0 - jnp.exp(-val * p.intensity_alpha * dt)
    a = a * valid[..., None].astype(jnp.float32)
    C, T = composite_fronttoback(val[..., None] * jnp.ones((1, 1, 1, 3)), a)
    return C, T


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "n_steps", "block"))
def render_fixed(mixed: jnp.ndarray, basis_vec: jnp.ndarray,
                 p: BratsRenderParams, width: int, height: int,
                 n_steps: int, block: Optional[int] = None,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-step baseline (B1): n_steps uniform samples per ray between the
    per-ray AABB entry/exit. Returns (image (H,W,3), steps-per-ray scalar).

    ``block``: composite in sample blocks via lax.scan (memory-bounded;
    exact) — required at protocol scale (1080p, n_steps up to 512).
    """
    from mri_raytracer_tpu.render.camera import unpack_basis

    basis = unpack_basis(basis_vec)
    dims = jnp.array(mixed.shape[:3], jnp.float32)
    ro, rd, t0, t1, valid, bmin = _ray_setup(basis, p, dims, width, height)
    if block is not None and block < n_steps:
        # Per-block sample generation: never materializes the full
        # (H, W, N) t train (4+ GB at 1080p x 512 ref steps).
        nb = -(-n_steps // block)
        dt0 = (t1 - t0) / n_steps

        def body(carry, bi):
            C, T = carry
            k = bi * block + jnp.arange(block, dtype=jnp.float32) + 0.5
            in_n = (k < n_steps).astype(jnp.float32)
            tk = t0[..., None] + (k / n_steps) * (t1 - t0)[..., None]
            dtk = dt0[..., None] * in_n
            pos = ro[..., None, :] + tk[..., None] * rd[..., None, :]
            pidx = (pos - bmin) / p.voxel_size
            Cb, Tb = _march_composite(mixed, pidx, dtk, p, valid)
            return (C + T[..., None] * Cb, T * Tb), None

        C0 = jnp.zeros((height, width, 3), jnp.float32)
        T0 = jnp.ones((height, width), jnp.float32)
        (C, T), _ = jax.lax.scan(body, (C0, T0),
                                 jnp.arange(nb, dtype=jnp.float32))
    else:
        k = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps
        t = t0[..., None] + k * (t1 - t0)[..., None]  # (H, W, N)
        dt = ((t1 - t0) / n_steps)[..., None] * jnp.ones((1, 1, n_steps))
        pos = ro[..., None, :] + t[..., None] * rd[..., None, :]
        pidx = (pos - bmin) / p.voxel_size
        C, T = _march_composite(mixed, pidx, dt, p, valid)
    steps = jnp.float32(n_steps) * jnp.mean(valid.astype(jnp.float32))
    return C + p.bg_color[None, None, :] * T[..., None], steps


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "n_coarse", "n_fine",
                                    "cfg", "roi_clamp", "probe_stride",
                                    "block", "rho_upsample", "window_size"))
def render_policy(policy, mixed: jnp.ndarray, feat_rows: jnp.ndarray,
                  basis_vec: jnp.ndarray, p: BratsRenderParams,
                  width: int, height: int, n_coarse: int = 32,
                  n_fine: int = 64, cfg: PolicyConfig = PolicyConfig(),
                  roi_clamp: bool = True, probe_stride: int = 1,
                  block: Optional[int] = None, lod_vol=None,
                  rho_upsample: int = 1, window_origin=None,
                  window_size=None,
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Policy-guided adaptive render. Returns (image, stats).

    ``feat_rows``: (X, Y, Z, 8) packed probe volume from
    ``pack_feature_rows``. ``probe_stride``: a stride-S probe grid shares
    the coarse pass + policy decisions across S x S pixel blocks (the
    density field is smooth, so the per-block rho reuses fine; each ray
    still places its OWN fine samples via its own t bins).
    ``rho_upsample``: bilinearly interpolate the DENSITY field rho from
    the stride-S probe grid to a stride-S/u decision grid before the CDF
    inversion — at 1080p an 8x8 piecewise-CONSTANT decision block is too
    blocky (misses the B1-0.5dB bar where stride 4 clears it) while the
    probe FEATURES are smooth by construction, so interpolating rho
    recovers most of stride-4's quality at stride-8's coarse-pass cost.
    stats:
    'steps_per_ray' — effective useful samples per ray (fine samples
    landing in unskipped segments + the amortized coarse probes);
    'mean_scale', 'mean_skip' — policy output summaries.

    ``lod_vol``: optional 2x mip of ``mixed`` (same plain/packed form) —
    enables the policy's LOD output (Methodology:43): each fine sample
    blends toward the mip by lam = clip(log2(dt in voxels) + lod_offset,
    0, 1), i.e. sampling at the cone-matched prefilter level when the
    realized spacing is coarser than a voxel, shifted by the policy's
    per-ray learned offset.
    """
    from mri_raytracer_tpu.ops.trilinear import nearest_sample_rows
    from mri_raytracer_tpu.render.camera import unpack_basis

    basis = unpack_basis(basis_vec)
    dims = jnp.array(mixed.shape[:3], jnp.float32)
    window = None if window_size is None \
        else (window_origin, tuple(window_size))
    ro, rd, t0, t1, valid, bmin = _ray_setup(basis, p, dims, width, height,
                                             window=window)
    # Output raster dims: the window's when rendering a foveated inset
    # (``width``/``height`` keep defining the camera frustum).
    h_out, w_out = (window_size[1], window_size[0]) \
        if window_size is not None else (height, width)

    # ---- coarse probe: ONE 8-channel row-gather per sample, on a strided
    # pixel grid.
    S = probe_stride
    if S > 1:
        ro_c = ro[::S, ::S]
        rd_c = rd[::S, ::S]
        t0_c, t1_c = t0[::S, ::S], t1[::S, ::S]
    else:
        ro_c, rd_c, t0_c, t1_c = ro, rd, t0, t1
    kk = jnp.arange(n_coarse + 1, dtype=jnp.float32) / n_coarse
    t_bins_c = t0_c[..., None] + kk * (t1_c - t0_c)[..., None]
    t_mid = 0.5 * (t_bins_c[..., :-1] + t_bins_c[..., 1:])
    pos_c = ro_c[..., None, :] + t_mid[..., None] * rd_c[..., None, :]
    pidx_c = (pos_c - bmin) / p.voxel_size

    # Probe gathers: the 7 derived feature channels are smooth by
    # construction (Gaussian P/B, max-dilated occupancy, gradmag), so a
    # nearest row-gather (1 read/probe vs trilinear's 8) loses nothing a
    # policy decision can feel. Raw intensity feeds the coarse
    # transmittance estimate T_in (an actual quadrature), so it keeps
    # trilinear precision via the volume itself — together 2 gathers per
    # probe instead of 8, which removes the coarse pass's ~10%-of-B1@64
    # overhead at 1920x1080 (measured: tumor-a 0.91x -> ~1.0x+).
    probe = nearest_sample_rows(feat_rows, pidx_c)  # (h, w, Nc, 8)
    val_c = transfer_function(_sample_any(mixed, pidx_c),
                              p.ww, p.wl, p.gamma)
    g_c = probe[..., 1]
    gd = probe[..., 2:5]
    align = jnp.abs(jnp.sum(gd * rd_c[..., None, :], axis=-1))
    P_c = probe[..., 5]
    B_c = probe[..., 6]
    seg_dt = (t1_c - t0_c)[..., None] / n_coarse
    # Coarse transmittance estimate entering each segment (exclusive).
    a_c = 1.0 - jnp.exp(-val_c * p.intensity_alpha * seg_dt)
    T_c = jnp.cumprod(1.0 - a_c, axis=-1)
    T_in = jnp.concatenate([jnp.ones_like(T_c[..., :1]), T_c[..., :-1]],
                           axis=-1)
    depth = (t_mid - t0_c[..., None]) / jnp.maximum((t1_c - t0_c)[..., None],
                                                    1e-6)

    occ_c = probe[..., 7]  # dilated occupancy (safe-skip signal)
    feats = jnp.stack([val_c, g_c, align, T_in, depth, P_c, B_c, occ_c],
                      axis=-1)  # (h, w, Nc, 8)
    dt_scale, skip, lod_off = apply_policy(policy, feats, cfg)

    # ---- density + ROI clamps
    rho = (1.0 - skip) / dt_scale
    if roi_clamp:
        in_roi = (P_c > cfg.p_hi) | (B_c > cfg.b_hi)
        # ROI: step at least at the base rate (scale <= 1), never skip.
        rho = jnp.where(in_roi, jnp.maximum(rho, 1.0 / jnp.minimum(
            jnp.asarray(1.0), dt_scale)), rho)
    rho = jnp.maximum(rho, cfg.skip_floor)
    # Occluded segments get few samples. The threshold must sit well below
    # the visual floor: suppressing at T < 1e-2 caps achievable PSNR near
    # 40 dB (skipped contributions are ~T-weighted), 1e-3 keeps the ceiling
    # past 60 dB while still reclaiming samples from fully-opaque tails.
    rho = jnp.where(T_in > 1e-3, rho, cfg.skip_floor * 0.5)

    if lod_vol is not None:
        # Per-ray LOD offset: density-weighted over probes (fine samples
        # land where rho is high), shared across the S x S probe block.
        w_rho = rho / jnp.maximum(jnp.sum(rho, -1, keepdims=True), 1e-6)
        lod_ray = jnp.sum(w_rho * lod_off, -1)  # (h, w)
        if S > 1:
            lod_ray = jnp.repeat(jnp.repeat(lod_ray, S, 0), S,
                                 1)[:h_out, :w_out]
        vox_m = jnp.mean(p.voxel_size)

        def _lam(dt_f):
            # Textbook mip level = log2(sample footprint in voxels): level
            # 1 (the 2x mip) matches 2-voxel spacing. Smooth saturation
            # (sigmoid around the 0..1 ramp) instead of a hard clip: a
            # clipped lam has ZERO gradient to the policy's offset exactly
            # where training starts (coarse budgets put log2(dt_vox) > 1,
            # pinning lam at 1), so the LOD head could never learn.
            x = jnp.log2(jnp.maximum(dt_f / vox_m, 1e-6)) \
                + lod_ray[..., None]
            return jax.nn.sigmoid(4.0 * (x - 0.5))
    else:
        _lam = None

    # Stats/LOD read the PROBE-grid rho; the CDF below may read a finer
    # interpolated copy.
    rho_c = rho
    Su = S
    if rho_upsample > 1 and S > 1:
        if S % rho_upsample:
            raise ValueError(f"rho_upsample={rho_upsample} must divide "
                             f"probe_stride={S}")
        hs, ws, nc = rho.shape
        u = rho_upsample
        rho = jax.image.resize(rho, (hs * u, ws * u, nc), method="linear")
        Su = S // u

    # ---- fine placement + march (rho shared per Su x Su block; each ray
    # keeps its own t bins). The CDF inversion runs once per decision BLOCK
    # in normalized ray coordinates s in [0,1] (bins are uniform in s), then
    # maps affinely onto each ray's [t0, t1] — an Su^2 saving on the one-hot
    # contraction, exact by construction.
    # Importance-consistent per-sample dt (expected local spacing): realized
    # neighbor spacing bleeds skipped-gap widths into content-run edges and
    # costs ~9x composited MSE at equal budget on sparse scenes.
    s_bins = jnp.broadcast_to(kk, rho.shape[:-1] + kk.shape)
    span = (t1 - t0)[..., None]

    def _sample_block(u_blk):
        """Inverse-CDF placement for one block of the stratified u train
        (shared per S x S probe block), mapped onto each ray's [t0, t1]."""
        s_f, ds_f = inverse_cdf_sample_mm(s_bins, rho, u_blk,
                                          return_bin_dt=True,
                                          n_total=n_fine)  # (h, w, |blk|)
        if Su > 1:
            s_f = jnp.repeat(jnp.repeat(s_f, Su, axis=0), Su,
                             axis=1)[:h_out, :w_out]
            ds_f = jnp.repeat(jnp.repeat(ds_f, Su, axis=0), Su,
                              axis=1)[:h_out, :w_out]
        else:
            s_f = s_f[:h_out, :w_out]
            ds_f = ds_f[:h_out, :w_out]
        return t0[..., None] + s_f * span, ds_f * span

    if block is not None and block < n_fine:
        # Memory-bounded fine march: scan over u blocks (ascending u ->
        # ascending s -> front-to-back), folding each block's composite
        # with the associative over-operator — exact, peak memory
        # O(H * W * block). Required at protocol scale (1080p).
        nb = -(-n_fine // block)

        def bodyf(carry, bi):
            C, T = carry
            j = bi * block + jnp.arange(block, dtype=jnp.float32)
            u_blk = (j + 0.5) / n_fine
            in_n = (j < n_fine).astype(jnp.float32)
            t_f, dt_f = _sample_block(jnp.minimum(u_blk, 1.0 - 1e-6))
            pos_f = ro[..., None, :] + t_f[..., None] * rd[..., None, :]
            pidx_f = (pos_f - bmin) / p.voxel_size
            Cb, Tb = _march_composite(
                mixed, pidx_f, dt_f * in_n, p, valid, lod_vol=lod_vol,
                lam=_lam(dt_f) if lod_vol is not None else None)
            return (C + T[..., None] * Cb, T * Tb), None

        C0 = jnp.zeros((h_out, w_out, 3), jnp.float32)
        T0 = jnp.ones((h_out, w_out), jnp.float32)
        (C, T), _ = jax.lax.scan(bodyf, (C0, T0),
                                 jnp.arange(nb, dtype=jnp.float32))
    else:
        u = (jnp.arange(n_fine, dtype=jnp.float32) + 0.5) / n_fine
        t_f, dt_f = _sample_block(u)
        pos_f = ro[..., None, :] + t_f[..., None] * rd[..., None, :]
        pidx_f = (pos_f - bmin) / p.voxel_size
        C, T = _march_composite(
            mixed, pidx_f, dt_f, p, valid, lod_vol=lod_vol,
            lam=_lam(dt_f) if lod_vol is not None else None)

    # ---- stats: useful samples = fine samples in live segments.
    valid_c = valid[::S, ::S] if S > 1 else valid
    mass = rho_c * ((t1_c - t0_c)[..., None] / n_coarse)
    frac_live = jnp.sum(jnp.where(T_in > 0.01, mass, 0.0), -1) \
        / jnp.maximum(jnp.sum(mass, -1), 1e-9)
    steps = jnp.mean(jnp.where(valid_c,
                               frac_live * n_fine + n_coarse / (S * S), 0.0))
    stats = {"steps_per_ray": steps,
             "mean_scale": jnp.mean(dt_scale),
             "mean_skip": jnp.mean(skip),
             "expected_steps": jnp.mean(jnp.sum(mass, -1) / p.step_size)}
    return C + p.bg_color[None, None, :] * T[..., None], stats


# --------------------------------------------------------------- foveated mode
def roi_world_corners(P_vol, B_vol, p: BratsRenderParams,
                      thresh: float = 0.3) -> np.ndarray:
    """Host-side, once per scene: world-space corner points (8, 3) of the
    ROI bounding box (tumor probability or boundary proximity above
    ``thresh``), padded by one voxel. Camera-independent — the foveated
    renderer projects these per frame to place its full-resolution inset."""
    m = (np.asarray(P_vol) > thresh) | (np.asarray(B_vol) > thresh)
    dims = np.array(m.shape, np.float32)
    if m.any():
        idx = np.nonzero(m)
        lo = np.array([i.min() for i in idx], np.float32) - 1.0
        hi = np.array([i.max() for i in idx], np.float32) + 2.0
    else:
        lo = np.zeros(3, np.float32)
        hi = dims
    vmin = np.asarray(p.vol_min, np.float32)
    vox = np.asarray(p.voxel_size, np.float32)
    corners = np.array([[lo[0], lo[1], lo[2]], [lo[0], lo[1], hi[2]],
                        [lo[0], hi[1], lo[2]], [lo[0], hi[1], hi[2]],
                        [hi[0], lo[1], lo[2]], [hi[0], lo[1], hi[2]],
                        [hi[0], hi[1], lo[2]], [hi[0], hi[1], hi[2]]],
                       np.float32)
    return vmin[None, :] + vox[None, :] * corners


def _project_to_pixels(basis: CameraBasis, pts: jnp.ndarray,
                       width: int, height: int):
    """World points (N, 3) -> pixel coordinates (N, 2) = (px, py), the
    exact inverse of ``camera_rays``'s pinhole: a point projects to the
    pixel whose ray passes through it."""
    v = pts - basis.eye[None, :]
    x = v @ basis.right
    y = v @ basis.up
    z = jnp.maximum(v @ basis.forward, 1e-3)  # behind-eye guard
    f = 1.0 / jnp.tan(0.5 * basis.fov_y)
    aspect = width / max(1.0, float(height))
    u_ndc = (x / z) * f / aspect
    v_ndc = -(y / z) * f
    px = (u_ndc + 1.0) * 0.5 * width
    py = (v_ndc + 1.0) * 0.5 * height
    return px, py


def foveation_rect(width: int, height: int, rect_frac: float = 0.5,
                   probe_stride: int = 1) -> Tuple[int, int]:
    """Static inset size: ``rect_frac`` of each frame axis, rounded to a
    multiple of 2 x probe_stride (the probe grid and the half-res
    background both need even alignment)."""
    q = 2 * max(1, probe_stride)
    rw = max(q, int(width * rect_frac) // q * q)
    rh = max(q, int(height * rect_frac) // q * q)
    return rw, rh


@functools.partial(jax.jit,
                   static_argnames=("width", "height", "n_coarse", "n_fine",
                                    "nf_bg", "cfg", "probe_stride", "block",
                                    "rho_upsample", "rect_frac", "feather"))
def render_policy_foveated(policy, mixed: jnp.ndarray,
                           feat_rows: jnp.ndarray, basis_vec: jnp.ndarray,
                           p: BratsRenderParams, width: int, height: int,
                           roi_corners, n_coarse: int = 32,
                           n_fine: int = 64, nf_bg: Optional[int] = None,
                           cfg: PolicyConfig = PolicyConfig(),
                           probe_stride: int = 1,
                           block: Optional[int] = None, lod_vol=None,
                           rho_upsample: int = 1, rect_frac: float = 0.5,
                           feather: int = 16,
                           ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Foveated policy render: the full frame at HALF resolution (bilinear
    upsample) plus the projected-ROI rectangle at FULL resolution,
    feather-blended over the upsample.

    This is the screen-space half of the methodology's LOD knob
    (Methodology-ROI:43 'level-of-detail selection'): per-ray sample
    redistribution cannot beat ~1/occupancy on DENSE scenes (a tumor case
    fills the head; measured ceiling 0.98-1.2x, docs/ROI_RESULTS.md), but
    the ROI occupies a small screen fraction, so spending full-resolution
    rays only there wins ~(1/4 + rect_frac^2)^-1 on ray count while ROI
    pixels stay bit-identical to the full-resolution policy render
    (window rays reuse the full-frame pinhole math exactly, and the inset
    origin is probe_stride-aligned so the shared probe grid and policy
    decisions land on the same blocks as the full-frame render).

    ``roi_corners``: (8, 3) world ROI bbox corners from
    ``roi_world_corners`` (host, per scene; rides as a jit argument so
    per-frame calls pipeline instead of paying a blocking upload).

    The whole function is ONE jit program (background + inset + blend):
    the glue (projection, feather mask, resize, paste) otherwise runs
    eagerly — dozens of per-frame dispatches and small transfers that the
    tunnel prices at milliseconds, inside the protocol's timed path.
    ``nf_bg``: background fine budget (default = ``n_fine``).
    """
    from mri_raytracer_tpu.render.camera import unpack_basis

    basis = unpack_basis(basis_vec)
    rw, rh = foveation_rect(width, height, rect_frac, probe_stride)
    # Inset origin: projected-ROI bbox center, clamped inside the frame and
    # aligned to max(2, probe_stride) — 2 because the half-res background
    # would split pixels at the seam, probe_stride because the inset's
    # probe/decision grid must coincide with the full-frame render's
    # raster-anchored grid for the bit-exactness guarantee above.
    q = max(2, probe_stride)
    px, py = _project_to_pixels(basis, jnp.asarray(roi_corners, jnp.float32),
                                width, height)
    cx = 0.5 * (jnp.min(px) + jnp.max(px))
    cy = 0.5 * (jnp.min(py) + jnp.max(py))
    x0 = jnp.clip(jnp.round(cx - 0.5 * rw), 0, width - rw)
    y0 = jnp.clip(jnp.round(cy - 0.5 * rh), 0, height - rh)
    x0 = (x0.astype(jnp.int32) // q) * q
    y0 = (y0.astype(jnp.int32) // q) * q

    # Background: the full frame at half resolution, same frustum. The
    # probe stride halves so world-space probe density matches the inset's.
    bg_stride = max(1, probe_stride // 2)
    img_bg, st_bg = render_policy(
        policy, mixed, feat_rows, basis_vec, p, width // 2, height // 2,
        n_coarse, nf_bg or n_fine, cfg, probe_stride=bg_stride,
        block=block, lod_vol=lod_vol,
        rho_upsample=min(rho_upsample, bg_stride) if bg_stride > 1 else 1)
    bg = jax.image.resize(img_bg, (height, width, 3), method="linear")

    # Inset: full-resolution rays for the ROI rect only.
    img_roi, st_roi = render_policy(
        policy, mixed, feat_rows, basis_vec, p, width, height,
        n_coarse, n_fine, cfg, probe_stride=probe_stride, block=block,
        lod_vol=lod_vol, rho_upsample=rho_upsample,
        window_origin=(x0.astype(jnp.float32), y0.astype(jnp.float32)),
        window_size=(rw, rh))

    # Feathered paste (static mask; the ramp hides the resolution seam).
    fy = jnp.minimum(jnp.arange(rh, dtype=jnp.float32),
                     jnp.arange(rh - 1, -1, -1, dtype=jnp.float32))
    fx = jnp.minimum(jnp.arange(rw, dtype=jnp.float32),
                     jnp.arange(rw - 1, -1, -1, dtype=jnp.float32))
    m = jnp.clip(jnp.minimum(fy[:, None], fx[None, :]) / max(1, feather),
                 0.0, 1.0)[..., None]
    patch = jax.lax.dynamic_slice(bg, (y0, x0, 0), (rh, rw, 3))
    out = jax.lax.dynamic_update_slice(bg, patch + m * (img_roi - patch),
                                       (y0, x0, 0))
    stats = {"steps_per_ray":
             0.25 * st_bg["steps_per_ray"]
             + (rw * rh) / (width * height) * st_roi["steps_per_ray"],
             "mean_scale": st_roi["mean_scale"],
             "mean_skip": st_bg["mean_skip"],
             "expected_steps": st_bg["expected_steps"],
             "rect": (x0, y0, rw, rh)}
    return out, stats


# ------------------------------------------------------------------- training
def roi_weight_map(P_img: jnp.ndarray, B_img: jnp.ndarray, beta: float = 4.0,
                   gamma: float = 2.0) -> jnp.ndarray:
    """Per-pixel weights w = 1 + beta*P + gamma*boundary (Methodology:59)."""
    return 1.0 + beta * P_img + gamma * B_img


def project_roi_maps(P, B, basis_vec, p, width: int, height: int,
                     n_steps: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Max-project P/B along rays -> per-pixel ROI maps for weighting."""
    from mri_raytracer_tpu.render.camera import unpack_basis

    basis = unpack_basis(basis_vec)
    dims = jnp.array(P.shape, jnp.float32)
    ro, rd, t0, t1, valid, bmin = _ray_setup(basis, p, dims, width, height)
    k = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps
    t = t0[..., None] + k * (t1 - t0)[..., None]
    pos = ro[..., None, :] + t[..., None] * rd[..., None, :]
    pidx = (pos - bmin) / p.voxel_size
    P_img = jnp.max(trilinear_sample_base(P, pidx), axis=-1)
    B_img = jnp.max(trilinear_sample_base(B, pidx), axis=-1)
    m = valid.astype(jnp.float32)
    return P_img * m, B_img * m


def policy_loss(policy, scene, basis_vec, ref_img, p, width, height,
                n_coarse, n_fine, cfg: PolicyConfig, alpha: float = 0.0,
                w_img: Optional[jnp.ndarray] = None, probe_stride: int = 1,
                lod_vol=None):
    """J = ROI-weighted image MSE + alpha * expected-steps cost
    (Methodology:51). ``scene`` = (mixed, feat_rows)."""
    mixed, feat_rows = scene
    img, stats = render_policy(policy, mixed, feat_rows, basis_vec, p, width,
                               height, n_coarse, n_fine, cfg,
                               probe_stride=probe_stride, lod_vol=lod_vol)
    err = jnp.square(img - ref_img).mean(-1)
    if w_img is not None:
        err = err * w_img / jnp.mean(w_img)
    return jnp.mean(err) + alpha * stats["expected_steps"] / 1000.0, stats


def train_policy(key, scene, views, refs, p, width, height, cfg=PolicyConfig(),
                 n_coarse: int = 32, n_fine: int = 64, steps: int = 200,
                 lr: float = 3e-4, alpha: float = 0.0,
                 weights: Optional[list] = None, probe_stride: int = 1,
                 extra_scenes: Optional[list] = None,
                 val_views: Optional[list] = None,
                 val_refs: Optional[list] = None,
                 val_weights: Optional[list] = None,
                 eval_every: int = 50, patience: int = 5,
                 init=None, lod_vols: Optional[list] = None,
                 val_budgets: Optional[Sequence[int]] = None):
    # NOTE alpha (Methodology:51's sample-cost weight) defaults to 0: under
    # a FIXED fine budget the wall cost is constant and any visible alpha
    # drowns the image term (image MSE at useful quality is ~1e-5-1e-6);
    # speed is swept externally via n_fine instead.
    """AdamW + cosine + clip(1.0) (Methodology:52). ``views``/``refs``/
    ``weights`` are lists of packed camera vectors, reference images and
    optional per-pixel ROI weight maps.

    ``extra_scenes``: list of (scene_tuple, p, views, refs, weights) to
    round-robin alongside the primary scene (Methodology:50 trains on 'a
    small set of volumes (medical + non-medical)' — single-scene training
    overfits the scale head to that scene's statistics).

    Checkpoint selection (Methodology:53 "early stop on validation PSNR;
    choose checkpoint by best ROI-weighted PSNR at target speed"): when
    ``val_views``/``val_refs`` (held-out views of the primary scene) are
    given, validation ROI-wPSNR is evaluated every ``eval_every`` steps
    at the ``val_budgets`` fine budgets (mean across budgets; default
    ``[n_fine // 2, n_fine]`` — "at target speed" means the OPERATING
    budgets where the 1.8x speedup lives, roughly half the tuned
    baseline's, not just the training budget: a checkpoint that trades
    low-budget quality for high-budget quality is a worse operating
    point even if it scores better at n_fine). Training early-stops
    after ``patience`` evaluations without improvement and the
    best-validation checkpoint is returned instead of the final step's.

    Returns ``(policy, losses, selection)`` where ``selection`` records the
    selected step, the validation curve, and whether early stop fired.

    ``init``: warm-start parameters (fine-tuning, e.g. training the LOD
    head on top of a converged base policy). ``lod_vols``: per-task 2x mip
    volumes (primary first, then extra_scenes order) — when given, training
    renders with the LOD blend so the policy's third output receives
    gradient (without it the LOD head is untrained and stays neutral).
    """
    import optax

    policy = init_policy(key, cfg) if init is None else init
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, max(steps // 10, 1),
                                               steps, lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-4))
    opt_state = opt.init(policy)

    @jax.jit
    def update(policy, opt_state, bv, ref, w, sc_mixed, sc_rows, sc_p,
               lod_vol=None):
        loss, g = jax.value_and_grad(
            lambda pol: policy_loss(pol, (sc_mixed, sc_rows), bv, ref, sc_p,
                                    width, height, n_coarse, n_fine, cfg,
                                    alpha, w, probe_stride,
                                    lod_vol=lod_vol)[0])(policy)
        upd, opt_state = opt.update(g, opt_state, policy)
        policy = optax.apply_updates(policy, upd)
        return policy, opt_state, loss

    val_lod = lod_vols[0] if lod_vols else None
    vb = tuple(val_budgets) if val_budgets else (max(8, n_fine // 2), n_fine)

    @functools.partial(jax.jit, static_argnames=("nf",))
    def val_wpsnr_one(policy, bv, ref, w, nf, lod_vol=None):
        img, _ = render_policy(policy, scene[0], scene[1], bv, p, width,
                               height, n_coarse, nf, cfg,
                               probe_stride=probe_stride, lod_vol=lod_vol)
        err = jnp.square(img - ref).mean(-1)
        if w is not None:
            err = err * w / jnp.maximum(jnp.mean(w), 1e-12)
        mse = jnp.maximum(jnp.mean(err), 1e-12)
        return -10.0 * jnp.log10(mse)

    def val_wpsnr(policy):
        ws = val_weights if val_weights is not None else [None] * len(val_views)
        return float(np.mean([float(val_wpsnr_one(policy, v, r, w, nf,
                                                  lod_vol=val_lod))
                              for v, r, w in zip(val_views, val_refs, ws)
                              for nf in vb]))

    tasks = [(scene, p, views, refs, weights)]
    if extra_scenes:
        tasks.extend(extra_scenes)
    lvs = (list(lod_vols) + [None] * (len(tasks) - len(lod_vols))
           if lod_vols else [None] * len(tasks))
    losses = []
    use_val = bool(val_views) and bool(val_refs)
    best_pol, best_q, best_step = policy, -np.inf, 0
    curve, stall, early = [], 0, False
    steps_run = 0
    for s in range(steps):
        sc, sp, vs, rs, ws = tasks[s % len(tasks)]
        i = (s // len(tasks)) % len(vs)
        w = ws[i] if ws is not None else None
        policy, opt_state, loss = update(policy, opt_state, vs[i], rs[i], w,
                                         sc[0], sc[1], sp,
                                         lod_vol=lvs[s % len(tasks)])
        losses.append(float(loss))
        steps_run = s + 1
        if use_val and steps_run % eval_every == 0:
            q = val_wpsnr(policy)
            curve.append([steps_run, q])
            if q > best_q:
                best_pol, best_q, best_step = policy, q, steps_run
                stall = 0
            else:
                stall += 1
            if stall >= patience:
                early = True
                break
    if use_val and best_step > 0:
        policy = best_pol
    selection = {"selected_step": best_step if use_val else steps_run,
                 "best_val_wpsnr": best_q if use_val else None,
                 "val_wpsnr_curve": curve, "early_stopped": early,
                 "steps_run": steps_run, "eval_every": eval_every,
                 "patience": patience, "val_budgets": list(vb)}
    return policy, losses, selection


# --------------------------------------------------------------- persistence
def save_policy(path, policy, cfg: PolicyConfig = PolicyConfig(),
                meta: Optional[Dict] = None) -> None:
    """Export the policy as FP16 weights + JSON meta (Methodology:54: 'Export:
    row-major FP16 weights/biases, dims, activation flags to JSON')."""
    import json
    import pathlib

    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **{k: np.asarray(v, np.float16)
                      for k, v in policy.items()})
    n_out = int(np.asarray(policy["W2"]).shape[-1])
    side = {"dims": [N_FEATURES, cfg.hidden, n_out], "activation": "relu",
            "outputs": ["dt_scale_sigmoid", "skip_sigmoid",
                        "lod_offset_2sigmoid_minus_1"][:n_out],
            "scale_range": [cfg.scale_min, cfg.scale_max],
            "layout": "row_major", "dtype": "float16", **(meta or {})}
    path.with_name(f"{path.stem}_meta.json").write_text(
        json.dumps(side, indent=2))


def load_policy(path) -> Dict[str, jnp.ndarray]:
    with np.load(path) as z:
        return {k: jnp.asarray(z[k], jnp.float32) for k in z.files}
