"""Fused neural-field march: INR evaluated *inside* the renderer.

The reference only ever bakes INR predictions to a label grid and renders
that (mode 1, ``brats_viewer.py:250-310``); evaluating the MLP per sample
inside the march was the stated goal (``docs/Goals.md:33-34``,
``docs/Methodology-ROI...md:40-47``). Here it exists as mode 2 on the
shear-warp sweep: per slice plane, the z-scored modality volumes are
resampled by the same separable matmuls, normalized coordinates come for
free from the plane geometry, and the INR runs as one (O^2, in_dim) MXU
batch per plane — samples arrive pre-batched at MXU-friendly sizes, the
exact remedy SURVEY §7.3 prescribes for tiny-MLP MXU efficiency.

The predicted class per sample feeds the same LUT compositing as the baked
``pred`` overlay (1.5x opacity), so mode 1 and mode 2 agree wherever the
prediction field is locally constant.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from mri_raytracer_tpu.models.api import ModelBundle
from mri_raytracer_tpu.ops import shearwarp as sw
from mri_raytracer_tpu.ops.raymarch_xla import blend_modalities
from mri_raytracer_tpu.render.camera import CameraBasis, unpack_basis
from mri_raytracer_tpu.render.params import BratsRenderParams


def _separable_first_layer(layers, K: int, M: int, pos_an, pos_bn, z_n,
                           inv_order, out_res: int):
    """First MLP layer over a sweep plane as rank-1 broadcasts.

    Per plane, each normalized coordinate is constant along one in-plane
    axis (k: constant, a: rows, b: columns) and the deterministic Fourier
    features are per-axis blocks of the input — so
    ``[coords | ff] @ W1`` decomposes into a row vector + a column vector +
    a constant, each computed on O values instead of O^2 samples. This
    removes ~36 transcendentals and an (in_dim x H) matmul PER SAMPLE
    (70 GFLOP-equivalent + 9G sin/cos per 1024^2 x 257-plane frame — the
    round-1 mode-2 renderer spent ~0.7 s/frame here). Returns
    (row (O,H), col (O,H), const (H,), W1_int (M,H)).
    """
    W1 = layers[0]["W"]
    b1 = layers[0]["b"]
    H = W1.shape[1]

    def axis_feat(t):  # (L,) normalized coord -> (L, 1+2K)
        if K == 0:
            return t[:, None]
        freqs = jnp.arange(1, K + 1, dtype=t.dtype) * math.pi
        ang = t[:, None] * freqs[None]
        return jnp.concatenate([t[:, None], jnp.sin(ang), jnp.cos(ang)], -1)

    def axis_slice(c):  # W1 rows for coordinate c + its ff block
        rows = [W1[c:c + 1]]
        if K > 0:
            rows.append(W1[3 + c * 2 * K: 3 + (c + 1) * 2 * K])
        return jnp.concatenate(rows, 0)  # (1+2K, H)

    row = jnp.zeros((out_res, H), W1.dtype)
    col = jnp.zeros((out_res, H), W1.dtype)
    const = b1
    for c in range(3):
        src = inv_order[c]
        contrib_src = {0: z_n[None], 1: pos_an, 2: pos_bn}[src]
        g = axis_feat(contrib_src) @ axis_slice(c)
        if src == 0:
            const = const + g[0]
        elif src == 1:
            row = row + g
        else:
            col = col + g
    W1_int = W1[3 + (3 * 2 * K if K > 0 else 0):]  # (M, H)
    assert W1_int.shape[0] == M, (W1_int.shape, M)
    return row, col, const, W1_int


def _mlp_tail(layers, h):
    """Hidden layers 2..n + head, bf16 matmuls with f32 accumulation."""
    for layer in layers[1:-1]:
        h = jax.nn.relu(
            jnp.dot(h.astype(jnp.bfloat16), layer["W"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + layer["b"])
    last = layers[-1]
    return jnp.dot(h.astype(jnp.bfloat16), last["W"].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + last["b"]


@functools.partial(jax.jit, static_argnames=("model", "axis", "width",
                                             "height", "out_res", "has_seg",
                                             "pred_stride"))
def _render_neural_axis(mods_disp, mods_z, seg, params, basis_vec, p,
                        model: ModelBundle, axis: int, width: int,
                        height: int, out_res: int, has_seg: bool,
                        pred_stride: int = 1):
    basis = unpack_basis(basis_vec)
    M = mods_disp.shape[0]
    mixed = blend_modalities(mods_disp, p.vol_enabled[:M], p.vol_weight[:M])
    mixed_s = sw._perm_volume(mixed, axis)
    modsz_s = jnp.stack([sw._perm_volume(mods_z[m], axis) for m in range(M)])
    seg_s = sw._perm_volume(seg, axis) if has_seg else None
    Nk, Na, Nb = mixed_s.shape
    geom = sw.sweep_geometry(basis, p, mixed_s.shape, axis, out_res)
    bmin = sw._permute3(p.vol_min, axis)
    vox = sw._permute3(p.voxel_size, axis)
    dims_perm = jnp.array([Nk, Na, Nb], jnp.float32)
    # Map permuted index coords back to the volume's (x, y, z) order for the
    # INR's normalized-coordinate convention (index/(dim-1)*2-1, reference
    # ``sample_batch``): inverse permutation of (k, a, b).
    inv_order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (1, 2, 0)}[axis]

    n_planes = Nk + 1
    near_t = jnp.maximum(p.near, 0.0)
    big = jnp.float32(3e38)
    far_t = jnp.where(p.far > 0.0, p.far, big)
    dt = geom.dt_map
    show_pred = jnp.where(p.show_pred > 0, 1.0, 0.0)
    show_seg = jnp.where(p.show_seg > 0, 1.0, 0.0)

    ii = jnp.arange(out_res, dtype=jnp.float32)
    # Separable fast path: plain MLP with deterministic Fourier features
    # (the reference's default architecture). Other models use the generic
    # per-sample apply.
    separable = (model.cfg.kind == "mlp" and not model.cfg.aniso_features
                 and model.cfg.rff_dim == 0 and model.cfg.use_modalities)
    K = model.cfg.fourier_freqs
    dims_xyz_s = jnp.stack([dims_perm[inv_order[0]], dims_perm[inv_order[1]],
                            dims_perm[inv_order[2]]])

    def body(carry, m):
        C, T = carry
        mm = jnp.where(geom.flip, n_planes - 1 - m, m)
        z = mm.astype(jnp.float32)
        zq = jnp.clip(z, 0.0, Nk - 1.001)
        z0 = jnp.floor(zq).astype(jnp.int32)
        fz = zq - z0.astype(jnp.float32)
        z1 = jnp.minimum(z0 + 1, Nk - 1)

        w_k = bmin[0] + z * vox[0]
        off_a, sc_a, lam = sw._inplane_affine(geom, 0, bmin[1], vox[1], w_k)
        off_b, sc_b, _ = sw._inplane_affine(geom, 1, bmin[2], vox[2], w_k)
        Wa, mask_a = sw.hat_matrix(off_a, sc_a, Na, out_res)
        Wb, mask_b = sw.hat_matrix(off_b, sc_b, Nb, out_res)

        def _resample_with(vol_s, Wa_, Wb_):
            sl = ((1.0 - fz) * jax.lax.dynamic_index_in_dim(vol_s, z0, 0, False)
                  + fz * jax.lax.dynamic_index_in_dim(vol_s, z1, 0, False))
            t1_ = jnp.dot(Wa_.astype(jnp.bfloat16), sl.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return jnp.dot(t1_.astype(jnp.bfloat16), Wb_.T.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        def resample(vol_s):
            return _resample_with(vol_s, Wa, Wb)

        if pred_stride > 1:
            # Stride-S grid: pos(iS) = off + i * (S * sc).
            Wa_p, _ = sw.hat_matrix(off_a, sc_a * pred_stride, Na,
                                    out_res // pred_stride)
            Wb_p, _ = sw.hat_matrix(off_b, sc_b * pred_stride, Nb,
                                    out_res // pred_stride)
        else:
            Wa_p, Wb_p = None, None

        def resample_p(vol_s):
            if pred_stride == 1:
                return resample(vol_s)
            return _resample_with(vol_s, Wa_p, Wb_p)

        v = resample(mixed_s)
        inplane = mask_a[:, None] * mask_b[None, :]
        t_k = lam * geom.vmag
        active = (inplane > 0.0) & (t_k >= near_t) & (t_k <= far_t) & (T > 0.01)
        act = active.astype(jnp.float32)

        val = sw.transfer_function(v, p.ww, p.wl, p.gamma)
        a = (1.0 - jnp.exp(-val * p.intensity_alpha * dt)) * act
        C, T = sw._composite(C, T, val[..., None], a)

        if has_seg:
            Wan = sw.nearest_matrix(off_a, sc_a, Na, out_res)
            Wbn = sw.nearest_matrix(off_b, sc_b, Nb, out_res)
            zn = jnp.clip(jnp.round(z).astype(jnp.int32), 0, Nk - 1)
            lab = sw._nearest_resample(seg_s, zn, Wan, Wbn)
            rgba = sw._lut_rgba(lab, p.lut)
            aS = (1.0 - jnp.exp(-rgba[..., 3] * dt)) * act * show_seg
            C, T = sw._composite(C, T, rgba[..., :3], aS)

        # --- fused INR evaluation at the crossing positions (mode 2).
        # The prediction feeds a NEAREST-sampled LUT overlay, so it may be
        # evaluated on a stride-S in-plane grid and replicated (pred_stride
        # > 1): quarters the per-plane MLP work at S=2 while the intensity
        # compositing stays full-resolution.
        S = pred_stride
        Op = out_res // S
        iis = ii[::S]
        intens = jnp.stack([resample_p(modsz_s[mi]) for mi in range(M)], -1)
        pos_a = off_a + iis * sc_a  # (Op,) permuted index coords
        pos_b = off_b + iis * sc_b
        if separable:
            # Normalized per-axis coordinates; the (k, a, b) sources map to
            # (const, row, col) contributions of the first layer.
            norm = lambda t, d: (t / (d - 1.0)) * 2.0 - 1.0
            dk, da_, db_ = dims_perm[0], dims_perm[1], dims_perm[2]
            row, col, const, W1_int = _separable_first_layer(
                params, K, M, norm(pos_a, da_), norm(pos_b, db_),
                norm(z, dk), inv_order, Op)
            h = jax.nn.relu(row[:, None, :] + col[None, :, :] + const
                            + jnp.dot(intens.astype(jnp.bfloat16),
                                      W1_int.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)
                            ).astype(jnp.bfloat16)
            logits = _mlp_tail(params, h.reshape(-1, h.shape[-1]))
        else:
            idx_k = jnp.broadcast_to(z, (Op, Op))
            idx_a = jnp.broadcast_to(pos_a[:, None], (Op, Op))
            idx_b = jnp.broadcast_to(pos_b[None, :], (Op, Op))
            perm_idx = (idx_k, idx_a, idx_b)
            xyz = jnp.stack([perm_idx[inv_order[0]], perm_idx[inv_order[1]],
                             perm_idx[inv_order[2]]], axis=-1)
            coords = (xyz / (dims_xyz_s - 1.0)) * 2.0 - 1.0
            logits = model.apply(params, coords.reshape(-1, 3),
                                 intens.reshape(-1, M))
        pred = jnp.argmax(logits, -1).reshape(Op, Op)
        if S > 1:
            pred = jnp.repeat(jnp.repeat(pred, S, axis=0), S, axis=1)
        rgba = sw._lut_rgba(pred.astype(jnp.float32), p.lut)
        aP = (1.0 - jnp.exp(-rgba[..., 3] * dt * 1.5)) * act * show_pred
        C, T = sw._composite(C, T, rgba[..., :3], aP)
        return (C, T), None

    C0 = jnp.zeros((out_res, out_res, 3), jnp.float32)
    T0 = jnp.ones((out_res, out_res), jnp.float32)
    (C, T), _ = jax.lax.scan(body, (C0, T0), jnp.arange(n_planes))
    return sw.warp_to_screen(C, geom, basis, axis, width, height, p.bg_color)


def render_brats_neural(mods_disp: jnp.ndarray, mods_zscore: jnp.ndarray,
                        seg: Optional[jnp.ndarray], model: ModelBundle,
                        params, basis: CameraBasis, p: BratsRenderParams,
                        width: int = 512, height: int = 512,
                        out_res: Optional[int] = None,
                        pred_stride: int = 1) -> jnp.ndarray:
    """Mode-2 render: intensity + GT seg + LIVE INR prediction overlay.

    mods_disp: display-normalized volumes (percentile) for the emission;
    mods_zscore: z-scored volumes matching the INR's training normalization
    (the dual-normalization contract, SURVEY §7.3). ``pred_stride``: evaluate
    the INR on a strided in-plane grid (the overlay is nearest-sampled;
    stride 2 quarters the MLP cost).
    """
    out_res = out_res or max(width, height)
    axis = sw.dominant_axis(basis)
    zeros = jnp.zeros((1, 1, 1), jnp.int32)
    return _render_neural_axis(
        mods_disp, mods_zscore, seg if seg is not None else zeros, params,
        basis.pack() if isinstance(basis, CameraBasis) else basis, p, model,
        axis, width, height, out_res, seg is not None, pred_stride)
