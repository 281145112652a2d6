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


def _separable_first_layer_batched(layers, K: int, M: int, pos_an, pos_bn,
                                   z_n, inv_order):
    """Batched-over-planes variant of ``_separable_first_layer``: pos_an
    (B, Oa) / pos_bn (B, Ob) normalized coords and z_n (B,). Returns
    (row (B,Oa,H), col (B,Ob,H), const (B,H), W1_int (M,H))."""
    W1 = layers[0]["W"]
    b1 = layers[0]["b"]
    H = W1.shape[1]
    B = pos_an.shape[0]

    def axis_feat(t):  # (..., L) -> (..., L, 1+2K)
        if K == 0:
            return t[..., None]
        freqs = jnp.arange(1, K + 1, dtype=t.dtype) * math.pi
        ang = t[..., None] * freqs
        return jnp.concatenate([t[..., None], jnp.sin(ang), jnp.cos(ang)], -1)

    def axis_slice(c):
        rows = [W1[c:c + 1]]
        if K > 0:
            rows.append(W1[3 + c * 2 * K: 3 + (c + 1) * 2 * K])
        return jnp.concatenate(rows, 0)  # (1+2K, H)

    row = jnp.zeros((B, pos_an.shape[1], H), W1.dtype)
    col = jnp.zeros((B, pos_bn.shape[1], H), W1.dtype)
    const = jnp.broadcast_to(b1, (B, H))
    for c in range(3):
        src = inv_order[c]
        contrib = {0: z_n[:, None], 1: pos_an, 2: pos_bn}[src]  # (B, O)|(B,1)
        g = axis_feat(contrib) @ axis_slice(c)  # (B, O|1, H)
        if src == 0:
            const = const + g[:, 0]
        elif src == 1:
            row = row + g
        else:
            col = col + g
    W1_int = W1[3 + (3 * 2 * K if K > 0 else 0):]
    assert W1_int.shape[0] == M, (W1_int.shape, M)
    return row, col, const, W1_int


def model_is_separable(model: ModelBundle) -> bool:
    """True when the first layer decomposes per axis (plain MLP over
    [coords | deterministic Fourier features | modalities])."""
    return (model.cfg.kind == "mlp" and not model.cfg.aniso_features
            and model.cfg.rff_dim == 0 and model.cfg.use_modalities)


@functools.partial(jax.jit, static_argnames=("model", "block"))
def bake_labels(model: ModelBundle, params, modsz: jnp.ndarray,
                block: int = 16) -> jnp.ndarray:
    """All-MXU voxel-grid bake: (M, X, Y, Z) z-scored modalities ->
    (X, Y, Z) int32 argmax labels, same convention as
    ``eval.inference._predict_labels`` (coords index/(dim-1)*2-1).

    At voxel positions the intensity features ARE the voxels (no resample)
    and the coordinate features are separable per axis, so the whole bake is
    the separable first layer + bf16 MXU tail over per-X-slice batches —
    ~100x the generic chunked path, which makes bake-on-param-change
    interactive (mode-1 rendering with a LIVE INR: the amortized in-march
    overhead of ``docs/Goals.md:66``). Falls back to the generic path for
    non-separable models.
    """
    if not model_is_separable(model):
        from mri_raytracer_tpu.eval.inference import _predict_labels

        return _predict_labels(model, params, modsz).astype(jnp.int32)
    M, X, Y, Z = modsz.shape
    K = model.cfg.fourier_freqs
    norm = lambda i, d: (i / (d - 1.0)) * 2.0 - 1.0
    ys = norm(jnp.arange(Y, dtype=jnp.float32), jnp.float32(Y))
    zs = norm(jnp.arange(Z, dtype=jnp.float32), jnp.float32(Z))
    xs = norm(jnp.arange(X, dtype=jnp.float32), jnp.float32(X))

    pad = (-X) % block
    n_blocks = (X + pad) // block

    def block_fn(bi):
        idx = jnp.clip(bi * block + jnp.arange(block), 0, X - 1)
        row, col, const, W1_int = _separable_first_layer_batched(
            params, K, M, jnp.broadcast_to(ys, (block, Y)),
            jnp.broadcast_to(zs, (block, Z)), xs[idx], (0, 1, 2))
        intens = jnp.moveaxis(modsz[:, idx], 0, -1)  # (B, Y, Z, M)
        h = jax.nn.relu(row[:, :, None, :] + col[:, None, :, :]
                        + const[:, None, None, :]
                        + jnp.dot(intens.astype(jnp.bfloat16),
                                  W1_int.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
                        ).astype(jnp.bfloat16)
        logits = _mlp_tail(params, h.reshape(-1, h.shape[-1]))
        return jnp.argmax(logits, -1).reshape(block, Y, Z).astype(jnp.int32)

    out = jax.lax.map(block_fn, jnp.arange(n_blocks))
    return out.reshape(-1, Y, Z)[:X]


def predict_field(model: ModelBundle, params, modsz_s: jnp.ndarray,
                  geom, p: BratsRenderParams, axis: int, out_res: int,
                  stride: int, z_offset=None, nk_global: Optional[int] = None,
                  block: int = 16, kstride: int = 1) -> jnp.ndarray:
    """INR labels at strided intermediate positions of the sweep planes.

    Returns (ceil(n_planes / kstride), Op, Op) int32 labels,
    Op = out_res // stride, in SWEEP order (plane m * kstride, flip
    applied) — the payload for the fused Pallas compositing kernel's field
    overlay (``kstride`` > 1: the kernel nearest-upsamples along the sweep,
    plane m reads row m // kstride). All dense MXU work: per plane, the
    z-scored modalities are resampled by the separable hat matmuls at the
    strided grid and the MLP runs as one (B*Op*Op, H) batch per plane block.

    ``modsz_s``: (M, K, Na, Nb) permuted (and possibly content-cropped)
    z-scored modalities; the crop contract matches ``render_prepared``
    (``z_offset``/``nk_global`` + geom's in-plane offsets).
    """
    M, Nk, Na, Nb = modsz_s.shape
    Op = out_res // stride
    assert Op * stride == out_res, (out_res, stride)
    sw_mod = sw
    nk_g = nk_global if nk_global is not None else Nk
    n_all = Nk + 1

    # Shared crop/slab plane-affine contract with the compositing kernel.
    z, z_glob, _, off_a, sc_a, off_b, sc_b = sw.sweep_plane_affines(
        geom, p, axis, n_all, z_offset=z_offset)
    n_planes = -(-n_all // kstride)
    if kstride > 1:
        ms = jnp.minimum(jnp.arange(n_planes) * kstride, n_all - 1)
        z, z_glob = z[ms], z_glob[ms]
        off_a, sc_a, off_b, sc_b = (off_a[ms], sc_a[ms], off_b[ms],
                                    sc_b[ms])
    zi = jnp.clip(z, 0.0, Nk - 1).astype(jnp.int32)

    acl, ach, _, aml, amh = sw_mod._geom_bounds(geom, 0, Na)
    bcl, bch, _, bml, bmh = sw_mod._geom_bounds(geom, 1, Nb)

    # Normalized GLOBAL coordinates (the INR's training convention,
    # index/(dim-1)*2-1) from local positions + crop offsets.
    inv_order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (1, 2, 0)}[axis]
    # Global dims along (k, a, b):
    na_gf = jnp.where(geom.na_g < 0, jnp.float32(Na), geom.na_g)
    nb_gf = jnp.where(geom.nb_g < 0, jnp.float32(Nb), geom.nb_g)
    dims_perm_g = jnp.stack([jnp.float32(nk_g), na_gf, nb_gf])

    separable = model_is_separable(model)
    K = model.cfg.fourier_freqs
    iis = jnp.arange(Op, dtype=jnp.float32) * stride

    pad = (-n_planes) % block
    n_blocks = (n_planes + pad) // block

    def block_fn(bi):
        idx = jnp.clip(bi * block + jnp.arange(block), 0, n_planes - 1)
        oa, sa = off_a[idx], sc_a[idx]
        ob, sb = off_b[idx], sc_b[idx]
        Wa, _ = sw_mod._batched_hat(oa, sa * stride, Na, Op, acl, ach,
                                    aml, amh)
        Wb, _ = sw_mod._batched_hat(ob, sb * stride, Nb, Op, bcl, bch,
                                    bml, bmh)
        sl = modsz_s[:, zi[idx]]  # (M, B, Na, Nb)
        t1 = jnp.einsum("boa,mban->mbon", Wa.astype(jnp.bfloat16),
                        sl.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        v = jnp.einsum("mbon,bpn->mbop", t1.astype(jnp.bfloat16),
                       Wb.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        intens = jnp.moveaxis(v, 0, -1)  # (B, Op, Op, M)

        pos_a_g = oa[:, None] + iis[None, :] * sa[:, None] + geom.a_off
        pos_b_g = ob[:, None] + iis[None, :] * sb[:, None] + geom.b_off
        z_g = z_glob[idx]
        norm = lambda t, d: (t / (d - 1.0)) * 2.0 - 1.0
        if separable:
            row, col, const, W1_int = _separable_first_layer_batched(
                params, K, M, norm(pos_a_g, dims_perm_g[1]),
                norm(pos_b_g, dims_perm_g[2]), norm(z_g, dims_perm_g[0]),
                inv_order)
            h = jax.nn.relu(row[:, :, None, :] + col[:, None, :, :]
                            + const[:, None, None, :]
                            + jnp.dot(intens.astype(jnp.bfloat16),
                                      W1_int.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)
                            ).astype(jnp.bfloat16)
            logits = _mlp_tail(params, h.reshape(-1, h.shape[-1]))
        else:
            idx_k = jnp.broadcast_to(z_g[:, None, None], (block, Op, Op))
            idx_a = jnp.broadcast_to(pos_a_g[:, :, None], (block, Op, Op))
            idx_b = jnp.broadcast_to(pos_b_g[:, None, :], (block, Op, Op))
            perm_idx = (idx_k, idx_a, idx_b)
            xyz = jnp.stack([perm_idx[inv_order[0]], perm_idx[inv_order[1]],
                             perm_idx[inv_order[2]]], axis=-1)
            dims_xyz = jnp.stack([dims_perm_g[inv_order[0]],
                                  dims_perm_g[inv_order[1]],
                                  dims_perm_g[inv_order[2]]])
            coords = (xyz / (dims_xyz - 1.0)) * 2.0 - 1.0
            logits = model.apply(params, coords.reshape(-1, 3),
                                 intens.reshape(-1, M))
        return jnp.argmax(logits, -1).reshape(block, Op, Op).astype(jnp.int32)

    fields = jax.lax.map(block_fn, jnp.arange(n_blocks))
    return fields.reshape(-1, Op, Op)[:n_planes]


@functools.partial(jax.jit, static_argnames=("model", "axis", "width",
                                             "height", "out_res", "has_seg",
                                             "pred_stride", "pred_kstride"))
def _render_neural_axis(mods_disp, mods_z, seg, params, basis_vec, p,
                        model: ModelBundle, axis: int, width: int,
                        height: int, out_res: int, has_seg: bool,
                        pred_stride: int = 1, pred_kstride: int = 1,
                        geom=None, field=None):
    basis = unpack_basis(basis_vec)
    M = mods_disp.shape[0]
    mixed = blend_modalities(mods_disp, p.vol_enabled[:M], p.vol_weight[:M])
    mixed_s = sw._perm_volume(mixed, axis)
    modsz_s = jnp.stack([sw._perm_volume(mods_z[m], axis) for m in range(M)])
    seg_s = sw._perm_volume(seg, axis) if has_seg else None
    Nk, Na, Nb = mixed_s.shape
    if geom is None:
        geom = sw.sweep_geometry(basis, p, mixed_s.shape, axis, out_res,
                                 frustum_wh=(width, height))
    bmin = sw._permute3(p.vol_min, axis)
    vox = sw._permute3(p.voxel_size, axis)

    n_planes = Nk + 1
    near_t = jnp.maximum(p.near, 0.0)
    big = jnp.float32(3e38)
    far_t = jnp.where(p.far > 0.0, p.far, big)
    dt = geom.dt_map
    show_pred = jnp.where(p.show_pred > 0, 1.0, 0.0)
    show_seg = jnp.where(p.show_seg > 0, 1.0, 0.0)
    # First-segment dt correction (see shearwarp.entry_ratio_map).
    qfac = jnp.abs(geom.w_base - geom.e[0]) / jnp.maximum(vox[0], 1e-6)
    r_map = sw.entry_ratio_map(geom, near_t, dt)

    # Mode-2 prediction labels for ALL planes via the SAME all-MXU field
    # pass the fused Pallas path consumes (``predict_field``) — one shared
    # implementation, so scan and fused overlays are bit-identical and any
    # residual scan/kernel difference is pure compositing arithmetic.
    # (Callers may inject a precomputed geom+field — parity tests use this
    # to compare compositors under bit-identical inputs: geometry built in
    # two different jit programs differs at ~1e-5, which is enough to flip
    # argmax labels on near-tie logits.)
    if field is None:
        field = predict_field(model, params, modsz_s, geom, p, axis, out_res,
                              pred_stride, kstride=pred_kstride)

    def body(carry, m):
        C, T, started = carry
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

        sl = ((1.0 - fz) * jax.lax.dynamic_index_in_dim(mixed_s, z0, 0, False)
              + fz * jax.lax.dynamic_index_in_dim(mixed_s, z1, 0, False))
        t1_ = jnp.dot(Wa.astype(jnp.bfloat16), sl.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        v = jnp.dot(t1_.astype(jnp.bfloat16), Wb.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        inplane = mask_a[:, None] * mask_b[None, :]
        t_k = lam * geom.vmag
        g = lam * qfac - r_map
        active = (inplane > 0.0) & (t_k >= near_t) & (t_k <= far_t) \
            & (T > 0.01) & sw.entry_active(g, r_map)
        act = active.astype(jnp.float32)

        scale, started = sw.entry_correction(g, act, started)
        dt_e = dt * scale
        val = sw.transfer_function(v, p.ww, p.wl, p.gamma)
        a = (1.0 - jnp.exp(-val * p.intensity_alpha * dt_e)) * act
        C, T = sw._composite(C, T, val[..., None], a)

        if has_seg:
            Wan = sw.nearest_matrix(off_a, sc_a, Na, out_res)
            Wbn = sw.nearest_matrix(off_b, sc_b, Nb, out_res)
            zn = jnp.clip(jnp.round(z).astype(jnp.int32), 0, Nk - 1)
            lab = sw._nearest_resample(seg_s, zn, Wan, Wbn)
            rgba = sw._lut_rgba(lab, p.lut)
            aS = (1.0 - jnp.exp(-rgba[..., 3] * dt_e)) * act * show_seg
            C, T = sw._composite(C, T, rgba[..., :3], aS)

        # --- mode-2 INR overlay: plane m's precomputed stride-S label
        # field (sweep order matches the scan index m), nearest-replicated
        # to full resolution — exactly the fused kernel's floor(i/S)
        # row/column upsample and, for pred_kstride > 1, its floor(m/K)
        # sweep-row upsample (see ``predict_field``).
        S = pred_stride
        pred = jax.lax.dynamic_index_in_dim(field, m // pred_kstride, 0,
                                            False)
        if S > 1:
            pred = jnp.repeat(jnp.repeat(pred, S, axis=0), S, axis=1)
        rgba = sw._lut_rgba(pred.astype(jnp.float32), p.lut)
        aP = (1.0 - jnp.exp(-rgba[..., 3] * dt_e * 1.5)) * act * show_pred
        C, T = sw._composite(C, T, rgba[..., :3], aP)
        return (C, T, started), None

    C0 = jnp.zeros((out_res, out_res, 3), jnp.float32)
    T0 = jnp.ones((out_res, out_res), jnp.float32)
    S0 = jnp.zeros((out_res, out_res), jnp.float32)
    (C, T, _), _ = jax.lax.scan(body, (C0, T0, S0), jnp.arange(n_planes))
    return sw.warp_to_screen(C, geom, basis, axis, width, height, p.bg_color)


@functools.partial(jax.jit, static_argnames=("model", "axis", "width",
                                             "height", "out_res", "has_seg",
                                             "stride", "use_gamma",
                                             "use_clip", "nk_global",
                                             "inplane_global", "block",
                                             "kstride"))
def _render_neural_fused(mixed_s, modsz_s, seg_s, params, basis_vec, p,
                         model: ModelBundle, axis: int, width: int,
                         height: int, out_res: int, has_seg: bool,
                         stride: int, use_gamma: bool, use_clip: bool,
                         z_offset=None, nk_global=None, ab_offset=None,
                         inplane_global=None, block: int = 16,
                         kstride: int = 1):
    """Mode-2 fast path: strided INR prediction field (all-MXU pass) fed to
    the fused Pallas compositing kernel as a field overlay. Returns the
    INTERMEDIATE image C — the caller warps it to screen through
    ``shearwarp.warp_program`` in a SEPARATE jit program (the Pallas warp
    kernel must not coexist with the fused compositor in one compiled
    program: scripts/diag_flags.py measured 40.66 vs 64.05 dB at the
    diagonal pose from its mere gated presence). Accepts the same crop
    contract as ``shearwarp.render_prepared``."""
    from mri_raytracer_tpu.ops.pallas_composite import sweep_composite_pallas

    basis = unpack_basis(basis_vec)
    geom = sw.content_geometry(basis, p, mixed_s.shape, axis, out_res,
                               width, height, z_offset, nk_global,
                               ab_offset, inplane_global)
    field = predict_field(model, params, modsz_s, geom, p, axis, out_res,
                          stride, z_offset=z_offset, nk_global=nk_global,
                          block=block, kstride=kstride)
    # The kernel streams the field at stride-S width and upsamples rows AND
    # columns in-kernel (floor one-hot matmuls) — no host-side repeat.
    C, T = sweep_composite_pallas(mixed_s, seg_s if has_seg else None, None,
                                  geom, p, axis, out_res, use_gamma,
                                  use_clip, z_offset=z_offset,
                                  nk_global=nk_global,
                                  pred_field=field.astype(jnp.bfloat16),
                                  field_stride=stride,
                                  field_kstride=kstride)
    return C


class NeuralBratsRenderer:
    """Interactive mode-2 renderer: LIVE INR prediction overlay evaluated
    inside the sweep (``docs/Goals.md:33-34``), with the same prepared-volume
    caching and content crop as ``render.brats.BratsRenderer``.

    Backends: 'fused' (TPU: predict_field + Pallas compositing kernel),
    'scan' (portable XLA scan, ``render_brats_neural``), 'rebake'
    (all-MXU ``bake_labels`` re-run lazily on every ``set_params`` and
    rendered as a mode-1 overlay — ~0 per-frame MLP overhead between param
    changes), 'auto'.
    ``crop='content'|'none'``: the content crop is computed from mods|seg —
    INR predictions OUTSIDE that box are not rendered in 'content' mode
    (trained INRs predict background there; use 'none' for strict parity
    with a full-volume bake)."""

    def __init__(self, mods_disp, mods_zscore, seg, model: ModelBundle,
                 params, width: int = 1024, height: int = 1024,
                 pred_stride: int = 4, backend: str = "auto",
                 crop: str = "content", sweep_res: Optional[int] = None,
                 pred_kstride: int = 1):
        import numpy as np

        self.mods = jnp.asarray(mods_disp, jnp.float32)
        self.modsz = jnp.asarray(mods_zscore, jnp.float32)
        self.seg = None if seg is None else jnp.asarray(seg, jnp.int32)
        self.model = model
        self.params = params
        self.width = int(width)
        self.height = int(height)
        self.stride = int(pred_stride)
        self.kstride = int(pred_kstride)
        self.sweep_res = sweep_res
        if backend == "auto":
            backend = "fused" if jax.default_backend() == "tpu" else "scan"
        self.backend = backend
        base_res = int(sweep_res or max(width, height))
        if backend != "rebake" and (base_res % self.stride
                                    or 128 % self.stride):
            # The fused path shrinks out_res to 128-multiples under in-plane
            # crops, so the stride must divide both the base resolution and
            # 128 — checked here so bad combinations fail at construction,
            # not at first render.
            raise ValueError(
                f"pred_stride={pred_stride} must divide sweep resolution "
                f"{base_res} and 128 (use 1, 2, 4 or 8)")
        self._inner = None
        self._dirty = True
        if backend == "rebake":
            from mri_raytracer_tpu.render.brats import BratsRenderer

            # NOTE the inner renderer applies its own content crop (refreshed
            # on every re-bake to include pred content); ``crop='none'`` only
            # affects the fused/scan field paths.
            self._inner = BratsRenderer(mods_disp, seg, None, width=width,
                                        height=height, sweep_res=sweep_res)
        occ = np.array(jnp.any(self.mods != 0.0, axis=0))
        if self.seg is not None:
            occ |= np.asarray(self.seg) != 0
        self._bbox = []
        for ax in range(3):
            proj = np.any(occ, axis=tuple(a for a in range(3) if a != ax))
            nz = np.nonzero(proj)[0]
            self._bbox.append((int(nz[0]), int(nz[-1]) + 1) if len(nz)
                              else (0, int(occ.shape[ax])))
        if crop == "none":
            self._bbox = [(0, int(s)) for s in self.mods.shape[1:]]
        self._prep = {}
        self._flag_cache = (None, None)

    def _flags(self, p):
        """Host-side scalar flags (crop_ok/use_gamma/use_clip), cached on
        param VALUES: float() on a device array blocks on the in-order TPU
        stream — done per frame it serializes every dispatch (measured 30 ms
        per sync at 1024^2)."""
        import numpy as np

        key = (np.asarray(p.wl).tobytes(), np.asarray(p.ww).tobytes(),
               np.asarray(p.gamma).tobytes(), np.asarray(p.near).tobytes(),
               np.asarray(p.far).tobytes())
        if self._flag_cache[0] != key:
            crop_ok = (float(np.asarray(p.wl))
                       >= 0.5 * float(np.asarray(p.ww)))
            use_gamma = abs(float(np.asarray(p.gamma)) - 1.0) > 1e-12
            use_clip = (float(np.asarray(p.near)) > 0.0
                        or float(np.asarray(p.far)) > 0.0)
            self._flag_cache = (key, (crop_ok, use_gamma, use_clip))
        return self._flag_cache[1]

    def set_params(self, params) -> None:
        """Swap INR weights (e.g. every few training steps) — no recompile,
        no prep-cache invalidation (the field is recomputed per frame; the
        'rebake' backend re-bakes lazily at the next render)."""
        self.params = params
        self._dirty = True

    def _prepare(self, axis: int, p):
        from mri_raytracer_tpu.render.brats import BratsRenderer

        crop_ok, _, _ = self._flags(p)
        order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
        dims_perm = [int(self.mods.shape[1 + o]) for o in order]
        if crop_ok:
            crops = [BratsRenderer._crop16(*self._bbox[o], dims_perm[i])
                     for i, o in enumerate(order)]
        else:
            crops = [(0, n) for n in dims_perm]
        import numpy as np

        M = self.mods.shape[0]
        # Blend settings are baked into the prepared volume — key on their
        # VALUES (like BratsRenderer) or a weight change silently reuses the
        # stale mix.
        key = (axis, tuple(crops),
               np.asarray(p.vol_enabled[:M]).tobytes(),
               np.asarray(p.vol_weight[:M]).tobytes())
        if key not in self._prep:
            from mri_raytracer_tpu.ops.raymarch_xla import blend_modalities
            mixed = blend_modalities(self.mods, p.vol_enabled[:M],
                                     p.vol_weight[:M])
            mixed_s = sw._perm_volume(mixed, axis)
            modsz_s = jnp.stack([sw._perm_volume(self.modsz[m], axis)
                                 for m in range(M)])
            seg_s = sw._perm_volume(self.seg, axis) \
                if self.seg is not None else None
            for dim, (lo, hi) in enumerate(crops):
                if (lo, hi) != (0, dims_perm[dim]):
                    mixed_s = jax.lax.slice_in_dim(mixed_s, lo, hi, axis=dim)
                    modsz_s = jax.lax.slice_in_dim(modsz_s, lo, hi,
                                                   axis=dim + 1)
                    if seg_s is not None:
                        seg_s = jax.lax.slice_in_dim(seg_s, lo, hi, axis=dim)
            # Device-resident crop scalars: Python ints re-upload every
            # frame (tiny host->device transfers over the tunnel dominate
            # interactive frame time — see render/brats.py).
            (k_lo, _), (a_lo, _), (b_lo, _) = crops
            devs = (jax.device_put(jnp.float32(k_lo)),
                    (jax.device_put(jnp.float32(a_lo)),
                     jax.device_put(jnp.float32(b_lo))))
            self._prep[key] = (mixed_s, modsz_s, seg_s, crops, dims_perm,
                               devs)
        return self._prep[key]

    def warmup(self, p: BratsRenderParams) -> None:
        """Pre-compile every (sweep axis, warp-window ladder rung) variant of
        the fused path, mirroring ``BratsRenderer.warmup``: the per-frame
        footprint hint switches window variants mid-orbit, and each variant
        is a separate compiled program — without this, the first pose whose
        footprint flips the window stalls the interactive neural path on a
        compile."""
        sw.warmup_window_variants(
            lambda basis, win: self.render(basis, p, _warp_win=win),
            ladder=(self.backend == "fused"
                    and jax.default_backend() == "tpu"))

    def render(self, basis, p: BratsRenderParams,
               _warp_win=None) -> jnp.ndarray:
        basis_vec = basis.pack() if isinstance(basis, CameraBasis) else basis
        axis = sw.dominant_axis(basis)
        if self.backend == "rebake":
            if self._dirty:
                self._inner.set_prediction(
                    bake_labels(self.model, self.params, self.modsz))
                self._dirty = False
            return self._inner.render(basis, p)
        if self.backend != "fused":
            return render_brats_neural(self.mods, self.modsz, self.seg,
                                       self.model, self.params, basis, p,
                                       self.width, self.height,
                                       out_res=self.sweep_res,
                                       pred_stride=self.stride,
                                       pred_kstride=self.kstride)
        mixed_s, modsz_s, seg_s, crops, dims_perm, devs = \
            self._prepare(axis, p)
        (k_lo, k_hi), (a_lo, a_hi), (b_lo, b_hi) = crops
        nk, na_g, nb_g = dims_perm
        base_res = self.sweep_res or max(self.width, self.height)
        out_res, inplane_cropped = sw.crop_out_res(base_res, crops,
                                                   dims_perm)
        assert out_res % self.stride == 0, (out_res, self.stride)
        slab = (k_lo, k_hi) != (0, nk)
        _, use_gamma, use_clip = self._flags(p)
        z_off = devs[0] if slab else None
        ab = devs[1] if inplane_cropped else None
        ipg = (na_g, nb_g) if inplane_cropped else None
        # Plain jit-arg camera: arg transfers pipeline with execution; an
        # explicit device_put blocks ~3.2 ms on the tunnel (see
        # shearwarp.render_prepared).
        C = _render_neural_fused(
            mixed_s, modsz_s, seg_s, self.params, basis_vec, p,
            self.model, axis, self.width, self.height, out_res,
            seg_s is not None, self.stride, use_gamma, use_clip,
            z_offset=z_off, nk_global=nk if slab else None,
            ab_offset=ab, inplane_global=ipg, kstride=self.kstride)
        # Warp in its own program (Pallas kernel coexistence — see
        # _render_neural_fused docstring). Window variant chosen per frame
        # from the host-side analytic footprint bound, with the shared
        # ladder-max-tuple fallback (sw.warp_win_hint_or_max — same rule as
        # render/brats.py, by construction).
        if _warp_win is not None:
            warp_win = _warp_win
        elif isinstance(basis, CameraBasis):
            warp_win = sw.warp_win_hint_or_max(
                basis, p, dims_perm, axis, out_res, self.width,
                self.height, crops)
        else:
            from mri_raytracer_tpu.ops.pallas_warp import WINDOW_LADDER

            warp_win = WINDOW_LADDER[-1]
        return sw.warp_program(C, basis_vec, p, axis, self.width,
                               self.height, out_res,
                               tuple(int(d) for d in mixed_s.shape),
                               z_off, nk if slab else None, ab, ipg,
                               use_pallas=jax.default_backend() == "tpu",
                               win=warp_win)

    def render_numpy(self, basis, p) -> "np.ndarray":
        import numpy as np

        return np.asarray(self.render(basis, p))


def render_brats_neural(mods_disp: jnp.ndarray, mods_zscore: jnp.ndarray,
                        seg: Optional[jnp.ndarray], model: ModelBundle,
                        params, basis: CameraBasis, p: BratsRenderParams,
                        width: int = 512, height: int = 512,
                        out_res: Optional[int] = None,
                        pred_stride: int = 1, pred_kstride: int = 1,
                        geom=None, field=None) -> jnp.ndarray:
    """Mode-2 render: intensity + GT seg + LIVE INR prediction overlay.

    mods_disp: display-normalized volumes (percentile) for the emission;
    mods_zscore: z-scored volumes matching the INR's training normalization
    (the dual-normalization contract, SURVEY §7.3). ``pred_stride``: evaluate
    the INR on a strided in-plane grid (the overlay is nearest-sampled;
    stride 2 quarters the MLP cost). ``pred_kstride``: evaluate every K-th
    sweep plane (nearest-replicated along the sweep) — same semantics as the
    fused Pallas path, so the scan backend certifies the SAME operating
    point off-TPU.
    """
    out_res = out_res or max(width, height)
    axis = sw.dominant_axis(basis)
    zeros = jnp.zeros((1, 1, 1), jnp.int32)
    return _render_neural_axis(
        mods_disp, mods_zscore, seg if seg is not None else zeros, params,
        basis.pack() if isinstance(basis, CameraBasis) else basis, p, model,
        axis, width, height, out_res, seg is not None, pred_stride,
        pred_kstride, geom=geom, field=field)
