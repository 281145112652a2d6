"""Spatially-sharded rendering over the ``space`` mesh axis.

The workload's analog of context parallelism (SURVEY §5): the sweep
intermediate is sharded by columns — each device composites its own stripe
(per-ray work never crosses devices, so the T<=0.01 termination semantics
stay exact), then one ``all_gather`` over ICI assembles the intermediate for
the final warp. Volumes are replicated (a 256^3 case is ~67 MB; sharding the
*rays* is the scalable axis for this renderer, volumes shard only beyond
HBM capacity).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mri_raytracer_tpu.ops import shearwarp as sw
from mri_raytracer_tpu.ops.raymarch_xla import blend_modalities
from mri_raytracer_tpu.render.camera import CameraBasis, unpack_basis


def build_sharded_renderer(mesh: Mesh, vol_dims, width: int, height: int,
                           out_res: Optional[int] = None,
                           has_seg: bool = True, has_pred: bool = False):
    """Returns jitted ``render(mods, seg, pred, basis_vec, p, axis) -> img``
    with the composite sharded over mesh axis 'space'. ``axis`` selects the
    (host-chosen) sweep permutation; pass via functools.partial per frame."""
    out_res_ = out_res or max(width, height)
    n_space = mesh.shape["space"]
    # Pad-and-crop for non-divisible out_res: each device composites
    # ceil(out_res / n) columns; the padded tail columns (clamped geometry,
    # garbage values) are cropped after the all_gather, BEFORE the warp, so
    # they never touch the image. Divisible out_res keeps the exact old
    # path (pad == 0).
    cols = -(-out_res_ // n_space)
    pad = cols * n_space - out_res_

    def make_axis_fn(axis: int):
        def body(mods, seg, pred, basis_vec, p):
            basis = unpack_basis(basis_vec)
            mixed = blend_modalities(mods, p.vol_enabled[: mods.shape[0]],
                                     p.vol_weight[: mods.shape[0]])
            mixed_s = sw._perm_volume(mixed, axis)
            seg_s = sw._perm_volume(seg, axis) if has_seg else None
            pred_s = sw._perm_volume(pred, axis) if has_pred else None
            geom = sw.sweep_geometry(basis, p, mixed_s.shape, axis, out_res_,
                                     frustum_wh=(width, height))

            idx = jax.lax.axis_index("space")
            j0 = idx * cols
            if pad:
                # Edge-pad the per-pixel maps so every device slices a full
                # stripe; padded columns re-render the last real column.
                def padded(m):
                    return jnp.pad(m, ((0, 0), (0, pad)), mode="edge")

                vmag_p = padded(geom.vmag)
                dt_p = padded(geom.dt_map)
                te_p = padded(geom.t_entry)
            else:
                vmag_p, dt_p, te_p = geom.vmag, geom.dt_map, geom.t_entry
            geom_stripe = geom._replace(
                b0=geom.b0 + j0.astype(jnp.float32) * geom.db,
                vmag=jax.lax.dynamic_slice_in_dim(vmag_p, j0, cols, 1),
                dt_map=jax.lax.dynamic_slice_in_dim(dt_p, j0, cols, 1),
                t_entry=jax.lax.dynamic_slice_in_dim(te_p, j0, cols, 1))
            C, T = sw.sweep_composite(mixed_s, seg_s, pred_s, geom_stripe, p,
                                      axis, out_res_, 1, out_cols=cols)
            # Assemble the full intermediate over ICI, crop the padded tail,
            # warp once per device.
            C_full = jax.lax.all_gather(C, "space", axis=1, tiled=True)
            if pad:
                C_full = C_full[:, :out_res_]
            return sw.warp_to_screen(C_full, geom, basis, axis, width, height,
                                     p.bg_color)

        zeros = jnp.zeros((1, 1, 1), jnp.int32)

        sharded = shard_map(body, mesh=mesh,
                            in_specs=(P(), P(), P(), P(), P()),
                            out_specs=P(), check_vma=False)

        @jax.jit
        def render(mods, seg, pred, basis_vec, p):
            return sharded(mods,
                           seg if has_seg else zeros,
                           pred if has_pred else zeros, basis_vec, p)

        return render

    fns = {a: make_axis_fn(a) for a in (0, 1, 2)}

    def render(mods, seg, pred, basis, p):
        vec = basis.pack() if isinstance(basis, CameraBasis) else basis
        axis = sw.dominant_axis(vec if not isinstance(basis, CameraBasis)
                                else basis)
        return fns[axis](mods, seg, pred, jnp.asarray(vec), p)

    return render


def build_volume_sharded_renderer(mesh: Mesh, vol_dims, width: int,
                                  height: int, axis: int,
                                  out_res: Optional[int] = None,
                                  has_seg: bool = False):
    """Renderer for volumes larger than one chip's HBM: the volume is
    sharded along the sweep axis over mesh axis 'space'; each device
    composites the planes of ITS slab for every intermediate pixel, then the
    slab results combine with the associative over-operator
    ``(C, T) = (C_a + T_a * C_b, T_a * T_b)`` in sweep order across ICI.

    Exactness: the T<=0.01 early-termination gate needs upstream
    transmittance owned by another device, so slabs composite ungated; the
    combined result equals a single-device ``term_gate=False`` composite to
    float tolerance. ``axis`` is static per renderer: resharding the volume
    follows the dominant axis only when the camera crosses an octant, so
    callers hold one renderer per axis (or accept a reshard).

    Returns jitted ``render(mixed_s, seg_s, basis_vec, p) -> image`` where
    ``mixed_s``/(optional) ``seg_s`` are the PRE-PERMUTED (K, A, B) blended
    volume (k = sweep axis), sharded ``P('space')`` on k.
    """
    out_res_ = out_res or max(width, height)
    n_space = mesh.shape["space"]
    Nk = {0: vol_dims[0], 1: vol_dims[1], 2: vol_dims[2]}[axis] \
        if isinstance(vol_dims, (tuple, list)) else vol_dims
    assert Nk % n_space == 0, "sweep depth must divide by the space axis"
    slab_k = Nk // n_space

    def body(mixed_slab, seg_slab, basis_vec, p):
        basis = unpack_basis(basis_vec)
        geom = sw.sweep_geometry(basis, p, (Nk,) + mixed_slab.shape[1:],
                                 axis, out_res_,
                                 frustum_wh=(width, height))
        d = jax.lax.axis_index("space")
        z_off = (d * slab_k).astype(jnp.float32)
        C, T = sw.sweep_composite(mixed_slab,
                                  seg_slab if has_seg else None, None,
                                  geom, p, axis, out_res_, 1,
                                  z_offset=z_off, nk_global=Nk,
                                  term_gate=False)
        # Fold slabs in sweep order with the associative over-operator.
        Cs = jax.lax.all_gather(C, "space")  # (n, O, O, 3)
        Ts = jax.lax.all_gather(T, "space")  # (n, O, O)
        Cs = jnp.where(geom.flip, jnp.flip(Cs, 0), Cs)
        Ts = jnp.where(geom.flip, jnp.flip(Ts, 0), Ts)
        C_acc, T_acc = Cs[0], Ts[0]
        for i in range(1, n_space):
            C_acc = C_acc + T_acc[..., None] * Cs[i]
            T_acc = T_acc * Ts[i]
        return sw.warp_to_screen(C_acc, geom, basis, axis, width, height,
                                 p.bg_color)

    zeros = jnp.zeros((1, 1, 1), jnp.int32)
    sharded = shard_map(body, mesh=mesh,
                        in_specs=(P("space"), P("space") if has_seg else P(),
                                  P(), P()),
                        out_specs=P(), check_vma=False)

    @jax.jit
    def render(mixed_s, seg_s, basis_vec, p):
        return sharded(mixed_s, seg_s if has_seg else zeros,
                       jnp.asarray(basis_vec), p)

    return render
