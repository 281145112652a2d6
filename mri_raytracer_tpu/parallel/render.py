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
    assert out_res_ % n_space == 0, "out_res must divide by the space axis"
    cols = out_res_ // n_space

    def make_axis_fn(axis: int):
        def body(mods, seg, pred, basis_vec, p):
            basis = unpack_basis(basis_vec)
            mixed = blend_modalities(mods, p.vol_enabled[: mods.shape[0]],
                                     p.vol_weight[: mods.shape[0]])
            mixed_s = sw._perm_volume(mixed, axis)
            seg_s = sw._perm_volume(seg, axis) if has_seg else None
            pred_s = sw._perm_volume(pred, axis) if has_pred else None
            geom = sw.sweep_geometry(basis, p, mixed_s.shape, axis, out_res_)

            idx = jax.lax.axis_index("space")
            j0 = idx * cols
            geom_stripe = geom._replace(
                b0=geom.b0 + j0.astype(jnp.float32) * geom.db,
                vmag=jax.lax.dynamic_slice_in_dim(geom.vmag, j0, cols, 1),
                dt_map=jax.lax.dynamic_slice_in_dim(geom.dt_map, j0, cols, 1))
            C, T = sw.sweep_composite(mixed_s, seg_s, pred_s, geom_stripe, p,
                                      axis, out_res_, 1, out_cols=cols)
            # Assemble the full intermediate over ICI, warp once per device.
            C_full = jax.lax.all_gather(C, "space", axis=1, tiled=True)
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
