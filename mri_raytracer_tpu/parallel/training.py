"""Data-parallel training over a device mesh.

Replaces the reference's ``pmap`` sketch (``neumors_inr_jax.ipynb §10``:
``shard_batch`` / ``device_put_sharded_batch`` / ``p_train_step``) with
``shard_map`` over a named mesh: params/optimizer state replicated, each
shard runs its own in-graph sampler with a decorrelated RNG key, gradients
and metrics ``pmean`` over the ``data`` axis. Scales to multi-host unchanged
(collectives ride ICI within a slice).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mri_raytracer_tpu.config import LossConfig
from mri_raytracer_tpu.models.api import ModelBundle
from mri_raytracer_tpu.parallel import mesh as mesh_mod
from mri_raytracer_tpu.train import steps


def build_dp_train_step(model: ModelBundle, loss_cfg: LossConfig, optimizer,
                        sampler: Callable, accum_steps: int, data_parallel: int,
                        coord_noise: Optional[Callable] = None,
                        mesh: Optional[Mesh] = None):
    """jitted ``step(params, opt_state, key, mods_pool, segs_pool, step_idx)``
    running ``data_parallel`` shards; inputs/outputs replicated except the
    per-shard RNG derived inside from ``axis_index``."""
    mesh = mesh or mesh_mod.make_mesh(data=data_parallel)
    core = steps.build_train_step(model, loss_cfg, optimizer, sampler,
                                  accum_steps, coord_noise,
                                  grad_psum_axis="data")

    def shard_body(params, opt_state, key, mods_pool, segs_pool, step_idx,
                   boundary_pool=None):
        shard_key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        return core(params, opt_state, shard_key, mods_pool, segs_pool,
                    step_idx, boundary_pool)

    sharded = shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    def call(params, opt_state, key, mods_pool, segs_pool, step_idx,
             boundary_pool=None):
        return sharded(params, opt_state, key, mods_pool, segs_pool, step_idx,
                       boundary_pool)

    return jax.jit(call, donate_argnums=(0, 1))
