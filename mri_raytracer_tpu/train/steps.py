"""Fully-jitted training steps.

The reference's fastest path (T4, ``scripts/jax_inr_brats.py:557-657``) moves
sampling + grad accumulation + update into one jit with a ``fori_loop``; this
module generalizes it: ``lax.scan`` over micro-batches (keeps the graph
small and rematerialization-friendly), any sampler from ``data/sampling``,
any model from ``models/api``, any loss combo, optional stochastic coordinate
preconditioning (T7) — all on device. Host involvement per step: one RNG key.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mri_raytracer_tpu import losses
from mri_raytracer_tpu.config import LossConfig
from mri_raytracer_tpu.models.api import ModelBundle


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    ce: jnp.ndarray
    dice_per_class: jnp.ndarray
    ce_per_class: jnp.ndarray


def make_loss(model: ModelBundle, loss_cfg: LossConfig,
              tv_patch: int = 24):
    num_classes = model.cfg.num_classes

    def loss_fn(params, batch, rng, tv_batch=None):
        logits = model.apply(params, batch.coords, batch.intensities, rng=rng,
                             train=True, freq_dropout=loss_cfg.freq_dropout)
        total, aux = losses.segmentation_loss(logits, batch.labels, loss_cfg,
                                              num_classes, batch.weights)
        if loss_cfg.tv_weight > 0.0 and tv_batch is not None:
            # Spatial-coherence TV on a predicted probability patch
            # (reference L8): tv_batch carries an in-plane coords/intensity
            # grid of (P, P) voxels.
            tv_coords, tv_intens = tv_batch
            P = int(round(tv_coords.shape[0] ** 0.5))
            tv_logits = model.apply(params, tv_coords, tv_intens)
            probs = jax.nn.softmax(tv_logits, -1).reshape(P, P, num_classes)
            total = total + loss_cfg.tv_weight * losses.tv_loss_slice(probs)
        return total, aux

    return loss_fn


def build_train_step(model: ModelBundle, loss_cfg: LossConfig,
                     optimizer: optax.GradientTransformation,
                     sampler: Callable, accum_steps: int,
                     coord_noise: Optional[Callable] = None,
                     grad_psum_axis: Optional[str] = None):
    """Returns jitted ``step(params, opt_state, key, mods_pool, segs_pool,
    step_idx) -> (params, opt_state, StepMetrics)``.

    ``coord_noise(step_idx) -> sigma`` enables stochastic preconditioning
    (reference T7, ``improved.ipynb §12``: Gaussian coordinate noise with
    annealed sigma). ``grad_psum_axis`` turns the same step into the
    data-parallel shard_map body (gradients psum'd across the mesh axis).
    """
    tv_patch = 24
    loss_fn = make_loss(model, loss_cfg, tv_patch)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def sample_tv_patch(key, mods_pool, segs_pool):
        """(P*P, 3) coords + (P*P, M) intensities of a random axial patch."""
        Pn, M, H, W, D = mods_pool.shape
        P = min(tv_patch, H, W)
        kc, kx, ky, kz = jax.random.split(key, 4)
        ci = jax.random.randint(kc, (), 0, Pn)
        x0 = jax.random.randint(kx, (), 0, max(H - P, 1))
        y0 = jax.random.randint(ky, (), 0, max(W - P, 1))
        z = jax.random.randint(kz, (), 0, D)
        patch = jax.lax.dynamic_slice(mods_pool, (ci, 0, x0, y0, z),
                                      (1, M, P, P, 1))[0, :, :, :, 0]
        intens = jnp.moveaxis(patch, 0, -1).reshape(-1, M)
        xs = (x0 + jnp.arange(P)).astype(jnp.float32)
        ys = (y0 + jnp.arange(P)).astype(jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
        gz = jnp.full_like(gx, z.astype(jnp.float32))
        coords = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
        dims = jnp.array([H - 1, W - 1, D - 1], jnp.float32)
        return (coords / dims) * 2.0 - 1.0, intens

    def one_micro(params, key, mods_pool, segs_pool, boundary_pool, sigma):
        k_samp, k_noise, k_loss = jax.random.split(key, 3)
        batch = sampler(k_samp, mods_pool, segs_pool, params, boundary_pool)
        if coord_noise is not None:
            noise = jax.random.normal(k_noise, batch.coords.shape) * sigma
            batch = batch._replace(coords=batch.coords + noise)
        tv_batch = (sample_tv_patch(jax.random.fold_in(key, 3), mods_pool,
                                    segs_pool)
                    if loss_cfg.tv_weight > 0.0 else None)
        (l, aux), g = grad_fn(params, batch, k_loss, tv_batch)
        return l, aux, g

    def step(params, opt_state, key, mods_pool, segs_pool, step_idx,
             boundary_pool=None):
        sigma = coord_noise(step_idx) if coord_noise is not None else jnp.float32(0.0)
        keys = jax.random.split(key, accum_steps)

        def body(carry, k):
            g_acc, l_acc, aux_acc = carry
            l, aux, g = one_micro(params, k, mods_pool, segs_pool,
                                  boundary_pool, sigma)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, aux)
            return (g_acc, l_acc + l, aux_acc), None

        g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        num_classes = model.cfg.num_classes
        aux0 = {"ce_per_class": jnp.zeros(num_classes),
                "dice_per_class": jnp.zeros(num_classes),
                "ce": jnp.float32(0.0)}
        (g_sum, l_sum, aux_sum), _ = jax.lax.scan(body, (g0, jnp.float32(0.0), aux0), keys)
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda x: x * inv, g_sum)
        metrics = StepMetrics(loss=l_sum * inv, ce=aux_sum["ce"] * inv,
                              dice_per_class=aux_sum["dice_per_class"] * inv,
                              ce_per_class=aux_sum["ce_per_class"] * inv)
        if grad_psum_axis is not None:
            # DP: average grads and metrics across the mesh axis so every
            # shard applies an identical update (replicated out_specs).
            grads = jax.lax.pmean(grads, grad_psum_axis)
            metrics = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, grad_psum_axis), metrics)
        updates, opt_state = optimizer.update(grads, opt_state, params,
                                              value=metrics.loss)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if grad_psum_axis is None:
        return jax.jit(step, donate_argnums=(0, 1))
    return step  # caller wraps in shard_map + jit


def make_coord_noise_schedule(sigma_start: float, sigma_end: float,
                              total_steps: int) -> Optional[Callable]:
    """Linear anneal sigma_start -> sigma_end (reference: 0.3 -> 0.1)."""
    if sigma_start <= 0.0 and sigma_end <= 0.0:
        return None

    def sched(step_idx):
        frac = jnp.clip(step_idx.astype(jnp.float32) / max(total_steps, 1), 0.0, 1.0)
        return sigma_start + (sigma_end - sigma_start) * frac

    return sched


def make_uncertainty_fn(model: ModelBundle, params_ref, n_mc: int = 4,
                        base_key: int = 0):
    """MC-dropout predictive-entropy scorer for the hybrid sampler
    (reference D13, ``improved.ipynb §9``). Closure over current params via
    a mutable cell updated by the engine between steps."""

    def fn(coords, intensities):
        params = params_ref[0]
        keys = jax.random.split(jax.random.PRNGKey(base_key), n_mc)

        def one(k):
            logits = model.apply(params, coords, intensities, rng=k, train=True)
            return jax.nn.softmax(logits, axis=-1)

        probs = jnp.mean(jax.vmap(one)(keys), axis=0)
        return -jnp.sum(probs * jnp.log(probs + 1e-8), axis=-1)

    return fn
