"""Fully-jitted training steps.

The reference's fastest path (T4, ``scripts/jax_inr_brats.py:557-657``) moves
sampling + grad accumulation + update into one jit with a ``fori_loop``; this
module generalizes it: ``lax.scan`` over micro-batches (keeps the graph
small and rematerialization-friendly), any sampler from ``data/sampling``,
any model from ``models/api``, any loss combo, optional stochastic coordinate
preconditioning (T7) — all on device. Host involvement per step: one RNG key.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mri_raytracer_tpu import losses
from mri_raytracer_tpu.config import LossConfig, OptimConfig
from mri_raytracer_tpu.models.api import ModelBundle


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    ce: jnp.ndarray
    dice_per_class: jnp.ndarray
    ce_per_class: jnp.ndarray


def make_loss(model: ModelBundle, loss_cfg: LossConfig):
    num_classes = model.cfg.num_classes

    def loss_fn(params, batch, rng):
        logits = model.apply(params, batch.coords, batch.intensities, rng=rng,
                             train=True, freq_dropout=loss_cfg.freq_dropout)
        return losses.segmentation_loss(logits, batch.labels, loss_cfg,
                                        num_classes, batch.weights)

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
    loss_fn = make_loss(model, loss_cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_micro(params, key, mods_pool, segs_pool, sigma):
        k_samp, k_noise, k_loss = jax.random.split(key, 3)
        batch = sampler(k_samp, mods_pool, segs_pool)
        if coord_noise is not None:
            noise = jax.random.normal(k_noise, batch.coords.shape) * sigma
            batch = batch._replace(coords=batch.coords + noise)
        (l, aux), g = grad_fn(params, batch, k_loss)
        return l, aux, g

    def step(params, opt_state, key, mods_pool, segs_pool, step_idx):
        sigma = coord_noise(step_idx) if coord_noise is not None else jnp.float32(0.0)
        keys = jax.random.split(key, accum_steps)

        def body(carry, k):
            g_acc, l_acc, aux_acc = carry
            l, aux, g = one_micro(params, k, mods_pool, segs_pool, sigma)
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
