"""Segmentation loss zoo (reference L1-L8).

All functions operate on flat voxel batches: ``logits (B, C)``,
``labels (B,) int``. Composition is driven by ``LossConfig`` via
``make_loss_fn`` which returns a pure ``loss(params_logits_fn, batch, key)``
suitable for ``jax.value_and_grad(has_aux=True)``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mri_raytracer_tpu.config import LossConfig


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    return jax.nn.one_hot(labels, num_classes)


def soft_dice_per_class(probs: jnp.ndarray, onehot: jnp.ndarray,
                        eps: float = 1e-6) -> jnp.ndarray:
    """(C,) soft Dice over the batch (reference ``soft_dice_per_class``)."""
    inter = jnp.sum(probs * onehot, axis=0)
    sums = jnp.sum(probs, axis=0) + jnp.sum(onehot, axis=0)
    return (2 * inter + eps) / (sums + eps)


def soft_dice_loss(probs: jnp.ndarray, onehot: jnp.ndarray, eps: float = 1e-6,
                   per_class: bool = False) -> jnp.ndarray:
    """1 - Dice; either class-mean or prevalence-weighted
    (reference ``scripts/jax_inr_brats.py:179-190``)."""
    dice = soft_dice_per_class(probs, onehot, eps)
    if per_class:
        return 1.0 - jnp.mean(dice)
    w = jnp.sum(onehot, axis=0)
    w = w / (jnp.sum(w) + eps)
    return 1.0 - jnp.sum(dice * w)


def weighted_ce(logits: jnp.ndarray, onehot: jnp.ndarray,
                sample_w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B,) CE, optionally weighted per sample."""
    ce = -jnp.sum(onehot * jax.nn.log_softmax(logits, axis=-1), axis=-1)
    if sample_w is not None:
        ce = ce * sample_w
    return ce


def focal_ce(logits: jnp.ndarray, onehot: jnp.ndarray, gamma: float,
             alpha: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Numerically-stable focal CE (reference ``focal_ce_loss``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    pt = jnp.sum(onehot * jnp.exp(logp), axis=-1)
    mod = jnp.power(1.0 - pt, gamma)
    if alpha is not None:
        mod = mod * jnp.sum(onehot * alpha[None, :], axis=-1)
    return mod * ce


def label_smooth(onehot: jnp.ndarray, eps: float) -> jnp.ndarray:
    C = onehot.shape[-1]
    return onehot * (1.0 - eps) + eps / C


def tversky_index(p: jnp.ndarray, gt: jnp.ndarray, alpha: float, beta: float,
                  eps: float = 1e-6) -> jnp.ndarray:
    """Binary Tversky index; alpha penalizes FP, beta FN."""
    tp = jnp.sum(p * gt)
    fp = jnp.sum(p * (1.0 - gt))
    fn = jnp.sum((1.0 - p) * gt)
    return tp / (tp + alpha * fp + beta * fn + eps)


def unified_focal_loss(logits: jnp.ndarray, onehot: jnp.ndarray,
                       lam: float = 0.5, gamma: float = 0.5,
                       delta: float = 0.6, eps: float = 1e-7) -> jnp.ndarray:
    """Unified Focal Loss = lam * mFTL + (1-lam) * mFL (reference
    ``improved.ipynb §8``), with probability clipping for stability."""
    probs = jnp.clip(jax.nn.softmax(logits, axis=-1), eps, 1.0 - eps)
    # Modified focal Tversky (per class, asymmetry delta, focal gamma)
    tp = jnp.sum(probs * onehot, axis=0)
    fp = jnp.sum(probs * (1.0 - onehot), axis=0)
    fn = jnp.sum((1.0 - probs) * onehot, axis=0)
    ti = (tp + eps) / (tp + delta * fn + (1.0 - delta) * fp + eps)
    mftl = jnp.mean(jnp.power(jnp.clip(1.0 - ti, 0.0, 1.0), gamma))
    # Modified focal CE with asymmetric delta weighting on foreground
    logp = jnp.log(probs)
    ce = -jnp.sum(onehot * logp, axis=-1)
    pt = jnp.sum(onehot * probs, axis=-1)
    is_fg = (jnp.argmax(onehot, axis=-1) > 0).astype(probs.dtype)
    w = jnp.where(is_fg > 0, delta, 1.0 - delta)
    mfl = jnp.mean(w * jnp.power(1.0 - pt, 1.0 - gamma) * ce)
    return lam * mftl + (1.0 - lam) * mfl


def tv_loss_slice(prob_slice: jnp.ndarray) -> jnp.ndarray:
    """Total-variation spatial-coherence loss over a (H, W, C) probability
    slice (reference ``improved.ipynb §8``)."""
    dx = jnp.abs(prob_slice[1:, :, :] - prob_slice[:-1, :, :]).mean()
    dy = jnp.abs(prob_slice[:, 1:, :] - prob_slice[:, :-1, :]).mean()
    return dx + dy


def freq_dropout_mask(key, x: jnp.ndarray, coord_dim: int, ff_dim: int,
                      rate: float) -> jnp.ndarray:
    """Randomly zero Fourier-feature columns of the built input
    (reference ``scripts/jax_inr_brats.py:212-221``)."""
    if rate <= 0.0 or ff_dim <= 0:
        return x
    mask = (jax.random.uniform(key, (ff_dim,), dtype=x.dtype) > rate).astype(x.dtype)
    return x.at[:, coord_dim:coord_dim + ff_dim].multiply(mask[None, :])


def segmentation_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      cfg: LossConfig, num_classes: int,
                      sample_weights: Optional[jnp.ndarray] = None,
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Composite loss per LossConfig; returns (scalar, aux metrics).

    Baseline combo matches reference L1: ``(1-dw)*CE_w + dw*(1-meanDice)``
    with per-class CE/Dice aux (``inr/inr/model.py:57-90``); every optional
    term reproduces one of L2-L8.
    """
    y = one_hot(labels, num_classes)
    y_t = label_smooth(y, cfg.label_smoothing) if cfg.label_smoothing > 0 else y

    if cfg.focal_gamma > 0.0:
        alpha = jnp.asarray(cfg.focal_alpha) if cfg.focal_alpha else None
        ce_vec = focal_ce(logits, y_t, cfg.focal_gamma, alpha)
    else:
        ce_vec = weighted_ce(logits, y_t)
    cw = jnp.asarray(cfg.class_weights)
    w = jnp.take(cw, labels)
    if sample_weights is not None:
        if cfg.boundary_weight > 0.0:
            # sample_weights carry the raw boundary map 1/(1+EDT) in (0, 1];
            # blend so far-from-boundary voxels keep weight ~1 and boundary
            # voxels are boosted up to (1 + boundary_weight) (reference L8).
            w = w * (1.0 + cfg.boundary_weight * sample_weights)
        else:
            w = w * sample_weights
    ce_scalar = jnp.mean(ce_vec * w)

    probs = jax.nn.softmax(logits, axis=-1)
    dice_k = soft_dice_per_class(probs, y)
    if cfg.dice_weight > 0.0:
        dl = soft_dice_loss(probs, y, per_class=cfg.per_class_dice)
        total = (1.0 - cfg.dice_weight) * ce_scalar + cfg.dice_weight * dl
    else:
        total = ce_scalar

    if cfg.unified_focal_weight > 0.0:
        total = total + cfg.unified_focal_weight * unified_focal_loss(
            logits, y, cfg.unified_focal_lambda, cfg.unified_focal_gamma,
            cfg.unified_focal_delta)

    # Edema (class 2) specific regularizers (reference L6).
    if cfg.edema_fp_weight > 0.0:
        gt2 = (labels == 2).astype(probs.dtype)
        total = total + cfg.edema_fp_weight * jnp.mean(probs[:, 2] * (1.0 - gt2))
    if cfg.tversky_weight > 0.0:
        gt2 = (labels == 2).astype(probs.dtype)
        tv = tversky_index(probs[:, 2], gt2, cfg.tversky_alpha, cfg.tversky_beta)
        total = total + cfg.tversky_weight * (1.0 - tv)
    if cfg.edema_logit_reg > 0.0:
        gt2 = (labels == 2).astype(probs.dtype)
        total = total + cfg.edema_logit_reg * jnp.mean(
            jax.nn.softplus(logits[:, 2]) * (1.0 - gt2))

    counts = jnp.sum(y, axis=0)
    ce_mean_k = jnp.sum(ce_vec[:, None] * y, axis=0) / jnp.maximum(counts, 1.0)
    aux = {"ce_per_class": ce_mean_k, "dice_per_class": dice_k, "ce": ce_scalar}
    return total, aux
