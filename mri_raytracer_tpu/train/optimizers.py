"""Optimizer + LR schedule zoo (reference T5, T6).

Mirrors the reference's ``optax.chain(clip_by_global_norm, X)`` construction
with X drawn from {adamw, muon, prodigy, sophia, dadapt_adamw,
schedule_free_adamw, momo_adam, ...} (``jax_inr_training_wandb_improved.py:
397-443``) and its schedule set: warmup-cosine (``inr/inr/train.py:111-117``),
pure cosine (``scripts/jax_inr_brats.py:404-413``), and the two-stage
coarse->refine schedule (``improved.ipynb §11``).
"""

from __future__ import annotations

from typing import Callable, Union

import optax
import optax.contrib as contrib

from mri_raytracer_tpu.config import OptimConfig


def build_schedule(cfg: OptimConfig, total_steps: int) -> Union[float, Callable]:
    if cfg.schedule == "constant":
        return cfg.lr
    if cfg.schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.lr * 0.01,
            peak_value=cfg.lr,
            warmup_steps=min(cfg.warmup_steps, max(1, total_steps // 10)),
            decay_steps=max(total_steps, cfg.warmup_steps + 1),
            end_value=cfg.lr * cfg.end_lr_scale,
        )
    if cfg.schedule == "cosine":
        return optax.cosine_decay_schedule(cfg.lr, max(1, total_steps),
                                           alpha=cfg.end_lr_scale)
    if cfg.schedule == "two_stage":
        # Coarse (higher LR, 40%) then refine (cosine down), both with warmup.
        split = max(1, int(total_steps * 0.4))
        coarse = optax.warmup_cosine_decay_schedule(
            cfg.lr * 0.01, cfg.lr, min(cfg.warmup_steps, split // 2),
            split, end_value=cfg.lr * 0.5)
        refine = optax.cosine_decay_schedule(cfg.lr * 0.5,
                                             max(1, total_steps - split),
                                             alpha=cfg.end_lr_scale)
        return optax.join_schedules([coarse, refine], [split])
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def build_optimizer(cfg: OptimConfig, total_steps: int) -> optax.GradientTransformation:
    sched = build_schedule(cfg, total_steps)
    name = cfg.optimizer.lower()
    if name == "adamw":
        opt = optax.adamw(sched, b1=cfg.b1, b2=cfg.b2, weight_decay=cfg.weight_decay)
    elif name == "adam":
        opt = optax.adam(sched, b1=cfg.b1, b2=cfg.b2)
    elif name == "sgd":
        opt = optax.sgd(sched, momentum=0.9)
    elif name == "lion":
        opt = optax.lion(sched, weight_decay=cfg.weight_decay)
    elif name == "muon":
        # Muon orthogonalizes 2D weight updates; non-2D leaves fall back to
        # adam internally (optax.contrib handles the split).
        opt = contrib.muon(sched)
    elif name == "prodigy":
        opt = contrib.prodigy(learning_rate=1.0, weight_decay=cfg.weight_decay)
    elif name == "dadapt_adamw":
        opt = contrib.dadapt_adamw(learning_rate=1.0)
    elif name == "schedule_free_adamw":
        opt = contrib.schedule_free_adamw(cfg.lr, b1=cfg.b1, weight_decay=cfg.weight_decay)
    elif name == "sophia":
        opt = contrib.sophia(sched)
    elif name == "momo_adam":
        opt = contrib.momo_adam(cfg.lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = [opt]
    if cfg.grad_clip > 0:
        chain.insert(0, optax.clip_by_global_norm(cfg.grad_clip))
    # Uniform extra-args interface: every optimizer accepts ``value=`` at
    # update time (required by momo/momo_adam, ignored by the rest), so the
    # jitted train step has one calling convention.
    return optax.with_extra_args_support(optax.chain(*chain))
