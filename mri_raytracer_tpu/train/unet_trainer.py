"""U-Net epoch trainer (reference T9, ``Final-1.ipynb §6``) + distillation
into an implicit MLP (reference M8/T distillation, ``Final-1.ipynb §11-12``).

Loss parity (L9): combo = CE + class-weighted soft Dice. Per-epoch train/val
hard Dice for classes {1,2,3} (the reference's "Dice gates"), best-checkpoint
save on val mean Dice.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mri_raytracer_tpu import losses
from mri_raytracer_tpu.data import slices as slices_mod
from mri_raytracer_tpu.io import checkpoint as ckpt
from mri_raytracer_tpu.models import unet as unet_mod


def combo_loss(logits, labels, num_classes: int = 4,
               class_weights=(1.0, 2.0, 2.0, 2.0), dice_w: float = 0.5):
    """CE + class-weighted soft Dice over flattened pixels (reference L9)."""
    C = num_classes
    lf = logits.reshape(-1, C)
    yf = labels.reshape(-1)
    y1 = jax.nn.one_hot(yf, C)
    cw = jnp.asarray(class_weights)
    ce = jnp.mean(losses.weighted_ce(lf, y1) * jnp.take(cw, yf))
    probs = jax.nn.softmax(lf, -1)
    dice = losses.soft_dice_per_class(probs, y1)
    return (1 - dice_w) * ce + dice_w * (1.0 - jnp.sum(dice * cw) / jnp.sum(cw))


def hard_dice_classes(pred, true, classes=(1, 2, 3)) -> Dict[int, float]:
    out = {}
    for c in classes:
        p = pred == c
        t = true == c
        denom = int(p.sum()) + int(t.sum())
        out[c] = float((2 * np.logical_and(p, t).sum() + 1e-6) / (denom + 1e-6)) \
            if denom > 0 else float("nan")
    return out


def train_unet(train_cache, val_cache=None, epochs: int = 3,
               batch_size: int = 8, lr: float = 1e-3, base: int = 16,
               num_classes: int = 4, seed: int = 0,
               out_dir: Optional[str] = None, verbose: bool = True):
    """Epoch loop over axial slices; returns dict with model/variables/history."""
    key = jax.random.PRNGKey(seed)
    probe = train_cache.get(0)["mods"]
    in_ch = probe.shape[0]
    H, W = probe.shape[1], probe.shape[2]
    H8, W8 = H + (-H) % 8, W + (-W) % 8
    model, variables = unet_mod.create_unet(key, in_ch, num_classes, base,
                                            (H8, W8))
    tx = optax.adamw(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(variables, opt_state, imgs, labels):
        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, train=True, mutable=["batch_stats"])
            return combo_loss(logits, labels, num_classes), mut

        (l, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        updates, opt_state = tx.update(g, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return {"params": params, "batch_stats": mut["batch_stats"]}, \
            opt_state, l

    @jax.jit
    def predict(variables, imgs):
        logits = model.apply(variables, imgs, train=False)
        return jnp.argmax(logits, -1)

    idx = slices_mod.build_slice_index(train_cache, seed=seed)
    val_idx = (slices_mod.build_slice_index(val_cache, seed=seed)
               if val_cache is not None else [])
    history: List[Dict[str, Any]] = []
    best = {"val_dice": -1.0, "epoch": -1}
    out_path = pathlib.Path(out_dir) if out_dir else None

    for epoch in range(epochs):
        ep_loss, n = 0.0, 0
        gen = slices_mod.slice_batches(train_cache, idx, batch_size,
                                       seed=seed + epoch, epochs=1)
        for imgs, labels in slices_mod.prefetch(gen):
            variables, opt_state, l = train_step(variables, opt_state,
                                                 imgs, labels)
            ep_loss += float(l)
            n += 1
        rec = {"epoch": epoch, "loss": ep_loss / max(n, 1)}

        if val_idx:
            dices = []
            vgen = slices_mod.slice_batches(val_cache, val_idx, batch_size,
                                            seed=0, epochs=1)
            for imgs, labels in vgen:
                pred = np.asarray(predict(variables, imgs))
                d = hard_dice_classes(pred, np.asarray(labels))
                dices.append(np.nanmean(list(d.values())))
            rec["val_dice"] = float(np.nanmean(dices)) if dices else float("nan")
            if rec["val_dice"] > best["val_dice"]:
                best = {"val_dice": rec["val_dice"], "epoch": epoch}
                if out_path:
                    ckpt.save_object(
                        jax.tree_util.tree_map(np.asarray, variables),
                        out_path / "unet_best.npz",
                        info={"epoch": epoch, "val_dice": rec["val_dice"],
                              "base": base, "num_classes": num_classes})
        history.append(rec)
        if verbose:
            print(f"[unet] epoch {epoch}: {rec}")

    return {"model": model, "variables": variables, "history": history,
            "best": best}


# ------------------------------------------------------------- distillation
def collect_voxels(teacher_vol: np.ndarray, n_samples: int, seed: int = 0,
                   fg_bias: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """(coords in [-1,1], labels) sampled from a teacher label volume,
    foreground-biased (reference ``collect_voxels``, Final-1.ipynb §11)."""
    rng = np.random.default_rng(seed)
    H, W, D = teacher_vol.shape
    n_fg = int(n_samples * fg_bias)
    fg = np.argwhere(teacher_vol > 0)
    parts = []
    if len(fg) > 0 and n_fg > 0:
        sel = fg[rng.integers(0, len(fg), n_fg)]
        parts.append(sel)
    n_uni = n_samples - sum(len(p) for p in parts)
    uni = np.stack([rng.integers(0, H, n_uni), rng.integers(0, W, n_uni),
                    rng.integers(0, D, n_uni)], -1)
    parts.append(uni)
    idx = np.concatenate(parts)
    labels = teacher_vol[idx[:, 0], idx[:, 1], idx[:, 2]].astype(np.int32)
    coords = (idx / np.array([H - 1, W - 1, D - 1])) * 2.0 - 1.0
    return coords.astype(np.float32), labels


def distill_to_implicit(teacher_vol: np.ndarray, hidden=(64, 64, 64),
                        steps: int = 500, batch: int = 4096, lr: float = 1e-3,
                        num_classes: int = 4, seed: int = 0):
    """Train a coords-only implicit MLP (x,y,z) -> class logits on teacher
    labels (reference M8: distilled implicit representation)."""
    from mri_raytracer_tpu.config import ModelConfig
    from mri_raytracer_tpu.models.api import build_model

    cfg = ModelConfig(kind="mlp", hidden_dims=tuple(hidden), fourier_freqs=4,
                      num_classes=num_classes, use_modalities=False)
    model = build_model(cfg, num_modalities=0)
    key = jax.random.PRNGKey(seed)
    params = model.init(key)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    coords, labels = collect_voxels(teacher_vol, steps * batch // 4, seed)
    coords_j, labels_j = jnp.asarray(coords), jnp.asarray(labels)

    @jax.jit
    def step(params, opt_state, k):
        sel = jax.random.randint(k, (batch,), 0, coords_j.shape[0])

        def loss_fn(p):
            logits = model.apply(p, coords_j[sel], None)
            y = jax.nn.one_hot(labels_j[sel], num_classes)
            return jnp.mean(losses.weighted_ce(logits, y))

        l, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    hist = []
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, k)
        if i % 50 == 0:
            hist.append(float(l))
    return {"model": model, "params": params, "loss_history": hist}
