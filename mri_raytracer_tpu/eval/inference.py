"""Full-volume / slice INR inference (reference E1, E2, E8).

The reference chunks a host-side meshgrid and ships each chunk to the device
(``inr/inr/model.py:119-141``). Here the whole volume stays on device and a
single jitted ``lax.map`` sweeps padded chunks — one compile, no host
round-trips, MXU-sized batches.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mri_raytracer_tpu.models.api import ModelBundle


def _norm_grid(shape: Tuple[int, int, int]) -> jnp.ndarray:
    """(N, 3) normalized [-1,1] coordinates of every voxel (x-major order,
    matching the reference meshgrid(indexing='ij') flatten)."""
    H, W, D = shape
    xs = jnp.linspace(-1.0, 1.0, H)
    ys = jnp.linspace(-1.0, 1.0, W)
    zs = jnp.linspace(-1.0, 1.0, D)
    g = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    return g.reshape(-1, 3).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("model", "chunk"))
def _predict_labels(model: ModelBundle, params, mods: jnp.ndarray,
                    chunk: int = 131072) -> jnp.ndarray:
    M = mods.shape[0]
    shape = mods.shape[1:]
    N = int(np.prod(shape))
    coords = _norm_grid(shape)
    intens = jnp.moveaxis(mods, 0, -1).reshape(-1, M)
    pad = (-N) % chunk
    coords = jnp.pad(coords, ((0, pad), (0, 0)))
    intens = jnp.pad(intens, ((0, pad), (0, 0)))
    n_chunks = (N + pad) // chunk

    def run(args):
        c, f = args
        return jnp.argmax(model.apply(params, c, f), axis=-1).astype(jnp.int16)

    preds = jax.lax.map(run, (coords.reshape(n_chunks, chunk, 3),
                              intens.reshape(n_chunks, chunk, M)))
    return preds.reshape(-1)[:N].reshape(shape)


def predict_volume(model: ModelBundle, params, case_data, chunk: int = 131072,
                   gaussian_sigma: float = 0.0,
                   exact: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """(pred_vol, seg_true) like the reference ``predict_volume``; optional
    Gaussian pre-filter of modalities (reference E8,
    ``scripts/jax_inr_brats.py:266-270``).

    ``exact=True`` forces the fp32 chunked predictor even for separable
    models: the bf16 separable bake (~12 ms vs ~100 s at 256^3) can flip
    ~0.5% of near-boundary labels, which shifts parity metrics — reference-
    matching evaluations opt into the exact path."""
    mods = np.asarray(case_data["mods"], np.float32)
    seg_true = np.asarray(case_data["seg"])
    if gaussian_sigma > 0.0:
        from scipy.ndimage import gaussian_filter

        mods = np.stack([gaussian_filter(m, sigma=gaussian_sigma) for m in mods])
    from mri_raytracer_tpu.ops.neural_march import (bake_labels,
                                                    model_is_separable)

    if model_is_separable(model) and not exact:
        # All-MXU separable bake: 256^3 in ~12 ms vs ~100 s chunked.
        pred = bake_labels(model, params, jnp.asarray(mods))
    else:
        pred = _predict_labels(model, params, jnp.asarray(mods), chunk=chunk)
    return np.asarray(pred), seg_true


def predict_slice(model: ModelBundle, params, mods: jnp.ndarray, z: int,
                  ) -> np.ndarray:
    """Single axial plane prediction (reference E2)."""
    M, H, W, D = mods.shape
    xs = jnp.linspace(-1.0, 1.0, H)
    ys = jnp.linspace(-1.0, 1.0, W)
    zval = (z / max(D - 1, 1)) * 2.0 - 1.0
    X, Y = jnp.meshgrid(xs, ys, indexing="ij")
    coords = jnp.stack([X.reshape(-1), Y.reshape(-1),
                        jnp.full((H * W,), zval)], axis=-1).astype(jnp.float32)
    intens = jnp.moveaxis(mods[:, :, :, z], 0, -1).reshape(-1, M)
    logits = model.apply(params, coords, intens)
    return np.asarray(jnp.argmax(logits, -1).reshape(H, W))


def evaluate_single_case(model: ModelBundle, params, case_data,
                         num_classes: int = 4, chunk: int = 131072,
                         spacing=(1.0, 1.0, 1.0)):
    """Per-case eval worker (reference E6): all metrics + volumes."""
    from mri_raytracer_tpu.eval import metrics

    pred_vol, true_vol = predict_volume(model, params, case_data, chunk=chunk)
    scores = metrics.dice_score(pred_vol, true_vol, num_classes)
    hd = metrics.hausdorff_distance(pred_vol, true_vol, spacing, num_classes)
    cov = metrics.coverage_dice(pred_vol, true_vol)
    valid = [s for s in scores.values() if not np.isnan(s)]
    return {
        "pred_vol": pred_vol,
        "true_vol": true_vol,
        "class_scores": scores,
        "coverage_dice": cov,
        "mean_dice": float(np.mean(valid)) if valid else 0.0,
        "hausdorff_scores": hd,
    }


def evaluate_cases(model: ModelBundle, params, cases, num_classes: int = 4,
                   chunk: int = 131072, max_workers: int = 4):
    """Thread fan-out over cases + per-class mean/std aggregation
    (reference ``evaluate_inr``, ``inr/inr/train.py:274-336``). Threads
    overlap the host-side metric work (Hausdorff KD-trees) with device
    inference."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        results = list(ex.map(
            lambda cd: evaluate_single_case(model, params, cd, num_classes, chunk),
            cases))

    agg = {}
    for c in range(num_classes):
        vals = [r["class_scores"][c] for r in results
                if not np.isnan(r["class_scores"][c])]
        agg[f"dice_class_{c}"] = (float(np.mean(vals)) if vals else float("nan"),
                                  float(np.std(vals)) if vals else float("nan"))
        hvals = [r["hausdorff_scores"][c] for r in results
                 if not np.isnan(r["hausdorff_scores"][c])]
        agg[f"hd_class_{c}"] = (float(np.mean(hvals)) if hvals else float("nan"),
                                float(np.std(hvals)) if hvals else float("nan"))
    cov = [r["coverage_dice"] for r in results]
    agg["coverage_dice"] = (float(np.mean(cov)), float(np.std(cov)))
    md = [r["mean_dice"] for r in results]
    agg["mean_dice"] = (float(np.mean(md)), float(np.std(md)))
    return results, agg
