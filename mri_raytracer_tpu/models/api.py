"""Unified model front-end: config -> (init, apply) pair.

Wraps the model family (mlp / siren / coord_injection) and the coordinate
encodings behind one interface so the training engine, the evaluator, the
viewer, and the fused neural-march renderer all drive models identically.

``apply(params, coords, intensities, rng=None, train=False) -> logits``.

Parameter pytrees keep the reference's on-disk formats (list-of-{'W','b'}
for the plain MLP) so checkpoints interoperate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from mri_raytracer_tpu.config import ModelConfig
from mri_raytracer_tpu.models import features, mlp


@dataclass(eq=False)  # identity hash -> usable as a jit static argument
class ModelBundle:
    cfg: ModelConfig
    num_modalities: int
    input_dim: int
    init: Callable[[jax.Array], Any]
    apply: Callable[..., jnp.ndarray]
    # Fixed (non-trainable) RFF projection, if configured.
    rff_B: Optional[jnp.ndarray] = None


def build_model(cfg: ModelConfig, num_modalities: int, coord_dim: int = 3,
                rff_seed: int = 0) -> ModelBundle:
    mod_dim = num_modalities if cfg.use_modalities else 0
    rff_B = None
    if cfg.rff_dim > 0 and not cfg.aniso_features:
        rff_B = features.init_rff(jax.random.PRNGKey(rff_seed), coord_dim,
                                  cfg.rff_dim, cfg.rff_sigma)

    if cfg.aniso_features:
        feat_dim = 2 * cfg.rff_dim if cfg.rff_dim > 0 else 2 * 64
        n_feat = feat_dim // 2
    else:
        feat_dim = features.feature_dim(coord_dim, cfg.fourier_freqs, cfg.rff_dim)
    in_dim = coord_dim + feat_dim + mod_dim

    kind = cfg.kind

    if kind == "mlp":
        if cfg.aniso_features:
            def init(key):
                kb, km = jax.random.split(key)
                B = features.init_anisotropic_features(
                    kb, coord_dim, n_feat, cfg.aniso_sigma, cfg.voxel_spacing)
                _, layers = mlp.init_mlp(km, in_dim, cfg.hidden_dims, cfg.num_classes)
                return {"B": B, "layers": layers}

            def apply(params, coords, intensities, rng=None, train=False, **_kw):
                ff = features.apply_anisotropic_features(coords, params["B"])
                parts = [coords, ff]
                if mod_dim:
                    parts.append(intensities)
                return mlp.apply_mlp(params["layers"], jnp.concatenate(parts, -1))
        else:
            def init(key):
                _, layers = mlp.init_mlp(key, in_dim, cfg.hidden_dims, cfg.num_classes)
                return layers

            def apply(params, coords, intensities, rng=None, train=False,
                      freq_dropout: float = 0.0):
                x = features.build_input(coords, intensities if mod_dim else None,
                                         cfg.fourier_freqs, rff_B)
                if train and freq_dropout > 0.0 and rng is not None and feat_dim > 0:
                    # Fourier-frequency dropout (reference L5,
                    # scripts/jax_inr_brats.py:212-221): zero random FF columns.
                    mask = (jax.random.uniform(rng, (feat_dim,), dtype=x.dtype)
                            > freq_dropout).astype(x.dtype)
                    x = x.at[:, coord_dim:coord_dim + feat_dim].multiply(mask[None, :])
                return mlp.apply_mlp(params, x)

    elif kind == "siren":
        def init(key):
            _, params = mlp.init_siren(key, in_dim, cfg.hidden_dims,
                                       cfg.num_classes, w0=cfg.siren_w0)
            return params

        def apply(params, coords, intensities, rng=None, train=False, **_kw):
            x = features.build_input(coords, intensities if mod_dim else None,
                                     cfg.fourier_freqs, rff_B)
            return mlp.apply_siren(params, x, w0=cfg.siren_w0)

    elif kind == "coord_injection":
        coord_feat_dim = coord_dim + feat_dim
        meta_holder = {}

        def init(key):
            _, layers, meta = mlp.init_coord_injection_mlp(
                key, coord_feat_dim, mod_dim, cfg.hidden_dims, cfg.num_classes)
            meta_holder.update(meta)
            return layers

        def apply(params, coords, intensities, rng=None, train=False, **_kw):
            cf = features.build_input(coords, None, cfg.fourier_freqs, rff_B)
            meta = meta_holder or {"inject_coords_at": (1, 2, 3), "inject_mods_at": (2,)}
            m = intensities if mod_dim else jnp.zeros((coords.shape[0], 0))
            return mlp.apply_coord_injection_mlp(params, cf, m, meta,
                                                 dropout=cfg.dropout, rng=rng,
                                                 train=train)
    else:
        raise ValueError(f"unknown model kind {kind!r}")

    return ModelBundle(cfg=cfg, num_modalities=num_modalities, input_dim=in_dim,
                       init=init, apply=apply, rff_B=rff_B)
