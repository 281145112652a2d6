"""Coordinate encodings (reference M1-M3).

  * deterministic harmonics sin/cos(pi*k*x), k=1..K per axis
    (reference ``inr/inr/model.py:11-18``)
  * random Fourier features sin/cos(2*pi*x@B), B ~ N(0, sigma^2)
    (reference ``scripts/jax_inr_brats.py:105-128``)
  * anisotropic *learnable* features, B ~ N(0, sigma^2)/voxel_spacing,
    trained with the rest of the params (reference ``improved.ipynb §6``)
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def fourier_features(coords: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, dim) -> (B, dim*2k) deterministic harmonics."""
    B, dim = coords.shape
    freqs = jnp.arange(1, k + 1, dtype=coords.dtype)
    ang = coords[..., None] * freqs[None, None, :] * math.pi  # (B, dim, k)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(B, dim * 2 * k)


def init_rff(key, in_dim: int, rff_dim: int, sigma: float) -> jnp.ndarray:
    """Fixed (non-trainable) Gaussian projection matrix (3, F)."""
    return jax.random.normal(key, (in_dim, rff_dim)) * sigma


def rff_features(coords: jnp.ndarray, rff_B: jnp.ndarray) -> jnp.ndarray:
    ang = 2.0 * math.pi * (coords @ rff_B)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def init_anisotropic_features(key, in_dim: int, num_features: int, sigma: float,
                              voxel_spacing: Sequence[float]) -> jnp.ndarray:
    """Trainable projection scaled inversely by per-axis voxel spacing."""
    spacing = jnp.asarray(voxel_spacing, jnp.float32)
    B = jax.random.normal(key, (in_dim, num_features)) * sigma
    return B / spacing[:, None]


def apply_anisotropic_features(coords: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    ang = 2.0 * math.pi * (coords @ B)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def feature_dim(coord_dim: int, fourier_freqs: int, rff_dim: int) -> int:
    if rff_dim > 0:
        return 2 * rff_dim
    return coord_dim * 2 * fourier_freqs


def build_input(coords: jnp.ndarray, intensities: Optional[jnp.ndarray],
                fourier_freqs: int = 0,
                rff_B: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[coords | features(coords) | intensities] concat (reference
    ``build_input``). ``rff_B`` (fixed or trainable) overrides harmonics."""
    parts = [coords]
    if rff_B is not None:
        parts.append(rff_features(coords, rff_B))
    elif fourier_freqs > 0:
        parts.append(fourier_features(coords, fourier_freqs))
    if intensities is not None:
        parts.append(intensities)
    return jnp.concatenate(parts, axis=-1)
