"""INR model family (reference M4-M6, M8).

All models are plain pytrees + pure ``apply`` functions so they compose with
``jit`` / ``grad`` / ``vmap`` / ``shard_map`` without framework wrappers, and
so checkpoints stay drop-in compatible with the reference npz formats
(list-of-{'W','b'} for the MLP, ``l{i}`` dicts for SIREN).

Models:
  * ``init_mlp`` / ``apply_mlp``   — plain ReLU MLP, Glorot-uniform
    (reference ``inr/inr/model.py:26-51``)
  * ``init_siren`` / ``apply_siren`` — sine activations, w0 first-layer scale
    (reference ``neumors_inr_jax.ipynb §14``)
  * ``init_coord_injection_mlp`` / ``apply_coord_injection_mlp`` — re-injects
    coords at hidden layers {1,2,3} and modality intensities at {2}, with
    inverted dropout (reference ``improved.ipynb §7``)
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ plain MLP
def glorot(key, shape: Tuple[int, int]) -> jnp.ndarray:
    fan_in, fan_out = shape
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-limit, maxval=limit)


def init_mlp(key, in_dim: int, hidden_dims: Sequence[int], out_dim: int,
             dtype=jnp.float32):
    """Returns (key, params) — params is a list of {'W','b'} (reference format)."""
    params = []
    dims = [in_dim] + list(hidden_dims) + [out_dim]
    for i in range(len(dims) - 1):
        key, k1 = jax.random.split(key)
        params.append({"W": glorot(k1, (dims[i], dims[i + 1])).astype(dtype),
                       "b": jnp.zeros((dims[i + 1],), dtype)})
    return key, params


def apply_mlp(params, x: jnp.ndarray) -> jnp.ndarray:
    *hidden, last = params
    h = x
    for layer in hidden:
        h = jax.nn.relu(h @ layer["W"] + layer["b"])
    return h @ last["W"] + last["b"]


# --------------------------------------------------------------------- SIREN
def init_siren(key, in_dim: int, hidden_dims: Sequence[int], out_dim: int,
               w0: float = 30.0):
    """SIREN init: U(-1/n, 1/n) first layer, U(-sqrt(6/n)/w0, ...) after."""
    dims = [in_dim] + list(hidden_dims) + [out_dim]
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for i in range(len(dims) - 1):
        key, k1 = jax.random.split(key)
        n = dims[i]
        if i == 0:
            lim = 1.0 / n
        else:
            lim = math.sqrt(6.0 / n) / w0
        params[f"l{i}"] = {
            "W": jax.random.uniform(k1, (dims[i], dims[i + 1]), minval=-lim, maxval=lim),
            "b": jnp.zeros((dims[i + 1],)),
        }
    return key, params


def apply_siren(params, x: jnp.ndarray, w0: float = 30.0) -> jnp.ndarray:
    n = len(params)
    h = x
    for i in range(n - 1):
        l = params[f"l{i}"]
        scale = w0 if i == 0 else 1.0
        h = jnp.sin(scale * (h @ l["W"] + l["b"]))
    l = params[f"l{n - 1}"]
    return h @ l["W"] + l["b"]


# ------------------------------------------------- coordinate-injection MLP
def init_coord_injection_mlp(key, coord_feat_dim: int, modality_dim: int,
                             hidden_dims: Sequence[int], out_dim: int,
                             inject_coords_at: Sequence[int] = (1, 2, 3),
                             inject_mods_at: Sequence[int] = (2,)):
    """Hidden layers re-receive the coordinate features / modalities at the
    configured depths, widening those layers' fan-in."""
    params: List[Dict[str, jnp.ndarray]] = []
    in_dim = coord_feat_dim + modality_dim
    dims_in = []
    prev = in_dim
    for i, h in enumerate(hidden_dims):
        extra = (coord_feat_dim if i in inject_coords_at else 0) + \
                (modality_dim if i in inject_mods_at else 0)
        dims_in.append(prev + extra)
        prev = h
    dims_in.append(prev)  # output layer fan-in
    dims_out = list(hidden_dims) + [out_dim]
    for di, do in zip(dims_in, dims_out):
        key, k1 = jax.random.split(key)
        params.append({"W": glorot(k1, (di, do)), "b": jnp.zeros((do,))})
    meta = {"inject_coords_at": tuple(inject_coords_at),
            "inject_mods_at": tuple(inject_mods_at)}
    return key, params, meta


def apply_coord_injection_mlp(params, coord_feats: jnp.ndarray,
                              modalities: jnp.ndarray, meta: Dict[str, Any],
                              dropout: float = 0.0,
                              rng: Optional[jax.Array] = None,
                              train: bool = False) -> jnp.ndarray:
    """Inverted dropout applied to hidden activations during training."""
    h = jnp.concatenate([coord_feats, modalities], axis=-1)
    n = len(params)
    for i, layer in enumerate(params[:-1]):
        extra = []
        if i in meta["inject_coords_at"] and i > 0:
            extra.append(coord_feats)
        if i in meta["inject_mods_at"] and i > 0:
            extra.append(modalities)
        if extra:
            h = jnp.concatenate([h] + extra, axis=-1)
        h = jax.nn.relu(h @ layer["W"] + layer["b"])
        if train and dropout > 0.0 and rng is not None:
            rng, kd = jax.random.split(rng)
            keep = 1.0 - dropout
            mask = jax.random.bernoulli(kd, keep, h.shape)
            h = jnp.where(mask, h / keep, 0.0)
    last = params[-1]
    return h @ last["W"] + last["b"]


# --------------------------------------------------------- unified front-end
def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
