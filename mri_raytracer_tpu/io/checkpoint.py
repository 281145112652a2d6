"""Checkpoint formats + loaders (reference C1-C5).

Formats, drop-in compatible with the reference so its checkpoints load here
and vice versa:
  * flat:   ``np.savez_compressed(W_0, b_0, W_1, ...)`` periodic checkpoints
            (``inr/inr/train.py:216-223``)
  * object: 0-d object array under key ``params`` + ``{stem}_info.json``
            sidecar carrying the config (``inr/inr/train.py:371-411``)
  * loader sniffs the format: 'params' object arrays, flat W_i/b_i, or a
    single-key fallback (``inr/inr/model.py:217-301``,
    ``scripts/jax_inr_brats.py:377-397``)

Also: ``inspect_npz`` (the read_npz CLI, reference ``scripts/read_npz.py``)
and an optional orbax-backed async checkpointer for large runs.
"""

from __future__ import annotations

import json
import pathlib
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np


def save_flat(params: List[Dict[str, Any]], path) -> None:
    """Flat {W_i, b_i} npz (list-of-layer-dicts models only)."""
    flat = {}
    for i, layer in enumerate(params):
        flat[f"W_{i}"] = np.asarray(layer["W"])
        flat[f"b_{i}"] = np.asarray(layer["b"])
    pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def save_object(params: Any, path, info: Optional[Dict[str, Any]] = None) -> None:
    """Object-array npz + ``{stem}_info.json`` sidecar."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host = jax.tree_util.tree_map(np.asarray, params)
    arr = np.empty((), dtype=object)
    arr[()] = host
    np.savez_compressed(path, params=arr)
    if info is not None:
        side = path.with_name(f"{path.stem}_info.json")
        side.write_text(json.dumps(info, indent=2, default=str))


def _flat_to_layers(npz) -> List[Dict[str, np.ndarray]]:
    n = 0
    while f"W_{n}" in npz.files:
        n += 1
    if n == 0:
        raise KeyError(f"no W_i keys among {list(npz.files)}")
    return [{"W": npz[f"W_{i}"], "b": npz[f"b_{i}"]} for i in range(n)]


def load_params(npz_path) -> Any:
    """Format-sniffing parameter loader."""
    npz_path = pathlib.Path(npz_path)
    npz = np.load(str(npz_path), allow_pickle=True)
    if "params" in npz.files:
        arr = npz["params"]
        if arr.dtype == object:
            if arr.ndim == 0 or arr.size == 1:
                return arr.item() if arr.ndim == 0 else arr.reshape(-1)[0]
            raise ValueError(f"'params' in {npz_path} is object array {arr.shape}; "
                             "expected a single serialized pytree")
        return arr
    if any(k.startswith("W_") for k in npz.files):
        return _flat_to_layers(npz)
    if len(npz.files) == 1:
        arr = npz[npz.files[0]]
        if arr.dtype == object and (arr.ndim == 0 or arr.size == 1):
            return arr.item() if arr.ndim == 0 else arr.reshape(-1)[0]
        return arr
    raise KeyError(f"cannot interpret checkpoint {npz_path}: keys {list(npz.files)}")


def model_load(npz_path, config_override: Optional[Dict[str, Any]] = None,
               require_sidecar: bool = True) -> Tuple[Any, Dict[str, Any]]:
    """(params, config) from checkpoint + ``{stem}_info.json`` sidecar —
    the reference's ``model_load`` contract (``inr/inr/model.py:217-301``)."""
    npz_path = pathlib.Path(npz_path).expanduser().resolve()
    if not npz_path.is_file():
        raise FileNotFoundError(f"NPZ file not found: {npz_path}")
    params = load_params(npz_path)
    cfg_path = npz_path.with_name(f"{npz_path.stem}_info.json")
    if cfg_path.is_file():
        config = json.loads(cfg_path.read_text())
    elif require_sidecar:
        raise FileNotFoundError(f"Config JSON not found next to NPZ: {cfg_path}")
    else:
        config = {}
    if config_override:
        config = {**config, **config_override}
    return params, config


def check_resume_shapes(params: Any, loaded: Any) -> None:
    """Validate a resume checkpoint against the freshly-initialized pytree
    (reference shape check, ``scripts/jax_inr_brats.py:390-396``)."""
    cur = jax.tree_util.tree_leaves(params)
    new = jax.tree_util.tree_leaves(loaded)
    if len(cur) != len(new):
        raise ValueError(f"resume mismatch: {len(new)} leaves vs expected {len(cur)}")
    for a, b in zip(cur, new):
        if tuple(np.shape(a)) != tuple(np.shape(b)):
            raise ValueError(f"resume shape mismatch: {np.shape(b)} vs {np.shape(a)}")


def inspect_npz(path, indent: int = 0) -> List[str]:
    """Human-readable npz tree dump (reference ``scripts/read_npz.py``)."""
    lines = []

    def walk(obj, name, depth):
        pad = "  " * depth
        if isinstance(obj, np.ndarray) and obj.dtype == object and obj.ndim == 0:
            lines.append(f"{pad}{name}: <object>")
            walk(obj.item(), name + "()", depth + 1)
        elif isinstance(obj, np.ndarray):
            lines.append(f"{pad}{name}: shape={obj.shape} dtype={obj.dtype}")
        elif isinstance(obj, dict):
            lines.append(f"{pad}{name}: dict[{len(obj)}]")
            for k, v in obj.items():
                walk(v, str(k), depth + 1)
        elif isinstance(obj, (list, tuple)):
            lines.append(f"{pad}{name}: {type(obj).__name__}[{len(obj)}]")
            for i, v in enumerate(obj):
                walk(v, f"[{i}]", depth + 1)
        else:
            lines.append(f"{pad}{name}: {type(obj).__name__} = {obj!r}")

    npz = np.load(str(path), allow_pickle=True)
    for key in npz.files:
        walk(npz[key], key, indent)
    return lines


# ------------------------------------------------------------- orbax (async)
def orbax_checkpointer():
    """Optional orbax async checkpointer for large training states."""
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


# ------------------------------------------------- full training-state resume
def save_train_state(path, params: Any, opt_state: Any, key: Any,
                     step: int, info: Optional[Dict[str, Any]] = None) -> None:
    """Exact-resume checkpoint: params + optimizer state + RNG key + step.

    The reference resumes params only (``inr/inr/train.py:162-183``), which
    resets Adam moments and the sampling stream; this format makes resume
    bit-exact. Object-array npz like ``save_object`` (loadable by
    ``load_params`` too — the 'params' key is present and first).
    """
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    def obj(x):
        arr = np.empty((), dtype=object)
        arr[()] = jax.tree_util.tree_map(np.asarray, x)
        return arr

    np.savez_compressed(path, params=obj(params), opt_state=obj(opt_state),
                        rng_key=np.asarray(key), step=np.int64(step))
    if info is not None:
        path.with_name(f"{path.stem}_info.json").write_text(
            json.dumps(info, indent=2, default=str))


def load_train_state(path) -> Dict[str, Any]:
    """Load an exact-resume checkpoint -> dict(params, opt_state, rng_key,
    step). Raises KeyError if ``path`` is a params-only checkpoint."""
    with np.load(path, allow_pickle=True) as z:
        if "opt_state" not in z.files:
            raise KeyError(f"{path} is not a train-state checkpoint "
                           f"(keys: {z.files})")
        return {"params": z["params"][()],
                "opt_state": z["opt_state"][()],
                "rng_key": z["rng_key"],
                "step": int(z["step"])}
