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


# --------------------------------------------------- torch .pth interop (C6)
def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a torch ``.pth`` checkpoint into ``{name: np.ndarray}``.

    Accepts the three layouts the reference persists (C6): a raw
    ``state_dict`` (U-Net / distilled MLP, ``Final-1.ipynb §6,§12``), a dict
    wrapping one under ``state_dict``/``model_state_dict``, and nnU-Net's
    ``checkpoint_final.pth`` whose weights live under ``network_weights``
    (``scripts/nnunet_train_export.py:404-410``). Requires the ``[torch]``
    extra."""
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    for key in ("network_weights", "state_dict", "model_state_dict"):
        if isinstance(obj, dict) and isinstance(obj.get(key), dict):
            obj = obj[key]
            break
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: expected a state_dict, got {type(obj)}")
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[str(k)] = v.detach().cpu().numpy()
    if not out:
        raise ValueError(f"{path}: no tensors in checkpoint "
                         f"(keys: {list(obj)[:8]})")
    return out


def torch_mlp_to_pytree(state_dict: Dict[str, np.ndarray]
                        ) -> List[Dict[str, np.ndarray]]:
    """torch ``nn.Linear`` stack -> our list-of-``{'W','b'}`` MLP pytree.

    Imports the reference's distilled implicit MLP teacher
    (``Final-1.ipynb §12``: ``net.{0,2,4}.weight/bias``) — torch Linear
    weights are ``(out, in)``, ours are ``(in, out)``, so each W transposes.
    The result feeds ``models.mlp.apply_mlp`` directly."""
    import re

    layers: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        m = re.match(r"(?:.*\.)?(\d+)\.(weight|bias)$", k)
        if not m:
            continue
        v = np.asarray(v)
        want = 2 if m.group(2) == "weight" else 1
        if v.ndim != want:
            continue
        layers.setdefault(int(m.group(1)), {})[m.group(2)] = v
    idxs = sorted(i for i, d in layers.items() if "weight" in d)
    if not idxs:
        raise ValueError(f"no Linear layers among {list(state_dict)[:8]}")
    out = []
    for i in idxs:
        w = layers[i]["weight"]
        b = layers[i].get("bias", np.zeros(w.shape[0], w.dtype))
        out.append({"W": np.ascontiguousarray(w.T), "b": b})
    return out


# torch module prefix -> flax.linen auto-name in models.unet.UNet2D (call
# order fixes the indices; see Final-1.ipynb §4 for the torch names).
_UNET_BLOCK_MAP = {
    "d1": "DoubleConv_0", "d2": "DoubleConv_1", "d3": "DoubleConv_2",
    "b": "DoubleConv_3", "c3": "DoubleConv_4", "c2": "DoubleConv_5",
    "c1": "DoubleConv_6",
    "u3": "ConvTranspose_0", "u2": "ConvTranspose_1", "u1": "ConvTranspose_2",
    "out": "Conv_0",
}
# inside a torch DoubleConv's nn.Sequential: 0=Conv,1=BN,3=Conv,4=BN
_DC_INNER = {"0": ("Conv_0", "conv"), "1": ("BatchNorm_0", "bn"),
             "3": ("Conv_1", "conv"), "4": ("BatchNorm_1", "bn")}


def torch_unet_to_flax(state_dict: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``UNet2D`` torch ``state_dict`` -> flax ``variables`` for
    ``models.unet.UNet2D`` (M7 teacher reuse, ``Final-1.ipynb §4,§6``).

    Layout conversions: Conv2d ``(out,in,kh,kw)`` -> ``(kh,kw,in,out)``;
    ConvTranspose2d ``(in,out,kh,kw)`` -> ``(kh,kw,in,out)`` with a spatial
    kernel FLIP (torch's transposed conv scatters the kernel as stored;
    ``lax.conv_transpose(transpose_kernel=False)`` correlates, which for the
    2x2/stride-2 upsamplers reverses the intra-block arrangement);
    BatchNorm weight/bias -> scale/bias params, running stats ->
    ``batch_stats``. Verified bit-close against a torch eval-mode forward in
    ``tests/test_torch_interop.py``."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for k, v in state_dict.items():
        parts = k.split(".")
        block = _UNET_BLOCK_MAP.get(parts[0])
        if block is None:
            raise KeyError(f"unexpected UNet2D key {k!r}")
        v = np.asarray(v)
        if block.startswith("DoubleConv"):
            # d1.net.0.weight -> parts = [d1, net, 0, weight]
            inner, kind = _DC_INNER[parts[2]]
            leaf = parts[3]
            if kind == "conv":
                if leaf == "weight":
                    put(params, (block, inner, "kernel"),
                        v.transpose(2, 3, 1, 0))
                else:
                    put(params, (block, inner, "bias"), v)
            else:  # bn
                if leaf == "weight":
                    put(params, (block, inner, "scale"), v)
                elif leaf == "bias":
                    put(params, (block, inner, "bias"), v)
                elif leaf == "running_mean":
                    put(stats, (block, inner, "mean"), v)
                elif leaf == "running_var":
                    put(stats, (block, inner, "var"), v)
                # num_batches_tracked: dropped
        elif block.startswith("ConvTranspose"):
            if parts[1] == "weight":
                put(params, (block, "kernel"),
                    v.transpose(2, 3, 0, 1)[::-1, ::-1].copy())
            else:
                put(params, (block, "bias"), v)
        else:  # 1x1 head Conv_0
            if parts[1] == "weight":
                put(params, (block, "kernel"), v.transpose(2, 3, 1, 0))
            else:
                put(params, (block, "bias"), v)
    return {"params": params, "batch_stats": stats}


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
