"""Runtime render parameters as a JAX pytree.

The reference packs these into a Slang ``ConstantBuffer<Params>`` dict per
frame (``inr/viewer/brats_viewer.py:409-426``). Here they are arrays inside a
NamedTuple so a jitted ``render`` is compiled once and every interactive
change (sliders, camera) is just new array values — no recompilation
(SURVEY §7.3 'Interactivity').

Defaults mirror the reference viewer (``brats_viewer.py:126-144``):
ww=1, wl=0.5, intensity_alpha=0.4, gamma=1, step=0.05, near=0, far=0 (off),
black background, and the fixed 8-entry class LUT.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# Class LUT (RGBA): 0 transparent, 1 NCR/NET blue, 2 edema green,
# 3 enhancing red (+ a backup copy at 4, like the reference).
DEFAULT_LUT = np.zeros((8, 4), np.float32)
DEFAULT_LUT[1] = [0.0, 0.4, 1.0, 0.9]
DEFAULT_LUT[2] = [0.0, 0.8, 0.0, 0.7]
DEFAULT_LUT[3] = [1.0, 0.1, 0.1, 0.9]
DEFAULT_LUT[4] = [1.0, 0.1, 0.1, 0.9]


class BratsRenderParams(NamedTuple):
    """All leaves are arrays -> traced, not baked into the executable."""

    vol_min: jnp.ndarray  # (3,) world-space box min
    voxel_size: jnp.ndarray  # (3,)
    step_size: jnp.ndarray  # () world-space delta-t
    near: jnp.ndarray  # ()
    far: jnp.ndarray  # () <= 0 disables the far clip
    bg_color: jnp.ndarray  # (3,)
    vol_enabled: jnp.ndarray  # (4,) 0/1
    vol_weight: jnp.ndarray  # (4,)
    ww: jnp.ndarray  # () window width
    wl: jnp.ndarray  # () window level
    intensity_alpha: jnp.ndarray  # ()
    gamma: jnp.ndarray  # ()
    show_seg: jnp.ndarray  # () 0/1
    show_pred: jnp.ndarray  # () 0/1
    lut: jnp.ndarray  # (8, 4) RGBA per label


def default_render_params(vol_dims: Sequence[int],
                          voxel_zooms: Sequence[float] = (1.0, 1.0, 1.0),
                          world_extent: float = 1.8,
                          step_size: float = 0.05,
                          show_seg: bool = True,
                          show_pred: bool = False,
                          vol_enabled: Sequence[float] = (1, 1, 1, 1),
                          vol_weight: Sequence[float] = (1, 1, 1, 1),
                          ww: float = 1.0, wl: float = 0.5,
                          intensity_alpha: float = 0.4, gamma: float = 1.0,
                          near: float = 0.0, far: float = 0.0,
                          bg_color: Sequence[float] = (0.0, 0.0, 0.0),
                          lut: Optional[np.ndarray] = None) -> BratsRenderParams:
    """Centered volume box scaled to ``world_extent`` along the largest axis
    (reference ``brats_viewer.py:206-210``)."""
    dims = np.asarray(vol_dims, np.float32)
    zooms = np.asarray(voxel_zooms, np.float32)
    scale = world_extent / float(dims.max())
    voxel = (zooms * scale).astype(np.float32)
    vol_min = (-0.5 * voxel * dims).astype(np.float32)
    # Leaves stay host-side numpy: per-frame transfer is tiny/async, and the
    # renderer can read static-specialization flags (gamma==1, clip off)
    # without a blocking device->host sync.
    f32 = lambda x: np.asarray(x, np.float32)
    return BratsRenderParams(
        vol_min=f32(vol_min), voxel_size=f32(voxel), step_size=f32(step_size),
        near=f32(near), far=f32(far), bg_color=f32(bg_color),
        vol_enabled=f32(vol_enabled), vol_weight=f32(vol_weight),
        ww=f32(ww), wl=f32(wl), intensity_alpha=f32(intensity_alpha),
        gamma=f32(gamma), show_seg=f32(1.0 if show_seg else 0.0),
        show_pred=f32(1.0 if show_pred else 0.0),
        lut=f32(DEFAULT_LUT if lut is None else lut))


def default_camera_radius(params: BratsRenderParams, vol_dims: Sequence[int]) -> float:
    """Reference fit-view: radius = 0.8 * |voxel_size * dims|."""
    dims = np.asarray(vol_dims, np.float32)
    return float(np.linalg.norm(np.asarray(params.voxel_size) * dims) * 0.8)
