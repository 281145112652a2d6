"""User-facing BraTS volume renderer (reference H1's device side).

Owns the device-resident volumes and a jitted render callable; per frame the
host passes only a camera basis and a params pytree (arrays), so interactive
orbits/slider changes never recompile — the TPU analog of the reference's
per-frame ``kernel.dispatch`` (``inr/viewer/brats_viewer.py:431-442``).

Backends:
  * 'xla'    — the lockstep while-loop marcher (ops/raymarch_xla), exact
               oracle semantics
  * 'pallas' — tiled Pallas TPU kernel (ops/raymarch_pallas), golden-tested
               against the oracle
  * 'auto'   — pallas on TPU, xla elsewhere
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mri_raytracer_tpu.ops import raymarch_xla
from mri_raytracer_tpu.render.camera import CameraBasis, OrbitalCamera
from mri_raytracer_tpu.render.params import BratsRenderParams


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    # The shear-warp sweep is the fast path everywhere; 'xla' (the lockstep
    # gather marcher) remains the oracle for golden tests.
    return "sweep"


class BratsRenderer:
    def __init__(self, mods: jnp.ndarray, seg: Optional[jnp.ndarray] = None,
                 pred: Optional[jnp.ndarray] = None, width: int = 1024,
                 height: int = 1024, max_steps: int = 1024,
                 backend: str = "auto", sweep_res: Optional[int] = None,
                 supersample: int = 1):
        self.sweep_res = sweep_res
        self.supersample = supersample
        self.mods = jnp.asarray(mods, jnp.float32)
        self.seg = None if seg is None else jnp.asarray(seg, jnp.int32)
        self.pred = None if pred is None else jnp.asarray(pred, jnp.int32)
        self.width = int(width)
        self.height = int(height)
        self.max_steps = int(max_steps)
        self.backend = _resolve_backend(backend)
        self._build()

    def _build(self) -> None:
        self._p_cache = (None, None, None, None)
        if self.backend == "sweep":
            from mri_raytracer_tpu.ops import shearwarp

            def call(mods, seg, pred, basis, params):
                # Cache the device copy of params + static flags per params
                # object: an unchanged params pytree costs ZERO per-frame
                # host->device transfers (the camera is one packed (13,)
                # vector), which matters on high-latency device links.
                pid = id(params)
                if self._p_cache[0] != pid:
                    use_gamma = abs(float(np.asarray(params.gamma)) - 1.0) > 1e-12
                    use_clip = (float(np.asarray(params.near)) > 0.0
                                or float(np.asarray(params.far)) > 0.0)
                    self._p_cache = (pid, jax.device_put(params), use_gamma,
                                     use_clip)
                _, p_dev, use_gamma, use_clip = self._p_cache
                return shearwarp.render_brats(
                    mods, seg, pred, basis, p_dev, self.width, self.height,
                    out_res=self.sweep_res, supersample=self.supersample,
                    use_gamma=use_gamma, use_clip=use_clip)
        else:
            fn = raymarch_xla.render_brats

            def call(mods, seg, pred, basis, params):
                return fn(mods, seg, pred, basis, params,
                          self.width, self.height, self.max_steps)

        self._call = call

    def warmup(self, params: BratsRenderParams) -> None:
        """Pre-compile every sweep-axis variant so an interactive orbit never
        hits a compile stall when the dominant axis flips."""
        import math

        from mri_raytracer_tpu.render.camera import OrbitalCamera

        for theta, phi in ((0.0, math.pi / 2), (math.pi / 2, math.pi / 2),
                           (0.0, 0.05)):
            cam = OrbitalCamera(radius=2.0, theta=theta, phi=phi)
            out = self.render(cam.basis(), params)
        jax.block_until_ready(out)

    def set_prediction(self, pred: Optional[np.ndarray]) -> None:
        """Upload an INR prediction volume (reference 'Load INR & Predict')."""
        self.pred = None if pred is None else jnp.asarray(pred, jnp.int32)

    def render(self, basis: CameraBasis, params: BratsRenderParams) -> jnp.ndarray:
        return self._call(self.mods, self.seg, self.pred, basis, params)

    def render_numpy(self, basis: CameraBasis, params: BratsRenderParams) -> np.ndarray:
        return np.asarray(self.render(basis, params))


def orbit_frames(renderer: BratsRenderer, params: BratsRenderParams,
                 camera: OrbitalCamera, n_frames: int = 36,
                 d_theta: float = 0.1745) -> np.ndarray:
    """(N, H, W, 3) turntable orbit — the offline stand-in for the reference's
    60 Hz window loop, and the payload for FPS/PSNR benchmarking."""
    frames = []
    for _ in range(n_frames):
        camera.orbit(d_theta, 0.0)
        frames.append(renderer.render_numpy(camera.basis(), params))
    return np.stack(frames)
