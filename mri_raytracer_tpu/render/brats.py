"""User-facing BraTS volume renderer (reference H1's device side).

Owns the device-resident volumes and a jitted render callable; per frame the
host passes only a camera basis and a params pytree (arrays), so interactive
orbits/slider changes never recompile — the TPU analog of the reference's
per-frame ``kernel.dispatch`` (``inr/viewer/brats_viewer.py:431-442``).

Backends:
  * 'sweep'        — shear-warp sweep (ops/shearwarp): MXU-matmul resampling
                     with XLA lax.scan compositing
  * 'sweep_pallas' — same sweep, compositing fused into a Pallas TPU kernel
                     with C/T resident in VMEM (ops/pallas_composite);
                     requires sweep resolution % 128 == 0
  * 'xla'          — the lockstep while-loop marcher (ops/raymarch_xla),
                     exact oracle semantics, slow (golden-test reference)
  * 'auto'         — the fastest measured path for the platform
                     (sweep_pallas on TPU, sweep elsewhere)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mri_raytracer_tpu.ops import raymarch_xla
from mri_raytracer_tpu.render.camera import CameraBasis, OrbitalCamera
from mri_raytracer_tpu.render.params import BratsRenderParams


_BACKENDS = ("auto", "sweep", "sweep_pallas", "xla")


def _resolve_backend(backend: str) -> str:
    if backend not in _BACKENDS:
        raise ValueError(f"unknown backend {backend!r}; choose from {_BACKENDS}")
    if backend != "auto":
        return backend
    # Measured on v5e (docs/RESULTS_r2.md): the fused Pallas compositing
    # kernel beats the XLA scan; 'xla' (the lockstep gather marcher) remains
    # the oracle for golden tests.
    return "sweep_pallas" if jax.default_backend() == "tpu" else "sweep"


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
        # Host-side occupancy bounding box (any modality or label nonzero):
        # the sweep skips planes outside it when the transfer function maps
        # empty space to zero (empty-space skipping, exact by construction).
        occ = np.array(jnp.any(self.mods != 0.0, axis=0))
        if self.seg is not None:
            occ |= np.asarray(self.seg) != 0
        if self.pred is not None:
            occ |= np.asarray(self.pred) != 0
        self._bbox = []
        for ax in range(3):
            proj = np.any(occ, axis=tuple(a for a in range(3) if a != ax))
            nz = np.nonzero(proj)[0]
            if len(nz):
                self._bbox.append((int(nz[0]), int(nz[-1]) + 1))
            else:
                self._bbox.append((0, occ.shape[ax]))
        self.width = int(width)
        self.height = int(height)
        self.max_steps = int(max_steps)
        self.backend = _resolve_backend(backend)
        self._build()

    @staticmethod
    def _params_key(params) -> tuple:
        """Value-based cache key: id() of transient pytrees is not stable
        (freed objects can reuse addresses; numpy leaves can be mutated in
        place), so hash the actual leaf bytes — params are tiny."""
        return tuple(np.asarray(leaf).tobytes()
                     for leaf in jax.tree_util.tree_leaves(params))

    def _build(self) -> None:
        self._p_cache = (None, None, None, None)
        self._prep_cache = {}  # (axis, blend_key) -> (mixed_s, seg_s, pred_s)
        if self.backend in ("sweep", "sweep_pallas"):
            from mri_raytracer_tpu.ops import shearwarp

            composite = "pallas" if self.backend == "sweep_pallas" else "scan"

            def call(mods, seg, pred, basis, params):
                # Cache the device copy of params + static flags per params
                # VALUE: an unchanged params pytree costs ZERO per-frame
                # host->device transfers (the camera is one packed (13,)
                # vector), which matters on high-latency device links.
                key = self._params_key(params)
                if self._p_cache[0] != key:
                    use_gamma = abs(float(np.asarray(params.gamma)) - 1.0) > 1e-12
                    use_clip = (float(np.asarray(params.near)) > 0.0
                                or float(np.asarray(params.far)) > 0.0)
                    self._p_cache = (key, jax.device_put(params), use_gamma,
                                     use_clip)
                _, p_dev, use_gamma, use_clip = self._p_cache
                # Blended+permuted volumes are camera-independent: cache per
                # (axis, blend weights); invalidated by set_prediction.
                axis = shearwarp.dominant_axis(basis)
                # Empty-space k-crop: exact whenever transfer(0) == 0
                # (wl >= ww/2), i.e. empty voxels emit nothing. Slab bounds
                # pad to 32 so orbit camera changes never force recompiles.
                nk = int(self.mods.shape[1 + axis])
                crop_ok = (float(np.asarray(params.wl))
                           >= 0.5 * float(np.asarray(params.ww)))
                if crop_ok:
                    lo, hi = self._bbox[axis]
                    k_lo = (lo // 32) * 32
                    k_hi = min(nk, -(-hi // 32) * 32)
                else:
                    k_lo, k_hi = 0, nk
                blend_key = (axis, k_lo, k_hi,
                             np.asarray(params.vol_enabled).tobytes(),
                             np.asarray(params.vol_weight).tobytes())
                prep = self._prep_cache.get(blend_key)
                if prep is None:
                    zeros = jnp.zeros((1, 1, 1), jnp.int32)
                    prep = shearwarp.prepare_sweep_volumes(
                        mods, seg if seg is not None else zeros,
                        pred if pred is not None else zeros, p_dev, axis,
                        seg is not None, pred is not None)
                    if (k_lo, k_hi) != (0, nk):
                        prep = tuple(
                            None if v is None
                            else jax.lax.slice_in_dim(v, k_lo, k_hi, axis=0)
                            for v in prep)
                    self._prep_cache[blend_key] = prep
                mixed_s, seg_s, pred_s = prep
                out_res = self.sweep_res or max(self.width, self.height)
                slab = (k_lo, k_hi) != (0, nk)
                return shearwarp.render_prepared(
                    mixed_s, seg_s, pred_s, basis, p_dev, axis, self.width,
                    self.height, out_res, supersample=self.supersample,
                    use_gamma=use_gamma, use_clip=use_clip,
                    composite=composite,
                    z_offset=k_lo if slab else None,
                    nk_global=nk if slab else None)
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
        self._prep_cache.clear()  # prepared volumes embed has_pred/pred data

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
