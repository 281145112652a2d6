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
        # the sweep crops to it along ALL THREE axes when the transfer
        # function maps empty space to zero (content crop, exact by
        # construction): planes outside the k-range are skipped and the
        # intermediate image covers only the content box's projection.
        occ = np.array(jnp.any(self.mods != 0.0, axis=0))
        if self.seg is not None:
            occ |= np.asarray(self.seg) != 0
        self._occ_proj = [np.any(occ, axis=tuple(a for a in range(3)
                                                 if a != ax))
                          for ax in range(3)]
        self._refresh_bbox()
        self.width = int(width)
        self.height = int(height)
        self.max_steps = int(max_steps)
        self.backend = _resolve_backend(backend)
        self._build()

    def _refresh_bbox(self) -> None:
        """Tight occupancy bbox per axis = base projections OR pred's."""
        self._bbox = []
        for ax in range(3):
            proj = self._occ_proj[ax]
            if self.pred is not None:
                proj = proj | np.asarray(
                    jnp.any(self.pred != 0,
                            axis=tuple(a for a in range(3) if a != ax)))
            nz = np.nonzero(proj)[0]
            if len(nz):
                self._bbox.append((int(nz[0]), int(nz[-1]) + 1))
            else:
                self._bbox.append((0, int(proj.shape[0])))

    @staticmethod
    def _crop16(lo: int, hi: int, n: int, guard: int = 4) -> tuple:
        """Pad a crop range to 16-slice granularity (stable shapes across
        small bbox changes — the bbox is camera-independent, so granularity
        only limits recompiles when set_prediction grows the box).

        ``guard`` zero slices are kept on BOTH sides (clamped at the volume
        edge). Besides landing the closing plane's edge-clamp on a zero
        slice, the guard keeps the crop-box FACES in zero territory: the
        sweep misses the ray segment between box entry and the first plane
        crossing (up to one spacing, ~1.8 voxels at diagonal views), so a
        face placed directly on content loses its emission — measured
        12 dB PSNR at the worst diagonal pose (41.2 -> 53.4 dB,
        `docs/img/diag_entry_error.png`). Four slices cover the gap +
        trilinear support with margin at ~2% extra planes."""
        return (max(0, lo - guard) // 16) * 16, \
            min(n, -(-(hi + guard) // 16) * 16)

    def _geometry(self, basis, params):
        """Host-side per-frame geometry (shared by the render path and
        ``frame_stats``): dominant sweep axis, content crop per permuted
        dim, and the intermediate resolution.

        Content crop: exact whenever transfer(0) == 0 (wl >= ww/2), i.e.
        empty voxels emit nothing. Planes outside the occupied k-range are
        skipped (slab contract) and the in-plane crop + shrunk intermediate
        resolution spend rays only on the content box's projection, at >=
        the uncropped sampling density. Bounds pad to 16 for stable
        compiled shapes; the round-up of out_res to 128 only ever RAISES
        the sampling density."""
        from mri_raytracer_tpu.ops import shearwarp

        axis = shearwarp.dominant_axis(basis)
        order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
        dims_perm = [int(self.mods.shape[1 + o]) for o in order]
        nk, na_g, nb_g = dims_perm
        crop_ok = (float(np.asarray(params.wl))
                   >= 0.5 * float(np.asarray(params.ww)))
        if crop_ok:
            crops = [self._crop16(*self._bbox[o], dims_perm[i])
                     for i, o in enumerate(order)]
        else:
            crops = [(0, n) for n in dims_perm]
        base_res = self.sweep_res or max(self.width, self.height)
        out_res, inplane_cropped = shearwarp.crop_out_res(base_res, crops,
                                                          dims_perm)
        return axis, order, dims_perm, crops, out_res, inplane_cropped

    def frame_stats(self, basis, params) -> dict:
        """Static per-frame arithmetic geometry for accounting
        (utils/arith.py): sweep axis, planes crossed (= max march steps per
        ray), intermediate resolution, crop extents, and the warp window
        the footprint hint selects. Pure host math — no device work."""
        from mri_raytracer_tpu.ops import shearwarp
        from mri_raytracer_tpu.ops.pallas_warp import WINDOW_LADDER

        axis, order, dims_perm, crops, out_res, inplane_cropped = \
            self._geometry(basis, params)
        (k_lo, k_hi), (a_lo, a_hi), (b_lo, b_hi) = crops
        win = WINDOW_LADDER[-1]
        if self.backend == "sweep_pallas":
            win = shearwarp.warp_win_hint_or_max(
                basis, params, dims_perm, axis, out_res, self.width,
                self.height, crops)
        return {
            "axis": axis,
            "out_res": out_res,
            # n_planes the kernel loops over = cropped k extent x
            # supersample + 1 (shearwarp.py: n_planes = Nk*supersample + 1)
            "planes": (k_hi - k_lo) * self.supersample + 1,
            "crop_k": (k_lo, k_hi),
            "crop_a": (a_lo, a_hi),
            "crop_b": (b_lo, b_hi),
            "Na": a_hi - a_lo,
            "Nb": b_hi - b_lo,
            "warp_win": tuple(win),
            "has_seg": self.seg is not None,
            "has_pred": self.pred is not None,
        }

    @staticmethod
    def _params_key(params) -> tuple:
        """Value-based cache key: id() of transient pytrees is not stable
        (freed objects can reuse addresses; numpy leaves can be mutated in
        place), so hash the actual leaf bytes — params are tiny."""
        return tuple(np.asarray(leaf).tobytes()
                     for leaf in jax.tree_util.tree_leaves(params))

    def _build(self) -> None:
        self._p_cache = (None, None, None, None)
        self._prep_cache = {}  # (axis, blend_key) -> (volumes, device-scalars)
        if self.backend in ("sweep", "sweep_pallas"):
            from mri_raytracer_tpu.ops import shearwarp

            composite = "pallas" if self.backend == "sweep_pallas" else "scan"

            def call(mods, seg, pred, basis, params, warp_win_override=None,
                     echo=None):
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
                # (axis, crop, blend weights); invalidated by set_prediction.
                (axis, order, dims_perm, crops, out_res,
                 inplane_cropped) = self._geometry(basis, params)
                nk, na_g, nb_g = dims_perm
                (k_lo, k_hi), (a_lo, a_hi), (b_lo, b_hi) = crops
                blend_key = (axis, tuple(crops),
                             np.asarray(params.vol_enabled).tobytes(),
                             np.asarray(params.vol_weight).tobytes())
                prep = self._prep_cache.get(blend_key)
                if prep is None:
                    zeros = jnp.zeros((1, 1, 1), jnp.int32)
                    vols = shearwarp.prepare_sweep_volumes(
                        mods, seg if seg is not None else zeros,
                        pred if pred is not None else zeros, p_dev, axis,
                        seg is not None, pred is not None)
                    for dim, (lo, hi) in enumerate(crops):
                        if (lo, hi) != (0, dims_perm[dim]):
                            vols = tuple(
                                None if v is None
                                else jax.lax.slice_in_dim(v, lo, hi, axis=dim)
                                for v in vols)
                    # Crop offsets as DEVICE-RESIDENT scalars: passing
                    # Python ints re-uploads them every frame (6 tiny
                    # host->device transfers/frame over the tunnel
                    # measured ~3.5 ms — a third of the frame budget).
                    (k_lo, _), (a_lo, _), (b_lo, _) = crops
                    devs = (jax.device_put(jnp.float32(k_lo)),
                            (jax.device_put(jnp.float32(a_lo)),
                             jax.device_put(jnp.float32(b_lo))))
                    prep = (vols, devs)
                    self._prep_cache[blend_key] = prep
                (mixed_s, seg_s, pred_s), (z_dev, ab_dev) = prep
                slab = (k_lo, k_hi) != (0, nk)
                # Host-side analytic footprint bound -> smallest compiled
                # warp-window variant (pallas_warp.WINDOW_LADDER): the warp
                # kernel's matmul FLOPs scale with the window area, and most
                # poses need a fraction of the worst-case window. Pure
                # numpy on host values (~50 us); a wrong hint only costs
                # the in-program gather fallback, never a wrong image.
                if warp_win_override is not None or composite != "pallas":
                    warp_win = warp_win_override
                else:
                    warp_win = shearwarp.warp_win_hint_or_max(
                        basis, params, (nk, na_g, nb_g), axis, out_res,
                        self.width, self.height,
                        ((k_lo, k_hi), (a_lo, a_hi), (b_lo, b_hi)))
                return shearwarp.render_prepared(
                    mixed_s, seg_s, pred_s, basis, p_dev, axis, self.width,
                    self.height, out_res, supersample=self.supersample,
                    use_gamma=use_gamma, use_clip=use_clip,
                    composite=composite,
                    z_offset=z_dev if slab else None,
                    nk_global=nk if slab else None,
                    ab_offset=ab_dev if inplane_cropped else None,
                    inplane_global=(na_g, nb_g) if inplane_cropped else None,
                    warp_win=warp_win, echo=echo)
        else:
            fn = raymarch_xla.render_brats

            def call(mods, seg, pred, basis, params):
                return fn(mods, seg, pred, basis, params,
                          self.width, self.height, self.max_steps)

        self._call = call

    def warmup(self, params: BratsRenderParams) -> None:
        """Pre-compile every sweep-axis variant so an interactive orbit never
        hits a compile stall when the dominant axis flips. On the fused TPU
        path this also compiles every warp-window ladder variant per axis
        (the per-frame window hint switches between them as the footprint
        changes mid-orbit — each must already be compiled or the orbit
        stalls on the first pose that needs it)."""
        from mri_raytracer_tpu.ops import shearwarp

        shearwarp.warmup_window_variants(
            lambda basis, win: self.render(basis, params, _warp_win=win),
            ladder=(self.backend == "sweep_pallas"
                    and jax.default_backend() == "tpu"))

    def set_prediction(self, pred: Optional[np.ndarray]) -> None:
        """Upload an INR prediction volume (reference 'Load INR & Predict')."""
        self.pred = None if pred is None else jnp.asarray(pred, jnp.int32)
        self._prep_cache.clear()  # prepared volumes embed has_pred/pred data
        self._refresh_bbox()  # pred content may extend the crop box

    def render(self, basis: CameraBasis, params: BratsRenderParams,
               _warp_win=None, _echo=None) -> jnp.ndarray:
        """``_warp_win``: internal — force a warp-window ladder variant
        (warmup precompilation); production frames use the per-frame hint.
        ``_echo``: internal — fused-compositor instrumentation channel
        (returns the echo payload instead of an image; see
        ``executed_planes``)."""
        if self.backend in ("sweep", "sweep_pallas"):
            return self._call(self.mods, self.seg, self.pred, basis, params,
                              warp_win_override=_warp_win, echo=_echo)
        return self._call(self.mods, self.seg, self.pred, basis, params)

    def executed_planes(self, basis: CameraBasis,
                        params: BratsRenderParams) -> np.ndarray:
        """EXACT per-pixel executed-plane counts for this frame, from the
        fused compositor's 'planes' instrumentation (echo channel): the
        static plane budget (``frame_stats['planes']``) is an upper bound —
        per-tile content culling and whole-tile early termination skip
        planes — and this measures what actually ran. Used by utils/arith
        for FLOPs-per-frame / MFU accounting; compiles one extra
        (instrumented) program variant. Fused Pallas backend only."""
        if self.backend != "sweep_pallas":
            raise RuntimeError("executed_planes requires the fused Pallas "
                               f"backend (current: {self.backend})")
        return np.asarray(self.render(basis, params, _echo="planes"))

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
