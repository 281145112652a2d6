"""Arithmetic accounting for the fused shear-warp frame: FLOPs/frame,
achieved TFLOP/s, MFU, steps/ray.

The reference's showcase protocol expects ms + steps/ray overlays
(``docs/showcase-plan.md:7``); this module adds the TPU-native accounting
on top so "is it actually fast" has an arithmetic answer, not only a
vs-baseline ratio.

What is counted (MXU matmul FLOPs, the MFU convention):
  * stage 1 — the XLA b-axis resample einsums (``sweep_composite_pallas``):
    one bilinear half for intensity + one nearest half per overlay, each
    ``2*K*Na*Nb*O``; unconditional (no culling), so the static count is
    exact.
  * stage 2 — the in-kernel a-axis hat-weight dots: ``2*Na*O`` per
    (plane, output row) for intensity and again per overlay. Gated by
    per-tile plane culling and whole-tile early termination, so the static
    count ``K*O^2`` rows is an UPPER BOUND; pass the exact executed-plane
    map from ``BratsRenderer.executed_planes`` (the kernel's 'planes'
    echo instrumentation) to make it exact.
  * warp — the Pallas screen-warp hat-weight matmuls:
    per 32x32 pixel tile and channel, ``(win_i, win_j) x (win_j, 1024)``
    plus the ``win_i``-row reduction; unconditional, exact.

What is deliberately NOT counted:
  * the overlays' one-hot z-pick einsum (``nearest_rows``): nominally
    ``2*K*Nk*Na*Nb`` which would exceed chip peak at measured frame rates —
    XLA provably does not execute it as a dense matmul (it strength-reduces
    the iota-comparison one-hot); counting it would overstate MFU.
  * VPU elementwise work (transfer function, exp, compositing FMAs,
    LUT selects) and DMA — not MXU FLOPs. The kernel is VPU/BW-bound at
    many poses, so MFU here answers "how much of the matmul engine the
    design uses", not "which unit is the bottleneck".
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

# bf16 MXU peak per chip. jax device_kind strings observed: 'TPU v5 lite'
# (v5e, 197 TFLOP/s bf16), 'TPU v4' (275), 'TPU v5p' (459), 'TPU v6 lite'
# (Trillium, 918).
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}
DEFAULT_PEAK = 197e12


def peak_flops(device=None) -> float:
    """bf16 peak for the given (default: first) jax device.

    An unrecognized ``device_kind`` falls back to ``DEFAULT_PEAK`` with a
    warning — an MFU computed against the wrong peak (e.g. a future chip
    generation) should be visibly flagged, not silently plausible."""
    if device is None:
        import jax

        devs = jax.devices()
        if not devs:
            return DEFAULT_PEAK
        device = devs[0]
    kind = getattr(device, "device_kind", "")
    for k, v in _PEAK_BF16.items():
        if kind.startswith(k):
            return v
    import warnings

    warnings.warn(f"arith.peak_flops: unknown device_kind {kind!r}; "
                  f"falling back to {DEFAULT_PEAK / 1e12:.0f} TFLOP/s "
                  "(v5e bf16) — MFU numbers will be wrong on this chip",
                  stacklevel=2)
    return DEFAULT_PEAK


def frame_flops(stats: Dict, width: int, height: int,
                executed_planes: Optional[np.ndarray] = None) -> Dict:
    """MXU FLOPs of one fused shear-warp frame.

    ``stats``: ``BratsRenderer.frame_stats(basis, params)``.
    ``executed_planes``: optional (out_res, out_res) map from
    ``BratsRenderer.executed_planes`` — per-pixel executed-plane counts
    (constant per kernel tile). With it, stage 2 is exact:
    executed (plane, row) work sums to ``sum(map) * 2 * Na`` per dot
    (the per-program count times ``2*tile_i*Na*tile_j`` telescopes to
    ``2*Na*sum(map)``, independent of the tile shape).
    """
    O = stats["out_res"]
    K = stats["planes"]
    Na = stats["Na"]
    Nb = stats["Nb"]
    n_ov = int(stats["has_seg"]) + int(stats["has_pred"])

    stage1 = 2.0 * K * Na * Nb * O * (1 + n_ov)

    per_dot = 2.0 * Na * (1 + n_ov)
    if executed_planes is not None:
        stage2 = per_dot * float(executed_planes.sum(dtype=np.float64))
        steps_eff = float(executed_planes.mean(dtype=np.float64))
    else:
        stage2 = per_dot * K * float(O) * O
        steps_eff = float(K)

    from mri_raytracer_tpu.ops.pallas_warp import PIX, TILE_I, TILE_J

    # The kernel clamps its window to the intermediate plane
    # (warp_pallas_exec: min(win, O)); charging the unclamped ladder window
    # would overstate the warp stage whenever out_res < window. And when
    # the Pallas warp cannot run at all (plane/tile alignment — the same
    # gates as shearwarp.warp_to_screen), the gather fallback executes
    # ZERO MXU warp matmuls. Remaining inexactness: a pose whose footprint
    # fails the device-side fit check also takes the gather fallback,
    # which host-side accounting cannot see (bench poses all fit by
    # ladder construction).
    wi, wj = stats["warp_win"]
    wi, wj = min(wi, O), min(wj, O)
    pallas_warp_ok = (O % 128 == 0 and height % TILE_I == 0
                      and width % TILE_J == 0)
    n_tiles = (height // TILE_I) * (width // TILE_J) if pallas_warp_ok else 0
    warp = n_tiles * 3.0 * (2.0 * wi * wj * PIX + 2.0 * wi * PIX)

    return {
        "flops_stage1": stage1,
        "flops_stage2": stage2,
        "flops_warp": warp,
        "flops_total": stage1 + stage2 + warp,
        "stage2_exact": executed_planes is not None,
        "warp_mxu": pallas_warp_ok,
        "steps_per_ray_max": float(K),
        "steps_per_ray_eff": steps_eff,
    }


def mfu(flops_per_frame: float, fps: float, device=None) -> Dict:
    """Achieved TFLOP/s and model FLOP utilization vs the chip's bf16 peak."""
    achieved = flops_per_frame * fps
    peak = peak_flops(device)
    return {
        "tflops_per_s": achieved / 1e12,
        "mfu": achieved / peak,
        "peak_tflops": peak / 1e12,
    }
