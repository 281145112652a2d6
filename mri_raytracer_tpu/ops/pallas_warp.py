"""Pallas TPU kernel: homography warp of the sweep intermediate to screen.

The XLA fallback warps via one 12-float row-gather per pixel (~7 ms device
time at 1024^2 through XLA's gather path). This kernel removes the gather
entirely:

  * grid = output tiles of 1024 pixels. Tiles are 32 x 32 pixel SQUARES
    (pre-flattened on the XLA side so the kernel only ever sees
    layout-friendly 2-D shapes): under the rotation+perspective of the
    homography a square's source bounding box stays ~tile_size * sqrt(2)
    per axis, so a fixed window covers it at any camera angle — the
    original 8 x 128 tile shape spanned ~128 source rows when the view was
    rotated and the window fit almost never engaged in production;
  * per tile, the footprint's start offsets are precomputed and
    scalar-prefetched; the kernel DMAs a static (3, 72, 256) window of the
    channels-major intermediate from HBM into VMEM, DOUBLE-BUFFERED (the
    next tile's window streams while the current tile interpolates);
  * bilinear interpolation = hat-weight algebra on the MXU/VPU:
        wj (win_j, P) from a sublane-broadcast + iota compare,
        tmp = W @ wj            (matmul, (win_i, win_j) x (win_j, P))
        out = sum_k wi * tmp    (VPU columnwise reduction)
    — zero gathers, zero in-kernel reshapes/transposes.

Tiles whose footprint exceeds the window (extreme minification, i.e. the
intermediate is much finer than the screen) are detected on the XLA side;
the caller falls back to the gather warp for that frame.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_I, TILE_J = 32, 32
PIX = TILE_I * TILE_J  # pixels per tile (one kernel invocation)
# Window sized for the measured worst-case tile footprint across the full
# bench pose set at 1024^2: the exact DIAGONAL pose footprints 138 x 137
# per 32 px tile (the shear intermediate is ~4x finer than the screen
# there), which the old 128 x 256 window could not hold — the per-frame
# lax.cond fell back to the gather warp at exactly the slowest pose
# (~3.4 ms/frame slower, bench diagonal batches 71 vs 91 fps). 160 x 384
# holds it with the 8/128 alignment slack (fit bound 151 x 255); the
# extra window DMA costs ~0.4 ms spread over every pose, bought back
# 8x over at near-diagonal poses. Extreme minification beyond this
# still falls back to the gather warp.
WIN_I, WIN_J = 160, 384
# Smaller compiled window variant: the kernel's matmul FLOPs scale with
# win_i * win_j, and the measured per-tile footprints at 1024^2/256^3 bench
# poses are far below the worst case (orbit max 97 x 89, axis faces 32 x 32,
# top 44 x 44, diag-low 82 x 80 — all fit (112, 256) — vs the exact
# diagonal's 131 x 128, which needs the max window;
# scripts/diag_warp_spans.py). The production renderer computes a host-side
# analytic footprint bound per frame (shearwarp.warp_window_hint) and
# dispatches the smallest fitting variant: 2.1x fewer matmul FLOPs at every
# bench pose but the exact diagonal. The ladder is deliberately SHORT —
# each rung is a separate compiled program per sweep axis, and warmup must
# compile all of them (a remote-compile tunnel charges minutes per
# program); a third (64, 256) rung measured only ~1.7x more FLOP savings
# on the poses it fits while adding 3 more warmup compiles.
WINDOW_LADDER = ((112, 256), (WIN_I, WIN_J))


def choose_window(span_i: float, span_j: float, margin: float = 6.0,
                  O: int | None = None) -> Tuple[int, int]:
    """Smallest ladder window whose fit bound covers the given per-tile
    footprint spans (host-side floats from ``shearwarp.warp_window_hint``).
    ``margin`` absorbs the hint's corner-sampling underestimate; the
    in-program ``warp_fit_starts`` check (with the chosen window) remains
    the correctness gate — a wrong hint only costs the gather fallback.

    ``O``: intermediate-plane resolution. When given, mirrors
    ``warp_fit_starts``'s exact bound — the window is clamped to the axis
    (``min(win, O)``) and the 8/128 DMA alignment slack is dropped when the
    window spans the whole axis (start is then always 0) — so the hint is
    no more conservative than the device-side gate."""
    for wi, wj in WINDOW_LADDER:
        w_i = wi if O is None else min(wi, O)
        w_j = wj if O is None else min(wj, O)
        slack_i = 8 if (O is None or w_i < O) else 0
        slack_j = 128 if (O is None or w_j < O) else 0
        if (span_i + margin <= w_i - 1 - slack_i
                and span_j + margin <= w_j - 1 - slack_j):
            return wi, wj
    return WINDOW_LADDER[-1]


def _make_warp_kernel(win_i: int, win_j: int, group: int, n_groups: int):
    GROUP = group

    def _warp_kernel(starts_ref, imap_ref, jmap_ref, chbm_ref, out_ref,
                     win_ref, sem_ref):
        t = pl.program_id(0)
        kI = jax.lax.broadcasted_iota(jnp.int32, (win_i, PIX), 0) \
            .astype(jnp.float32)
        kJ = jax.lax.broadcasted_iota(jnp.int32, (win_j, PIX), 0) \
            .astype(jnp.float32)

        def _copy(idx, slot):
            si = pl.multiple_of(starts_ref[idx, 0], 8)
            sj = pl.multiple_of(starts_ref[idx, 1], 128)
            return pltpu.make_async_copy(
                chbm_ref.at[:, pl.ds(si, win_i), pl.ds(sj, win_j)],
                win_ref.at[slot], sem_ref.at[slot])

        _copy(t * GROUP, 0).start()

        for g in range(GROUP):
            idx = t * GROUP + g
            slot = g % 2
            # Prefetch the next tile's window into the other slot
            # (within-group only: scratch-state handoff across grid steps
            # would race the unconditional prologue start).
            if g + 1 < GROUP:
                _copy(idx + 1, 1 - slot).start()
            _copy(idx, slot).wait()

            si = pl.multiple_of(starts_ref[idx, 0], 8)
            sj = pl.multiple_of(starts_ref[idx, 1], 128)
            li = imap_ref[g:g + 1, :] - si.astype(jnp.float32)  # (1, P)
            lj = jmap_ref[g:g + 1, :] - sj.astype(jnp.float32)
            # Hat weights, (win, P): sublane-broadcast of the pixel row
            # against an iota over window rows (layout-friendly throughout).
            wi = jnp.maximum(0.0, 1.0 - jnp.abs(li - kI))
            wj = jnp.maximum(0.0, 1.0 - jnp.abs(lj - kJ))

            wj16 = wj.astype(jnp.bfloat16)
            for ch in range(3):
                w = win_ref[slot, ch]  # (win_i, win_j)
                # bf16 matmul with f32 accumulation: weight rounding is
                # <= 2^-8 of a sub-pixel fraction, invisible next to the
                # compositing tolerance.
                tmp = jnp.dot(w.astype(jnp.bfloat16), wj16,
                              preferred_element_type=jnp.float32)
                out_ref[ch, g:g + 1, :] = jnp.sum(wi * tmp, axis=0,
                                                  keepdims=True)

    return _warp_kernel


def warp_fit_starts(i_map: jnp.ndarray, j_map: jnp.ndarray, O: int,
                    height: int, width: int, win: Tuple[int, int] = None):
    """XLA-side per-tile footprint analysis: returns ``(it, jt, starts,
    fits)`` — tile-flattened maps, aligned DMA start offsets, and whether
    EVERY tile's source footprint fits the kernel window. Callers must gate
    ``warp_pallas_exec`` on ``fits`` (``lax.cond``), so a non-fitting frame
    never executes the kernel at all — running it unconditionally and
    discarding the result through the cond was observed to corrupt the
    surrounding program on TPU when another Pallas kernel (the fused
    compositor) lives in the same graph.

    ``win``: (win_i, win_j) kernel window variant (default the ladder max);
    must match the ``win`` passed to ``warp_pallas_exec``."""
    w_i, w_j = win if win is not None else (WIN_I, WIN_J)
    win_i = min(w_i, O)
    win_j = min(w_j, O)
    nTi = height // TILE_I
    nTj = width // TILE_J
    nT = nTi * nTj

    def tiles(m):
        """(H, W) -> (nT, PIX): per-tile row-major pixel flattening."""
        return (m.reshape(nTi, TILE_I, nTj, TILE_J)
                .transpose(0, 2, 1, 3).reshape(nT, PIX))

    it = tiles(i_map)
    jt = tiles(j_map)
    imin = jnp.floor(it.min(axis=1))
    imax = jnp.floor(it.max(axis=1)) + 1.0
    jmin = jnp.floor(jt.min(axis=1))
    jmax = jnp.floor(jt.max(axis=1)) + 1.0
    # DMA offsets must be tile-aligned (8 sublanes / 128 lanes); the window
    # absorbs the alignment slack, so the usable footprint shrinks by it —
    # except when the window spans the whole axis (start is always 0).
    slack_i = 8 if win_i < O else 0
    slack_j = 128 if win_j < O else 0
    fits = jnp.all((imax - imin) < win_i - 1 - slack_i) & \
        jnp.all((jmax - jmin) < win_j - 1 - slack_j)
    si = (jnp.clip(imin, 0, max(O - win_i, 0)).astype(jnp.int32) // 8) * 8
    sj = (jnp.clip(jmin, 0, max(O - win_j, 0)).astype(jnp.int32) // 128) * 128
    starts = jnp.stack([si, sj], axis=-1)  # (nT, 2)
    return it, jt, starts, fits


def warp_pallas_exec(C3: jnp.ndarray, it: jnp.ndarray, jt: jnp.ndarray,
                     starts: jnp.ndarray, height: int, width: int,
                     interpret: bool = False,
                     win: Tuple[int, int] = None) -> jnp.ndarray:
    """The warp kernel proper, over ``warp_fit_starts`` outputs. Only valid
    (and only safe to execute) when that analysis (run with the SAME
    ``win``) returned fits=True."""
    O = C3.shape[1]
    w_i, w_j = win if win is not None else (WIN_I, WIN_J)
    win_i = min(w_i, O)
    win_j = min(w_j, O)
    nTi = height // TILE_I
    nTj = width // TILE_J
    nT = nTi * nTj
    # Blocks need sublane divisibility by 8 (or the full array dimension).
    group = 8 if nT % 8 == 0 else nT
    assert nT <= 8 or nT % 8 == 0, f"unsupported tile count {nT}"
    n_groups = nT // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((group, PIX), lambda t, s: (t, 0)),
            pl.BlockSpec((group, PIX), lambda t, s: (t, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3, group, PIX), lambda t, s: (0, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 3, win_i, win_j), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_warp_kernel(win_i, win_j, group, n_groups),
        out_shape=jax.ShapeDtypeStruct((3, nT, PIX), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, it, jt, C3)
    # Reassemble tile-flattened pixels -> (H, W, 3) on the XLA side.
    out = (out.reshape(3, nTi, nTj, TILE_I, TILE_J)
           .transpose(1, 3, 2, 4, 0).reshape(height, width, 3))
    return out


@functools.partial(jax.jit, static_argnames=("height", "width", "interpret",
                                             "win"))
def warp_pallas(C3: jnp.ndarray, i_map: jnp.ndarray, j_map: jnp.ndarray,
                height: int, width: int, interpret: bool = False,
                win: Tuple[int, int] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience/test wrapper: analysis + unconditional kernel execution.
    Returns (out (H, W, 3), fits () bool); ``out`` is valid only where
    ``fits``. Production callers use ``warp_fit_starts`` +
    ``warp_pallas_exec`` under ``lax.cond`` instead (see warp_fit_starts)."""
    O = C3.shape[1]
    it, jt, starts, fits = warp_fit_starts(i_map, j_map, O, height, width,
                                           win=win)
    out = warp_pallas_exec(C3, it, jt, starts, height, width, interpret,
                           win=win)
    return out, fits
