"""Pallas TPU kernel: fused shear-warp compositing.

The XLA scan spends most of its frame writing C/T and per-plane weights
through HBM (~23 ms at 1024^2 x 257 planes). This kernel keeps the running
image and transmittance in VMEM for the entire sweep:

  XLA stage (per frame): per-plane geometry vectors in sweep order + the
  b-axis half of the separable resample, t1b[m] = slice_m @ Wb_m^T, stored
  bf16 (one big batched einsum, MXU-efficient). With supersample == 1 the
  sweep planes sit at INTEGER slice indices, so the z-lerp is a no-op and
  the slice batch is a single take in sweep order (no two-take lerp).

  Kernel: grid over column tiles of the intermediate; each invocation
  fori-loops over ALL planes with DOUBLE-BUFFERED slab DMA (plane m+1's
  column slab streams in while plane m composites, hiding DMA latency —
  2056 sequential DMA round-trips otherwise dominate the kernel). The
  intensity, seg and baked-pred b-axis halves ride ONE fused slab per
  plane (row blocks [0:Na] | [Na:2Na] | [..:+Na]) — a single DMA stream:
  measured on a real v5e, a second concurrently double-buffered stream
  corrupts the intensity output at near-diagonal poses even when its
  payload is all-zero and its compositing math is compiled out (see
  ``_make_kernel`` and scripts/diag_overlay_bisect.py). Per plane: build
  a-axis hat weights from iota + two SMEM scalars, one
  (O, Na) x (Na, TILE_J) MXU matmul completes the trilinear resample, then
  transfer function, alpha, masks, label LUT compositing and the T <= 0.01
  gate run on the VPU with C/T never leaving VMEM. Intensity emission is
  grayscale, so the kernel accumulates C_gray + per-channel label color
  sums (exact algebra: contributions are linear in the emission color).

Exactness: same math as ``shearwarp.sweep_composite`` (golden-tested in
interpret mode); bf16 t1b introduces <= ~2e-3 sample error like the XLA
path. The one intentional difference: the scan path's z = Nk edge plane
lerps 0.999 into slice Nk-1 (clamp at Nk-1.001) while this kernel uses
slice Nk-1 exactly — a <= 1e-3 * |slice difference| deviation on one plane.

Reference parity: implements the compositing loop of
``inr/viewer/brats_rt.slang:115-165`` (window/level transfer, alpha
accumulation, label LUT overlays, early termination).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mri_raytracer_tpu.ops import shearwarp as sw
from mri_raytracer_tpu.render.params import BratsRenderParams


def _make_kernel(n_planes: int, Na: int, out_res: int, tile_i: int,
                 tile_j: int, has_seg: bool, has_pred: bool, use_gamma: bool,
                 use_clip: bool, field_stride: int = 0,
                 field_kstride: int = 1, field_width: int = 0,
                 no_overlay: bool = False, echo: Optional[str] = None):
    # SINGLE-STREAM LAYOUT: the seg and (baked, mode-1) pred b-axis halves
    # ride in the SAME per-plane slab as the intensity rows — row blocks
    # [0:Na] intensity, [Na:2Na] seg, [.. +Na] pred — so each plane is ONE
    # DMA. Measured motivation (scripts/diag_overlay_bisect.py on a real
    # v5e): with seg as a second concurrently double-buffered DMA stream,
    # the kernel's INTENSITY output corrupts at the diagonal pose by
    # ~40 dB vs the scan compositor even when the seg volume is all-zero,
    # the LUT alphas are zero, and the overlay arithmetic is compiled out
    # entirely — i.e. pure DMA-coexistence corruption, invariant to tile
    # size and to the entry fast path. One stream sidesteps it and also
    # halves semaphore traffic. (Mode-2's stride-S field keeps its own
    # stream: its planes advance at m // kstride, which cannot share the
    # intensity slab's per-plane slicing.)
    # field_stride > 0: the pred stream is a PREDICTION FIELD — per-plane
    # labels at stride-S intermediate positions, (n_fplanes, Op, Op) with
    # Op = out_res // S (neural march mode 2) — upsampled here by TWO
    # one-hot matmuls (floor(i/S) rows, floor(j/S) columns). Streaming the
    # field at stride-S width cuts its DMA traffic S x vs pre-repeating on
    # the host (the stream is re-read once per i-tile, so width dominates
    # its bandwidth cost). field_kstride: the field holds every K-th sweep
    # plane only (plane m reads field row m // K — labels vary slowly along
    # the sweep, so nearest-plane upsampling costs little quality for a
    # K x cut of the predict_field pass).
    Op = out_res // field_stride if field_stride else 0
    tjp = tile_j // field_stride if field_stride else 0
    # Mosaic requires HBM lane-dim slices 128-aligned; when Op is not a
    # 128-multiple (e.g. out_res=896, stride=4 -> Op=224) the field arrives
    # zero-padded to field_width >= tjp and streams at the padded width
    # (tile_j == out_res, so the slice always starts at column 0). Padded
    # rows of the column one-hot are never selected (qfc < Op).
    fw = field_width or tjp
    # Row-block offsets of the fused stream-0 slab.
    seg_off = Na
    pred_off = Na * (1 + int(has_seg))

    def kernel(pp_ref, sc_ref, lut_ref, rtm_ref, t1b_hbm, t1pb_hbm,
               vmag_ref, dt_ref, r_ref, out_ref,
               buf_ref, bufp_ref, cg_ref, lr_ref, lg_ref, lb_ref,
               t_ref, started_ref, alive_ref, sem_ref, semp_ref):
        # pp_ref (SMEM): (n_planes, 7) = off_a, sc_a, off_b, sc_b, lam, own, q
        # r_ref: per-pixel march-start position in plane units (see
        # shearwarp.entry_ratio_map) — the first-segment dt correction.
        # sc_ref (SMEM): (16,) scalars; lut_ref (SMEM): (8, 4)
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        cg_ref[:] = jnp.zeros_like(cg_ref)
        lr_ref[:] = jnp.zeros_like(lr_ref)
        lg_ref[:] = jnp.zeros_like(lg_ref)
        lb_ref[:] = jnp.zeros_like(lb_ref)
        t_ref[:] = jnp.ones_like(t_ref)
        started_ref[:] = jnp.zeros_like(started_ref)
        alive_ref[0] = jnp.int32(1)
        alive_ref[1] = jnp.int32(0)  # executed-plane counter (echo='planes')

        # Column iota (tile_i, 1): positions are constant along the Na axis,
        # so per-plane position math runs on (tile_i, 1) and only the final
        # weight compare touches the full (tile_i, Na) block (VPU budget
        # dominates this kernel — every full-size op counts).
        iota_col = (ti * tile_i
                    + jax.lax.broadcasted_iota(jnp.int32, (tile_i, 1), 0)) \
            .astype(jnp.float32)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, (tile_i, Na), 1) \
            .astype(jnp.float32)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, tile_j), 1) \
            .astype(jnp.float32)
        if field_stride:
            # Row-upsample one-hot: output row r reads field row r // S.
            qf = jnp.floor(iota_col / float(field_stride))  # (tile_i, 1)
            iota_f = jax.lax.broadcasted_iota(jnp.int32, (tile_i, Op), 1) \
                .astype(jnp.float32)
            wan_f = (qf == iota_f).astype(jnp.float32)  # (tile_i, Op)
            # Column-upsample one-hot: output column j reads field col j//S.
            iota_fc = jax.lax.broadcasted_iota(jnp.int32, (fw, tile_j), 0) \
                .astype(jnp.float32)
            qfc = jnp.floor((tj * tile_j + iota_j) / float(field_stride)) \
                - tj * tjp
            wbn_f = (iota_fc == qfc).astype(jnp.float32)  # (tjp, tile_j)

        ww = sc_ref[0]
        wl = sc_ref[1]
        gamma = sc_ref[2]
        ia = sc_ref[3]
        near = sc_ref[4]
        far = sc_ref[5]
        show_seg = sc_ref[6]
        show_pred = sc_ref[7]
        # Content-crop bounds (global-box clamp/mask in LOCAL index units;
        # uncropped volumes get the legacy [0, N] values).
        mask_b_lo = sc_ref[8]
        mask_b_hi = sc_ref[9]
        a_clamp_lo = sc_ref[10]
        a_clamp_hi = sc_ref[11]
        a_clamp_hi_n = sc_ref[12]
        mask_a_lo = sc_ref[13]
        mask_a_hi = sc_ref[14]
        lo = wl - 0.5 * ww
        inv_ww = 1.0 / ww
        dt = dt_ref[:]

        def _copy(stream, m, slot):
            if stream == 2:
                # Field stream (mode 2): stride-S (padded) width, every K-th
                # sweep plane. tile_j == out_res => tj == 0, so the slice is
                # the whole (Op, fw) plane — and it MUST be written as the
                # whole plane: a dynamic lane offset `tj * tjp` is unprovably
                # 128-aligned when tjp is not a 128-multiple (Mosaic rejects
                # the memref_slice at compile time on real TPUs).
                return pltpu.make_async_copy(
                    t1pb_hbm.at[m // field_kstride],
                    bufp_ref.at[slot], semp_ref.at[slot])
            return pltpu.make_async_copy(
                t1b_hbm.at[m, :, pl.ds(tj * tile_j, tile_j)],
                buf_ref.at[slot], sem_ref.at[slot])

        streams = [0] + ([2] if has_pred and field_stride else [])

        # Prologue: stream plane 0 into slot 0.
        for s in streams:
            _copy(s, 0, 0).start()

        def body(m, _):
            slot = jax.lax.rem(m, 2)
            # Kick off plane m+1 into the other slot before waiting on m.
            # DMA runs UNconditionally (semaphores stay balanced even for
            # skipped planes — wasted bandwidth is ~1 ms/frame, the saved
            # VPU work is the frame's dominant cost).
            @pl.when(m + 1 < n_planes)
            def _():
                for s in streams:
                    _copy(s, m + 1, 1 - slot).start()
            for s in streams:
                _copy(s, m, slot).wait()

            off_a = pp_ref[m, 0]
            sc_a = pp_ref[m, 1]
            off_b = pp_ref[m, 2]
            sc_b = pp_ref[m, 3]
            lam = pp_ref[m, 4]
            own = pp_ref[m, 5]  # slab plane ownership (1.0 full volume)
            q_m = pp_ref[m, 6]  # plane position in dt units (= t_k / dt)

            # Scalar plane/tile culling: skip the whole plane when this
            # tile's row/column footprint misses the content box (leading
            # planes, corner tiles) — the per-pixel act mask would be
            # all-zero — or when every ray in the tile has terminated
            # (T <= 0.01 everywhere, the monotone early-out).
            pa0 = off_a + (ti * tile_i) * sc_a
            pa1 = off_a + (ti * tile_i + tile_i - 1) * sc_a
            a_ok = (jnp.maximum(pa0, pa1) >= mask_a_lo) \
                & (jnp.minimum(pa0, pa1) <= mask_a_hi)
            pb0 = off_b + (tj * tile_j) * sc_b
            pb1 = off_b + (tj * tile_j + tile_j - 1) * sc_b
            b_ok = (jnp.maximum(pb0, pb1) >= mask_b_lo) \
                & (jnp.minimum(pb0, pb1) <= mask_b_hi)
            plane_ok = a_ok & b_ok & (own > 0.0)
            if not use_clip:
                plane_ok = plane_ok & (lam >= 0.0)
            # Entry fast path: once the plane sits > 2 dt beyond every
            # finite entry in this tile (q_m > max r + 2), the pre-entry
            # gate is all-ones and the first-segment correction is exactly
            # the identity (g >= 2 for finite r; clip(g,0,2)*(g<2) == 0 for
            # the 3e38 sentinel) — so the ~17 extra VPU ops/plane the
            # correction costs are paid only on the few entry planes.
            fast = q_m > rtm_ref[ti, tj] + 2.0

            def compute(fast_path):
                # a-axis hat weights + inside mask. Position math on (O, 1);
                # only the weight compare is full (O, Na).
                pos_a = off_a + iota_col * sc_a  # (O, 1)
                qa = jnp.clip(pos_a, a_clamp_lo, a_clamp_hi)
                wa = jnp.maximum(0.0, 1.0 - jnp.abs(qa - iota_n))
                mask_a = ((pos_a >= mask_a_lo)
                          & (pos_a <= mask_a_hi)).astype(jnp.float32)
                # b-axis inside mask for this tile's columns.
                pos_b = off_b + (tj * tile_j + iota_j) * sc_b  # (1, tile_j)
                mask_b = ((pos_b >= mask_b_lo)
                          & (pos_b <= mask_b_hi)).astype(jnp.float32)

                blk = buf_ref[slot]  # (n_rows, tile_j) fused slab
                v = jnp.dot(wa.astype(jnp.bfloat16), blk[0:Na],
                            preferred_element_type=jnp.float32)  # (O, tile_j)

                T = t_ref[:]
                if fast_path:
                    act = mask_a * mask_b * own \
                        * (T > 0.01).astype(jnp.float32)
                else:
                    # Pre-entry gate + first-segment correction (the per-ray
                    # 'started' form of shearwarp.entry_correction: the FIRST
                    # active plane extends its dt by g = q - r, keeping the
                    # march length continuous in r under fp noise).
                    g = q_m - r_ref[:]
                    pre_ok = ((g >= -1e-3) | (r_ref[:] >= 1e37)) \
                        .astype(jnp.float32)
                    act = mask_a * mask_b * own * pre_ok \
                        * (T > 0.01).astype(jnp.float32)
                if use_clip:
                    t_k = lam * vmag_ref[:]
                    act = act * ((t_k >= near)
                                 & (t_k <= far)).astype(jnp.float32)

                if fast_path:
                    dt_e = dt
                    # Keep 'started' current even on fast planes: a slow
                    # plane can only follow if q_m were non-monotonic, but
                    # one max costs nothing next to the ops saved.
                    started_ref[:] = jnp.maximum(started_ref[:], act)
                else:
                    first = act * (1.0 - started_ref[:])
                    dt_e = dt * (1.0 + jnp.clip(g, 0.0, 2.0)
                                 * (g < 2.0).astype(jnp.float32) * first)
                    started_ref[:] = jnp.maximum(started_ref[:], act)
                val = jnp.clip((v - lo) * inv_ww, 0.0, 1.0)
                if use_gamma:
                    val = jnp.power(val, gamma)
                aI = (1.0 - jnp.exp(-val * ia * dt_e)) * act
                cg_ref[:] = cg_ref[:] + aI * T * val
                T = T * (1.0 - aI)

                if no_overlay:
                    # Debug: overlay streams keep their DMA traffic but the
                    # compositing math is dropped — isolates DMA coexistence
                    # from overlay-code miscompiles.
                    t_ref[:] = T
                    alive_ref[0] = (jnp.max(T) > 0.01).astype(jnp.int32)
                    return
                if has_seg or (has_pred and not field_stride):
                    qan = jnp.round(jnp.clip(pos_a, a_clamp_lo, a_clamp_hi_n))
                    wan = (qan == iota_n).astype(jnp.float32)  # (O, Na)

                def overlay(wmat, rows, T, rate, wcol=None):
                    lab = jnp.dot(wmat.astype(jnp.bfloat16), rows,
                                  preferred_element_type=jnp.float32)
                    if wcol is not None:  # stride-S field: column upsample
                        lab = jnp.dot(lab.astype(jnp.bfloat16),
                                      wcol.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32)
                    idx = jnp.round(lab)
                    a_lab = jnp.zeros_like(lab)
                    r = jnp.zeros_like(lab)
                    g = jnp.zeros_like(lab)
                    bl = jnp.zeros_like(lab)
                    for c in range(1, 8):
                        sel = (idx == float(c))
                        a_lab = jnp.where(sel, lut_ref[c, 3], a_lab)
                        r = jnp.where(sel, lut_ref[c, 0], r)
                        g = jnp.where(sel, lut_ref[c, 1], g)
                        bl = jnp.where(sel, lut_ref[c, 2], bl)
                    aS = (1.0 - jnp.exp(-a_lab * dt_e * rate[0])) * act * rate[1]
                    w = aS * T
                    lr_ref[:] = lr_ref[:] + w * r
                    lg_ref[:] = lg_ref[:] + w * g
                    lb_ref[:] = lb_ref[:] + w * bl
                    return T * (1.0 - aS)

                if has_seg:
                    T = overlay(wan, blk[seg_off:seg_off + Na], T,
                                (1.0, show_seg))
                if has_pred:
                    T = overlay(wan_f if field_stride else wan,
                                bufp_ref[slot] if field_stride
                                else blk[pred_off:pred_off + Na], T,
                                (1.5, show_pred),
                                wcol=wbn_f if field_stride else None)
                t_ref[:] = T
                alive_ref[0] = (jnp.max(T) > 0.01).astype(jnp.int32)

            run = plane_ok & (alive_ref[0] > 0)

            if echo == "planes":
                # Arithmetic-accounting instrumentation (utils/arith.py):
                # count the planes whose compute actually executes in this
                # tile (plane/tile culling + early termination make static
                # FLOP counts upper bounds; this makes them exact). Static
                # flag — the production program compiles without it.
                @pl.when(run)
                def _():
                    alive_ref[1] = alive_ref[1] + 1

            @pl.when(run & fast)
            def _():
                compute(True)

            @pl.when(run & jnp.logical_not(fast))
            def _():
                compute(False)
            return 0

        jax.lax.fori_loop(0, n_planes, body, 0)
        out_ref[0] = cg_ref[:] + lr_ref[:]
        out_ref[1] = cg_ref[:] + lg_ref[:]
        out_ref[2] = cg_ref[:] + lb_ref[:]
        if echo == "planes":  # executed-plane count, broadcast over the tile
            out_ref[3] = jnp.zeros_like(t_ref) \
                + alive_ref[1].astype(jnp.float32)
        elif echo:  # debug: surface a kernel INPUT as seen at runtime
            out_ref[3] = {"r": r_ref, "dt": dt_ref, "vmag": vmag_ref}[echo][:]
        else:
            out_ref[3] = t_ref[:]

    return kernel


def sweep_composite_pallas(mixed_s: jnp.ndarray, seg_s: Optional[jnp.ndarray],
                           pred_s: Optional[jnp.ndarray], geom: sw.SweepGeom,
                           p: BratsRenderParams, axis: int, out_res: int,
                           use_gamma: bool = True, use_clip: bool = True,
                           interpret: bool = False, z_offset=None,
                           nk_global: Optional[int] = None,
                           pred_field: Optional[jnp.ndarray] = None,
                           field_stride: int = 0,
                           field_kstride: int = 1,
                           vmem_budget: int = 13 * 2 ** 20,
                           force_slow: bool = False,
                           no_overlay: bool = False,
                           synth_seg: bool = False,
                           echo: Optional[str] = None,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for shearwarp.sweep_composite (ss=1).

    Slab mode (``z_offset``/``nk_global``, same contract as
    ``shearwarp.sweep_composite``): ``mixed_s`` is a k-contiguous slab of an
    ``nk_global``-deep volume starting at global slice ``z_offset`` —
    used for empty-space cropping (planes outside the occupied k-range
    contribute nothing when transfer(0) == 0) and for sharded volumes.

    ``pred_field``/``field_stride``: neural-march mode 2 — per-plane INR
    labels at stride-S intermediate positions,
    (ceil(n_planes / field_kstride), Op, Op) with Op = out_res // S, in
    SWEEP order (``neural_march.predict_field``), composited as the pred
    overlay via in-kernel floor(i/S) / floor(j/S) one-hot upsampling
    (streamed at stride-S width — S x less field DMA). ``field_kstride``:
    the field covers every K-th sweep plane; plane m reads row m // K.
    Mutually exclusive with ``pred_s``.
    """
    Nk, Na, Nb = mixed_s.shape
    assert pred_s is None or pred_field is None
    n_planes = Nk + 1
    nk_g = nk_global if nk_global is not None else Nk
    has_seg = seg_s is not None
    has_pred = pred_s is not None or pred_field is not None
    if pred_field is not None:
        na_pred = pred_field.shape[1]
        w_pred = pred_field.shape[2]
        assert w_pred == out_res // field_stride, (pred_field.shape,
                                                   out_res, field_stride)
        assert pred_field.shape[0] == -(-n_planes // field_kstride)
        # Mosaic HBM slices must be 128-aligned on the lane dim: pad the
        # field width up (e.g. Op=224 -> 256) and stream the padded width.
        fw_pad = -(-w_pred // 128) * 128
        if fw_pad != w_pred:
            pred_field = jnp.pad(
                pred_field, ((0, 0), (0, 0), (0, fw_pad - w_pred)))
    else:
        na_pred = Na
        w_pred = out_res
        fw_pad = out_res
    # Tiling: the per-plane a-weight build — the kernel's dominant VPU cost
    # after the per-pixel transfer math — is (tile_i, Na) PER PROGRAM, i.e.
    # n_tj * out_res * Na per plane in total. So tile_j spans the FULL row
    # (n_tj = 1) and tile_i is the largest divisor of out_res that keeps the
    # five f32 accumulators + the bf16 stream double-buffers inside VMEM.
    # The price is re-reading the t1b slabs once per i-tile (~0.1 ms/100 MB
    # of HBM at 1024^2, cheap next to the VPU work saved).
    tile_j = out_res
    # Fused stream-0 rows: intensity + optional seg + optional baked pred.
    n_rows = Na * (1 + int(has_seg) + int(pred_s is not None))
    field_rows = na_pred if pred_field is not None else 8
    field_w = fw_pad if pred_field is not None else 128
    stream_bytes = 2 * (n_rows * tile_j + field_rows * field_w) * 2  # bf16

    # Per-program VMEM: 6 f32 accumulators (C gray, 3x label, T, started) +
    # the pipeline's double-buffered blocks (vmag, dt, r in; the (4, ti, tj)
    # out) — 6 + 2*(3 + 4) = 20 f32 planes of (tile_i, tile_j) — plus the
    # stream buffers.
    budget = vmem_budget  # parameterized so tests can force multi-tile grids
    tile_i = 8
    for cand in range(out_res, 7, -8):
        if out_res % cand == 0 and \
                20 * 4 * cand * tile_j + stream_bytes <= budget:
            tile_i = cand
            break

    # ---------------- per-plane geometry in sweep order (XLA; shared
    # contract with neural_march.predict_field)
    z, z_glob, lam, off_a, sc_a, off_b, sc_b = sw.sweep_plane_affines(
        geom, p, axis, n_planes, z_offset=z_offset)
    acl, ach, acn, aml, amh = sw._geom_bounds(geom, 0, Na)
    bcl, bch, bcn, bml, bmh = sw._geom_bounds(geom, 1, Nb)
    # Channel 5: plane ownership — a slab owns its closing plane only when
    # it holds the volume end (matches shearwarp slab semantics).
    own = jnp.where(z < Nk - 1e-6, 1.0,
                    jnp.where(z_glob >= nk_g - 1e-6, 1.0, 0.0))
    # Plane position in per-ray dt units: t_k/dt = lam * |w_base - e_k|/vox_k
    # (vmag cancels, so it is a per-plane scalar) — with the per-pixel
    # march-start map r this drives the first-segment dt correction.
    vox_k = sw._permute3(p.voxel_size, axis)[0]
    qfac = jnp.abs(geom.w_base - geom.e[0]) / jnp.maximum(vox_k, 1e-6)
    pp = jnp.stack([off_a, sc_a, off_b, sc_b, lam, own,
                    lam * qfac], axis=-1)  # (K, 7)
    r_map = sw.entry_ratio_map(geom, jnp.maximum(p.near, 0.0), geom.dt_map)

    # ---------------- stage 1: b-axis halves, bf16 (XLA batched einsums).
    # Supersample == 1 => planes at integer slice indices: one take in sweep
    # order, no z-lerp (the z = Nk plane clamps to the edge slice).
    zi = jnp.clip(z, 0.0, Nk - 1).astype(jnp.int32)
    slices = jnp.take(mixed_s, zi, axis=0)  # (K, Na, Nb)
    Wb, _ = sw._batched_hat(off_b, sc_b, Nb, out_res, bcl, bch, bml, bmh)
    t1b = jnp.einsum("knb,kob->kno", slices.astype(jnp.bfloat16),
                     Wb.astype(jnp.bfloat16),
                     preferred_element_type=jnp.bfloat16)  # (K, Na, O)

    # Fused stream-0 slab: seg / baked-pred nearest-resampled halves are
    # CONCATENATED onto the intensity rows (row blocks [0:Na], [Na:2Na],
    # [..:+Na]) so each plane is ONE double-buffered DMA — see the
    # two-stream corruption note at the top of ``_make_kernel``.
    blocks = [t1b]

    def nearest_rows(vol_s):
        # out[k, n, o] = vol_s[zi[k], n, round(off_b[k] + o*sc_b[k])] as
        # TWO one-hot MXU matmuls (z-pick, then the nearest b-resample).
        # Exact for integer labels (one-hot dot sums exactly one term).
        # Deliberately NO jnp.take and NO gather:
        # - take(vol_s, zi) triggers a whole-program miscompile — the
        #   kernel's output corrupts at near-diagonal poses by ~40 dB even
        #   when the take's RESULT is numerically unused (multiplied by
        #   zero) — isolated by scripts/diag_overlay_bisect.py rows
        #   none/zeros/take-only/einsum-only on a real v5e; kernel inputs
        #   echoed from inside the kernel (scripts/diag_kernel_inputs.py)
        #   are bit-identical outside the full render program, so it is a
        #   compilation-environment effect, not kernel math;
        # - an advanced-index gather along the minor dim is scalarized on
        #   TPU (measured: 130 -> 1.6 fps at 1024^2/256^3).
        oz = (jnp.arange(Nk, dtype=jnp.float32)[None, :]
              == zi[:, None].astype(jnp.float32)).astype(jnp.bfloat16)
        picked = jnp.einsum("kz,znb->knb", oz, vol_s.astype(jnp.bfloat16),
                            preferred_element_type=jnp.bfloat16)
        Wbn = sw._batched_nearest(off_b, sc_b, Nb, out_res, bcl, bcn)
        return jnp.einsum("knb,kob->kno", picked,
                          Wbn.astype(jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)

    if has_seg and synth_seg:
        # Debug: synth_seg True/'zeros' = constant zero seg rows (no
        # take/einsum of seg_s); 'take' = keep the seg gather, drop the
        # einsum; 'einsum' = keep the nearest einsum on a zeros operand,
        # drop the gather. Isolates which XLA prep op triggers the
        # diagonal-pose corruption.
        if synth_seg == "take":
            segsl = jnp.take(seg_s, zi, axis=0).astype(jnp.bfloat16)
            blocks.append(jnp.zeros((n_planes, Na, out_res), jnp.bfloat16)
                          + (0.0 * jnp.sum(segsl)).astype(jnp.bfloat16))
        elif synth_seg == "einsum":
            segsl = jnp.zeros((n_planes, Na, Nb), jnp.bfloat16)
            Wbn = sw._batched_nearest(off_b, sc_b, Nb, out_res, bcl, bcn)
            blocks.append(jnp.einsum("knb,kob->kno", segsl,
                                     Wbn.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.bfloat16))
        else:
            blocks.append(jnp.zeros((n_planes, Na, out_res), jnp.bfloat16))
    elif has_seg:
        blocks.append(nearest_rows(seg_s))
    if pred_field is not None:
        t1pb = pred_field.astype(jnp.bfloat16)  # (n_fplanes, Op, fw_pad)
    elif pred_s is not None:
        blocks.append(nearest_rows(pred_s))
        t1pb = jnp.zeros((1, 8, 128), jnp.bfloat16)
    else:
        t1pb = jnp.zeros((1, 8, 128), jnp.bfloat16)
    t1b = blocks[0] if len(blocks) == 1 else jnp.concatenate(blocks, axis=1)
    assert t1b.shape[1] == n_rows, (t1b.shape, n_rows)

    near = jnp.maximum(p.near, 0.0)
    far = jnp.where(p.far > 0.0, p.far, jnp.float32(3e38))
    scalars = jnp.stack([
        p.ww, p.wl, p.gamma, p.intensity_alpha, near, far,
        jnp.where(p.show_seg > 0, 1.0, 0.0),
        jnp.where(p.show_pred > 0, 1.0, 0.0),
        bml, bmh, acl, ach, acn, aml, amh, jnp.float32(0)])

    n_ti = out_res // tile_i
    n_tj = out_res // tile_j
    # Per-tile max FINITE entry ratio: planes with q_m > rmax + 2 take the
    # kernel's entry fast path (correction provably identity there).
    r_fin = jnp.where(r_map < 1e37, r_map, -3e38)
    rtm = jnp.max(r_fin.reshape(n_ti, tile_i, n_tj, tile_j), axis=(1, 3))
    if force_slow:
        # Debug knob: q_m can never exceed 3e38, so every plane takes the
        # slow (full entry-correction) branch — isolates fast-path defects.
        rtm = jnp.full_like(rtm, 3e38)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # pp, scalars, lut, rtm
        grid=(n_ti, n_tj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # t1b (fused slab)
            pl.BlockSpec(memory_space=pl.ANY),  # t1pb (mode-2 field)
            pl.BlockSpec((tile_i, tile_j), lambda i, j, *s: (i, j)),  # vmag
            pl.BlockSpec((tile_i, tile_j), lambda i, j, *s: (i, j)),  # dt
            pl.BlockSpec((tile_i, tile_j), lambda i, j, *s: (i, j)),  # r
        ],
        out_specs=pl.BlockSpec((4, tile_i, tile_j),
                               lambda i, j, *s: (0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, tile_j), jnp.bfloat16),  # fused 2-buffer
            pltpu.VMEM((2, field_rows, field_w), jnp.bfloat16),  # field
            pltpu.VMEM((tile_i, tile_j), jnp.float32),  # C gray
            pltpu.VMEM((tile_i, tile_j), jnp.float32),  # L r
            pltpu.VMEM((tile_i, tile_j), jnp.float32),  # L g
            pltpu.VMEM((tile_i, tile_j), jnp.float32),  # L b
            pltpu.VMEM((tile_i, tile_j), jnp.float32),  # T
            pltpu.VMEM((tile_i, tile_j), jnp.float32),  # started (entry corr)
            pltpu.SMEM((2,), jnp.int32),  # [alive flag, plane counter]
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(n_planes, Na, out_res, tile_i, tile_j, has_seg, has_pred,
                     use_gamma, use_clip,
                     field_stride if pred_field is not None else 0,
                     field_kstride,
                     fw_pad if pred_field is not None else 0,
                     no_overlay=no_overlay, echo=echo),
        out_shape=jax.ShapeDtypeStruct((4, out_res, out_res), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(pp, scalars, p.lut.astype(jnp.float32), rtm, t1b, t1pb,
      geom.vmag, geom.dt_map, r_map)
    C = jnp.moveaxis(out[:3], 0, -1)
    T = out[3]
    return C, T
