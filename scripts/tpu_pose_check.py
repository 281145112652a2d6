#!/usr/bin/env python
"""Real-TPU pose regression check for the fused render pipeline.

The kernel-coexistence corruption class (stray Pallas kernels / DMA
streams corrupting the fused compositor at near-diagonal poses) has
bitten three times and is invisible to CPU interpret-mode golden tests
(r2: two-stream DMA; r3: take-based z-pick; r4: the Pallas warp kernel's
gated presence — scripts/diag_flags.py, 40.66 vs 64.05 dB). This check
renders the production ``BratsRenderer`` path at the historical worst
poses at FULL bench scale and compares against the same compositing math
with the Pallas warp forced off (gather warp): the two differ only by
warp interpolation rounding, so any coexistence regression shows up as a
PSNR collapse. Exits nonzero on failure — run from
``scripts/tpu_measure_all.sh`` before the bench.
"""
import pathlib as _pl
import sys
import time

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

FLOOR_DB = 50.0
POSES = [("diagonal", 0.85, 0.85), ("orbit", 0.6, 1.2), ("top", 0.3, 0.12)]


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--vol", type=int, default=256)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.ops import shearwarp as sw
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.brats import BratsRenderer
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    if jax.default_backend() != "tpu":
        print("[pose-check] SKIP: not on TPU", flush=True)
        return 0

    SIZE = args.size
    VOL = (args.vol,) * 3
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    seg = jnp.asarray(seg.astype(np.int32))
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    r = BratsRenderer(mods, seg, None, width=SIZE, height=SIZE)

    failures = []
    for name, th, ph in POSES:
        cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                            theta=th, phi=ph)
        b = cam.basis()
        t0 = time.time()
        img = np.asarray(r.render(b, p))
        # Same prepared volumes + compositing, gather warp (no Pallas warp
        # kernel anywhere): the coexistence-free reference.
        axis = sw.dominant_axis(b)
        # Rebuild the renderer's exact crop/out_res decisions from its own
        # prep cache (key = (axis, crops, blend...)).
        cache_key = [k for k in r._prep_cache if k[0] == axis][0]
        (mixed_s, seg_s, pred_s), (z_dev, ab_dev) = r._prep_cache[cache_key]
        crops = cache_key[1]
        order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
        dims_perm = [int(mods.shape[1 + o]) for o in order]
        nk, na_g, nb_g = dims_perm
        (k_lo, k_hi), (a_lo, a_hi), (b_lo, b_hi) = crops
        inplane_cropped = (a_lo, a_hi, b_lo, b_hi) != (0, na_g, 0, nb_g)
        if inplane_cropped:
            frac = max((a_hi - a_lo) / na_g, (b_hi - b_lo) / nb_g)
            out_res = min(SIZE, max(128, -(-int(SIZE * frac) // 128) * 128))
        else:
            out_res = SIZE
        slab = (k_lo, k_hi) != (0, nk)
        zeros = jnp.zeros((1, 1, 1), jnp.int32)
        z_off = jnp.float32(k_lo) if slab else None
        ab = ((jnp.float32(a_lo), jnp.float32(b_lo))
              if inplane_cropped else None)
        C = sw._render_prepared(
            mixed_s, seg_s if seg_s is not None else zeros,
            pred_s if pred_s is not None else zeros, b.pack(), p, axis,
            SIZE, SIZE, out_res, 1, seg_s is not None, pred_s is not None,
            False, False, False, "pallas", z_off, nk if slab else None,
            ab, (na_g, nb_g) if inplane_cropped else None, warp=False)
        ref = np.asarray(sw.warp_program(
            C, b.pack(), p, axis, SIZE, SIZE, out_res,
            tuple(int(d) for d in mixed_s.shape), z_off,
            nk if slab else None, ab,
            (na_g, nb_g) if inplane_cropped else None, use_pallas=False))
        mse = float(np.mean((np.clip(img, 0, 1) - np.clip(ref, 0, 1)) ** 2))
        db = 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))
        ok = db >= FLOOR_DB
        print(f"[pose-check] {name:9s} prod-vs-gather {db:6.2f} dB "
              f"(floor {FLOOR_DB}) {'OK' if ok else 'FAIL'} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if not ok:
            failures.append((name, db))
        if name == "diagonal":
            # Compositor cross-check: the same frame through the XLA scan
            # compositor (no Pallas kernels at all) — catches fused-
            # compositor corruption, not just warp corruption.
            t0 = time.time()
            scan = np.asarray(sw.render_prepared(
                mixed_s, seg_s, pred_s, b, p, axis, SIZE, SIZE, out_res,
                composite="scan", use_gamma=False, use_clip=False,
                z_offset=z_off, nk_global=nk if slab else None,
                ab_offset=ab,
                inplane_global=(na_g, nb_g) if inplane_cropped else None))
            mse = float(np.mean((np.clip(img, 0, 1)
                                 - np.clip(scan, 0, 1)) ** 2))
            db2 = 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))
            ok2 = db2 >= 45.0
            print(f"[pose-check] {name:9s} prod-vs-scan   {db2:6.2f} dB "
                  f"(floor 45.0) {'OK' if ok2 else 'FAIL'} "
                  f"({time.time() - t0:.0f}s)", flush=True)
            if not ok2:
                failures.append((name + "-scan", db2))
    if failures:
        print(f"[pose-check] FAIL: {failures}", flush=True)
        return 1
    print("[pose-check] all poses OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
