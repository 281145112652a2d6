#!/usr/bin/env python
"""Bisect the Pallas kernel's seg-overlay defect at the diagonal pose.

Forensic (1024^2/256^3, TPU): kernel intensity path EXACT vs scan
(73.60 vs 73.61 dB) but with the seg overlay enabled the kernel drops to
40.66 dB vs scan's 64.05 — a gray (r=g=b) darkening dome above the tumor,
cut by a straight seam (tile boundary?). Rows:

  zeros-seg    seg volume all zero: the overlay must be a no-op
               (a_lab = 0 -> aS = 0). Dirty => stream/VMEM corruption.
  lut0-seg     real labels, LUT alphas zeroed: aS = 0 by data. Dirty =>
               the one-hot label pick itself corrupts T.
  real-seg     reference row (expected ~40.7 dB vs seg oracle).

Each prints PSNR vs the matching oracle and vs the scan compositor with
identical inputs.
"""
import pathlib as _pl
import sys
import time

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--vol", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--vmem", type=int, default=0,
                    help="force a small kernel VMEM budget (bytes) so the "
                         "grid goes multi-tile even at small --size")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.cpu or args.vmem:
        import functools

        from mri_raytracer_tpu.ops import pallas_composite as pc
        kw = {}
        if args.cpu:
            kw["interpret"] = True
        if args.vmem:
            kw["vmem_budget"] = args.vmem
        pc.sweep_composite_pallas = functools.partial(
            pc.sweep_composite_pallas, **kw)
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
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    SIZE = args.size
    VOL = (args.vol, args.vol, args.vol)
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    seg = jnp.asarray(seg.astype(np.int32))
    seg0 = jnp.zeros_like(seg)
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    lut0 = jnp.asarray(p.lut).at[:, 3].set(0.0)
    p_lut0 = p._replace(lut=lut0)

    def psnr(a, b):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
        return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))

    cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                        theta=0.85, phi=0.85)
    b = cam.basis()

    import functools

    import jax as _jax

    from mri_raytracer_tpu.ops import pallas_composite as pc
    base_pallas = pc.sweep_composite_pallas

    rows = [("none-seg", None, p, {}),
            ("zeros-seg", seg0, p, {}),
            ("take-only", seg0, p, {"synth_seg": "take"}),
            ("einsum-only", seg0, p, {"synth_seg": "einsum"}),
            ("real-seg", seg, p, {})]
    imgs = {}
    for name, s, pp, kw in rows:
        # kernel debug knobs are threaded by monkeypatch, which the jit
        # cache cannot see — clear caches so each row re-traces.
        pc.sweep_composite_pallas = functools.partial(
            base_pallas, **kw) if kw else base_pallas
        _jax.clear_caches()
        t0 = time.time()
        img_k = np.asarray(sw.render_brats(mods, s, None, b, pp, SIZE, SIZE,
                                           composite="pallas"))
        img_s = np.asarray(sw.render_brats(mods, s, None, b, pp, SIZE, SIZE,
                                           composite="scan"))
        imgs[name] = (img_k, img_s)
        print(f"[bisect] {name:10s} kernel-vs-scan PSNR "
              f"{psnr(img_k, img_s):6.2f} dB  ({time.time() - t0:.0f}s)",
              flush=True)
    # Which side MOVES when an all-zero seg stream is enabled? The overlay
    # is algebraically a no-op, so a correct implementation renders the
    # identical image with and without it.
    for side, idx in (("kernel", 0), ("scan", 1)):
        d = psnr(imgs["zeros-seg"][idx], imgs["none-seg"][idx])
        print(f"[bisect] {side}: zeros-seg vs none-seg PSNR {d:6.2f} dB "
              f"(inf = seg stream is a true no-op)", flush=True)


if __name__ == "__main__":
    main()
