#!/usr/bin/env python
"""Diagonal-pose quality forensic at the FULL bench configuration.

BENCH_r03 measured 40.7 dB at theta=phi=0.85 (vs 65 dB at every other
pose) while the 256^2/96^3 CPU preview of the same pose measures 54.7 dB.
This script decomposes the gap at 1024^2/256^3 by rendering the diagonal
(and one face pose as control) under ablations:

  pallas            production path (what bench measures)
  scan              same sweep math, XLA scan compositor, fp32 resample
  scan-ss2          scan with k-supersample 2 (halves the 1/lam ~ 1.73 vox
                    effective step at the diagonal -> quadrature test)
  *-intensity       same, seg overlay off (label-overlay contribution)

Each row prints PSNR vs the lockstep oracle (dt = 1 voxel), isolating
  pallas vs scan      -> bf16 resample / kernel numerics
  scan vs scan-ss2    -> plane-spacing quadrature error
  seg on vs off       -> nearest-label overlay error
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
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (TPU may be busy)")
    ap.add_argument("--dump", default=None,
                    help="directory to dump each row's image + the oracle "
                    "as .npy (cross-backend oracle comparison)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.ops import raymarch_xla, shearwarp as sw
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    SIZE = args.size
    VOL = (args.vol, args.vol, args.vol)
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    seg = jnp.asarray(seg.astype(np.int32))
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    dt_oracle = float(np.min(np.asarray(p.voxel_size)))
    p_o = p._replace(step_size=np.float32(dt_oracle))
    p_noseg = p._replace(show_seg=np.float32(0.0))
    p_o_noseg = p_o._replace(show_seg=np.float32(0.0))

    def psnr(a, b):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
        return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))

    poses = [("diagonal", 0.85, 0.85), ("orbit", 0.6, 1.2)]
    for name, th, ph in poses:
        cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                            theta=th, phi=ph)
        b = cam.basis()
        t0 = time.time()
        oracle = np.asarray(raymarch_xla.render_brats(
            mods, seg, None, b, p_o, SIZE, SIZE, max_steps=640))
        oracle_i = np.asarray(raymarch_xla.render_brats(
            mods, None, None, b, p_o_noseg, SIZE, SIZE, max_steps=640))
        print(f"[diag] {name}: oracle done ({time.time() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        if args.dump:
            dd = _pl.Path(args.dump)
            dd.mkdir(parents=True, exist_ok=True)
            np.save(dd / f"{name}_oracle.npy", oracle)
            np.save(dd / f"{name}_oracle_i.npy", oracle_i)

        on_tpu = jax.default_backend() == "tpu"
        rows = [
            # exact bench path: BratsRenderer with content crop + slab
            ("renderer", None, oracle),
            # pallas rows only on TPU (CPU raises without interpret mode)
            *([("pallas", dict(seg=seg, pp=p, composite="pallas"), oracle)]
              if on_tpu else []),
            ("scan", dict(seg=seg, pp=p, composite="scan"), oracle),
            ("scan-ss2", dict(seg=seg, pp=p, composite="scan",
                              supersample=2), oracle),
            *([("pallas-intensity", dict(seg=None, pp=p_noseg,
                                         composite="pallas"), oracle_i)]
              if on_tpu else []),
            ("scan-intensity", dict(seg=None, pp=p_noseg,
                                    composite="scan"), oracle_i),
            ("scan-ss2-intensity", dict(seg=None, pp=p_noseg,
                                        composite="scan",
                                        supersample=2), oracle_i),
        ]
        for label, kw, ref in rows:
            t0 = time.time()
            if label == "renderer":
                from mri_raytracer_tpu.render.brats import BratsRenderer

                r = BratsRenderer(mods, seg, None, width=SIZE, height=SIZE)
                img = np.asarray(r.render(b, p))
            else:
                img = np.asarray(sw.render_brats(
                    mods, kw["seg"], None, b, kw["pp"], SIZE, SIZE,
                    composite=kw["composite"],
                    supersample=kw.get("supersample", 1)))
            print(f"[diag] {name:9s} {label:20s} PSNR {psnr(img, ref):6.2f} "
                  f"dB  ({time.time() - t0:.0f}s)", flush=True)
            if args.dump:
                np.save(_pl.Path(args.dump) / f"{name}_{label}.npy", img)


if __name__ == "__main__":
    main()
