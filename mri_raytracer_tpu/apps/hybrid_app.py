"""Cooperative hybrid renderer app (reference ``docs/Approach.md:48,172-205``
— the design-study hybrid the reference never built): volumetric primary
march of a BraTS-like case with the tumor's explicit boundary mesh answering
batched BVH shadow queries and seeding the empty-space skip."""

from __future__ import annotations

import argparse
import math
import pathlib
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="TPU hybrid volume+mesh renderer (mesh shadows)")
    ap.add_argument("--case", default=None,
                    help="BraTS case dir (NIfTI); default = synthetic")
    ap.add_argument("--shape", default="96,96,80",
                    help="synthetic volume shape")
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--max-steps", type=int, default=192)
    ap.add_argument("--light", default="1.0,0.6,0.4")
    ap.add_argument("--downsample", type=int, default=1,
                    help="any-pool the occluder mask to cap mesh size")
    ap.add_argument("--no-shadows", action="store_true")
    ap.add_argument("--no-skip", action="store_true",
                    help="disable the mesh-seeded empty-space skip")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="renders/hybrid")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize forces the "
                    "TPU platform, so an env var alone is not enough)")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.render.hybrid import HybridRenderer
    from mri_raytracer_tpu.utils.profiling import FPSMeter, sync

    if args.case:
        mods, seg = brats.load_case(pathlib.Path(args.case))
    else:
        shape = tuple(int(x) for x in args.shape.split(","))
        mods, seg = synthetic.synthetic_case(shape, seed=0)
    vol = np.stack([brats.percentile_normalize(m) for m in mods]).mean(0)
    mask = np.asarray(seg) > 0

    light = tuple(float(x) for x in args.light.split(","))
    r = HybridRenderer(vol.astype(np.float32), mask, width=args.width,
                       height=args.height, light_dir=light,
                       max_steps=args.max_steps,
                       downsample=args.downsample)
    print(f"[app] occluder mesh: {r.n_tris} tris "
          f"(downsample={args.downsample})")

    cam = OrbitalCamera(radius=3.0, theta=math.pi, phi=1.1)
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    meter = FPSMeter()
    for i in range(args.frames):
        img = r.render(cam.basis(), shadows=not args.no_shadows,
                       mesh_skip=not args.no_skip)
        sync(img)
        meter.tick()
        arr = np.clip(np.asarray(img), 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            out_dir / f"frame_{i:04d}.png")
        cam.orbit(2 * math.pi / args.frames, 0.0)
    print(f"[app] {args.frames} frames -> {out_dir} (fps ~{meter.fps:.1f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
