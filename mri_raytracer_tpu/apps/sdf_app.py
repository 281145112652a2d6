"""SDF sphere-tracer app (reference H6, ``scripts/raymarch/app.py``):
slider-equivalents as flags (maxSteps / maxDistance / hitThreshold /
normalEps)."""

from __future__ import annotations

import argparse
import math
import pathlib
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU analytic SDF sphere tracer")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--max-steps", type=int, default=96)
    ap.add_argument("--max-distance", type=float, default=20.0)
    ap.add_argument("--hit-threshold", type=float, default=1e-3)
    ap.add_argument("--normal-eps", type=float, default=1e-3)
    ap.add_argument("--fov", type=float, default=55.0)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="renders/sdf")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from PIL import Image

    from mri_raytracer_tpu.ops import sdf
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.utils.profiling import FPSMeter, sync

    p = sdf.default_sdf_params(args.max_steps, args.max_distance,
                               args.hit_threshold, args.normal_eps)
    cam = OrbitalCamera(radius=2.5, fov_y=math.radians(args.fov))
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    meter = FPSMeter()
    for i in range(args.frames):
        img = sdf.render_sdf(cam.basis(), p, args.width, args.height,
                             max_steps=args.max_steps)
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
