"""u8 grid volume renderer app (reference H2,
``scripts/volumeRendering/app.py``): r8/bc4/NIfTI sources, occupancy/labels
modes, auto-rotate orbit, step-count control."""

from __future__ import annotations

import argparse
import math
import pathlib
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU u8 grid volume renderer")
    ap.add_argument("--volume", help="raw u8/.gz, BC4, or NIfTI volume")
    ap.add_argument("--format", default="r8", choices=["r8", "bc4"])
    ap.add_argument("--dims", help="X,Y,Z for raw formats (reference demo: "
                    "180,216,180)")
    ap.add_argument("--nii", help="NIfTI volume (alternative source)")
    ap.add_argument("--mode", default="occupancy", choices=["occupancy", "labels"])
    ap.add_argument("--render-mode", default="composite",
                    choices=["composite", "mip", "iso"],
                    help="composite (reference accumulation), mip "
                    "(maximum-intensity projection), or iso "
                    "(Phong-shaded iso-surface)")
    ap.add_argument("--iso", type=float, default=0.25,
                    help="iso mode: surface threshold in [0, 1]")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--steps", type=float, default=64.0,
                    help="march steps (reference slider 16-512)")
    ap.add_argument("--fov", type=float, default=72.0)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="renders/volume")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from PIL import Image

    from mri_raytracer_tpu.data import synthetic
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.render.volume import GridVolumeRenderer, load_volume
    from mri_raytracer_tpu.utils.profiling import FPSMeter, sync

    if args.synthetic or not (args.volume or args.nii):
        vol = synthetic.synthetic_u8_volume((96, 96, 96), seed=0)
    elif args.nii:
        vol = load_volume(args.nii, mode=args.mode)
    else:
        dims = tuple(int(x) for x in args.dims.split(",")) if args.dims else None
        vol = load_volume(args.volume, fmt=args.format, dims=dims, mode=args.mode)

    r = GridVolumeRenderer(vol, width=args.width, height=args.height)
    cam = OrbitalCamera(radius=3.0, fov_y=math.radians(args.fov))
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    meter = FPSMeter()
    for i in range(args.frames):
        img = r.render(cam.basis(), step_count=args.steps,
                       mode=args.render_mode, iso=args.iso)
        sync(img)
        meter.tick()
        arr = np.clip(np.asarray(img), 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            out_dir / f"frame_{i:04d}.png")
        cam.orbit(2 * math.pi / args.frames, 0.0)  # auto-rotate
    print(f"[app] {args.frames} frames -> {out_dir} (fps ~{meter.fps:.1f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
