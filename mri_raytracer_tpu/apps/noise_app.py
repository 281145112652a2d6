"""2-D simplex-noise demo app (reference H7, ``scripts/slang_test/test.py``
hosting ``draw.slang``) — the environment smoke test: animate the noise
demo, write PNG frames (the reference's F2 screenshot path,
``test.py:59-76``), optionally a GIF. Pointer interaction is exposed as a
``--mouse x,y`` flag (the offline analog of the mouse-move callback)."""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU 2-D simplex-noise demo")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--noise-scale", type=float, default=4.0)
    ap.add_argument("--noise-amount", type=float, default=0.08)
    ap.add_argument("--mouse", default=None,
                    help="'x,y' pixel position of the red pointer highlight")
    ap.add_argument("--mouse-radius", type=float, default=64.0)
    ap.add_argument("--gif", action="store_true",
                    help="also write demo.gif next to the frames")
    ap.add_argument("--out", default="renders/noise2d")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from PIL import Image

    from mri_raytracer_tpu.ops.noise2d import render_noise_demo

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    mouse = None
    if args.mouse:
        mouse = jnp.asarray([float(v) for v in args.mouse.split(",")],
                            jnp.float32)
    frames = []
    for i in range(args.frames):
        img = render_noise_demo(args.width, args.height,
                                time=i / args.fps, mouse_pos=mouse,
                                mouse_radius=args.mouse_radius,
                                noise_scale=args.noise_scale,
                                noise_amount=args.noise_amount)
        arr = np.clip(np.asarray(img), 0.0, 1.0)
        # sRGB encode before the 8-bit write, like the reference's F2 path
        # (test.py:70-75 converts with srgb_gamma=True).
        srgb = np.where(arr <= 0.0031308, arr * 12.92,
                        1.055 * np.power(arr, 1.0 / 2.4) - 0.055)
        u8 = (srgb * 255).astype(np.uint8)
        Image.fromarray(u8).save(out / f"frame_{i:04d}.png")
        frames.append(u8)
    if args.gif:
        ims = [Image.fromarray(f) for f in frames]
        ims[0].save(out / "demo.gif", save_all=True, append_images=ims[1:],
                    duration=int(1000 / args.fps), loop=0)
    print(f"[noise2d] {args.frames} frames -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
