#!/usr/bin/env python
"""Showcase orbit videos (reference ``docs/showcase-plan.md:31-33``:
"60-second sizzle: split-screen baseline vs. ours ... moving camera").

Exports animated GIFs (no ffmpeg in this image; GIF is the portable
deliverable — every renderer below also works frame-by-frame for an
external encoder):

  docs/img/roi_orbit_<scene>.gif   split-screen: tuned fixed-step B1 (left)
                                   vs the policy renderer at its operating
                                   point (right), camera orbiting
  docs/img/brats_orbit.gif         production BraTS renderer orbit
                                   (intensity + GT seg overlay) — the
                                   "GT vs INR" sizzle analog

Operating points come from docs/roi_results.json; the policy from
docs/roi_policy.npz (the validation-selected checkpoint).
"""
import argparse
import json
import pathlib as _pl
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def _to_u8(img):
    import numpy as np

    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype("uint8")


def _label(frame_u8, text):
    from PIL import Image, ImageDraw

    im = Image.fromarray(frame_u8)
    d = ImageDraw.Draw(im)
    w = im.size[0]
    d.rectangle([0, 0, w, 14], fill=(0, 0, 0))
    d.text((4, 2), text, fill=(255, 255, 255))
    return im


def _save_gif(frames, path, fps=12):
    path = _pl.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0, optimize=True)
    print(f"[video] wrote {path} ({len(frames)} frames)")


def roi_orbit_gifs(docs, res, n_frames, fps):
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from mri_raytracer_tpu.eval import roi_protocol
    from mri_raytracer_tpu.ops import roi_policy

    results = json.loads((docs / "roi_results.json").read_text())
    pol = roi_policy.load_policy(docs / "roi_policy.npz")
    meta = json.loads((docs / "roi_policy_meta.json").read_text())
    n_coarse = int(meta.get("n_coarse", 48))
    # Probe stride scales with the RENDER resolution — the meta value was
    # recorded at the protocol's 1920px and is wrong for GIF-sized frames.
    stride = roi_protocol.auto_probe_stride(res)
    verdicts = {v["scene"]: v for v in results.get("verdicts", [])}
    shape = (96, 96, 80)
    for sc in roi_protocol.build_scenes(shape):
        v = verdicts.get(sc["name"])
        if v is None or not v.get("counts_toward_bar", True):
            continue
        n_b1 = v["tuned_n"]
        n_pol = v.get("policy_n") or n_b1
        st = roi_protocol.scene_tuple(sc)
        p = sc["params"]
        frames = []
        for i in range(n_frames):
            f = i / n_frames
            th = 2 * np.pi * f
            ph = 0.9 + 0.4 * np.sin(2 * np.pi * f)
            from mri_raytracer_tpu.render.camera import OrbitalCamera

            bv = jnp.asarray(OrbitalCamera(radius=sc["radius"],
                                           theta=float(th), phi=float(ph))
                             .basis().pack())
            b1, _ = roi_policy.render_fixed(st[0], bv, p, res, res, n_b1)
            ours, _ = roi_policy.render_policy(pol, *st, bv, p, res, res,
                                               n_coarse, n_pol,
                                               probe_stride=stride)
            left = _label(_to_u8(b1), f"B1 fixed n={n_b1}")
            right = _label(_to_u8(ours),
                           f"policy n={n_pol} ({v['speedup']:.2f}x)")
            gap = Image.new("RGB", (4, res), (255, 255, 255))
            canvas = Image.new("RGB", (2 * res + 4, res))
            canvas.paste(left, (0, 0))
            canvas.paste(gap, (res, 0))
            canvas.paste(right, (res + 4, 0))
            frames.append(canvas)
        _save_gif(frames, docs / "img" / f"roi_orbit_{sc['name']}.gif", fps)


def brats_orbit_gif(docs, res, n_frames, fps):
    import numpy as np
    import jax.numpy as jnp

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.brats import BratsRenderer
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    VOL = (128, 128, 128)
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods_disp = np.stack([brats.percentile_normalize(m) for m in mods])
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    r = BratsRenderer(jnp.asarray(mods_disp),
                      jnp.asarray(seg.astype(np.int32)), None,
                      width=res, height=res)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                        theta=0.0, phi=1.1)
    frames = []
    for i in range(n_frames):
        cam.orbit(2 * 3.14159 / n_frames, 0.25 * np.sin(i / 6.0) / 8)
        img = r.render(cam.basis(), p)
        frames.append(_label(_to_u8(img), "mri_raytracer_tpu orbit"))
    _save_gif(frames, docs / "img" / "brats_orbit.gif", fps)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=384)
    ap.add_argument("--frames", type=int, default=72)
    ap.add_argument("--fps", type=int, default=12)
    ap.add_argument("--which", default="all", choices=["all", "roi", "brats"])
    ap.add_argument("--docs", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the container's "
                    "sitecustomize forces the TPU platform, so an env var "
                    "alone is not enough)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    docs = _pl.Path(args.docs or
                    _pl.Path(__file__).resolve().parents[1] / "docs")
    if args.which in ("all", "roi"):
        roi_orbit_gifs(docs, args.res, args.frames, args.fps)
    if args.which in ("all", "brats"):
        brats_orbit_gif(docs, args.res, args.frames, args.fps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
