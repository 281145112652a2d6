"""BraTS viewer app (reference H1, ``inr/viewer/brats_viewer.py``) as an
offline/headless CLI: orbit-frame rendering with every interactive control
exposed as a flag, INR checkpoint loading ('Load INR & Predict' parity), and
an FPS meter. On TPU there is no window system; the deliverable is frames
(PNGs / MP4) plus timing — the notebook widget front-end lives in
``render/widgets.py``.
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="TPU BraTS multi-modal volume viewer")
    ap.add_argument("--case-dir", help="BraTS case directory (modality NIfTIs)")
    ap.add_argument("--synthetic", action="store_true",
                    help="render a synthetic case (no data needed)")
    ap.add_argument("--synthetic-shape", default="128,128,112")
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--out", default="renders/brats")
    ap.add_argument("--mp4", action="store_true", help="also write orbit.mp4")
    # Reference UI sliders -> flags (brats_viewer.py:163-176)
    ap.add_argument("--fov", type=float, default=55.0)
    ap.add_argument("--near", type=float, default=0.0)
    ap.add_argument("--far", type=float, default=0.0)
    ap.add_argument("--step", type=float, default=0.05)
    ap.add_argument("--alpha", type=float, default=None,
                    help="intensity alpha (default 0.4)")
    ap.add_argument("--ww", type=float, default=None)
    ap.add_argument("--wl", type=float, default=None)
    ap.add_argument("--gamma", type=float, default=None)
    ap.add_argument("--preset", default=None,
                    help="named transfer-function preset "
                    "(render/presets.py); explicit ww/wl/alpha/gamma "
                    "flags override the preset's values, matching the "
                    "HTTP /frame endpoint's precedence")
    ap.add_argument("--modalities", default="1,1,1,1",
                    help="enable flags for t1n,t1c,t2w,t2f")
    ap.add_argument("--weights", default="1,1,1,1")
    ap.add_argument("--show-seg", action="store_true", default=True)
    ap.add_argument("--no-seg", dest="show_seg", action="store_false")
    ap.add_argument("--inr-checkpoint", help="npz checkpoint; bakes a "
                    "prediction volume and overlays it (mode 1)")
    ap.add_argument("--neural-march", action="store_true",
                    help="evaluate the INR inside the march (mode 2)")
    ap.add_argument("--backend", default="auto", choices=["auto", "sweep", "sweep_pallas", "xla"])
    ap.add_argument("--theta0", type=float, default=0.6)
    ap.add_argument("--phi0", type=float, default=1.2)
    ap.add_argument("--d-theta", type=float, default=None,
                    help="orbit step per frame (default: full turn)")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax.numpy as jnp
    from PIL import Image

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.brats import BratsRenderer
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.utils.profiling import FPSMeter, sync

    # ------------------------------------------------------------- data
    if args.synthetic or not args.case_dir:
        shape = tuple(int(x) for x in args.synthetic_shape.split(","))
        mods_raw, seg = synthetic.synthetic_case(shape, seed=0)
    else:
        mods_raw, seg = brats.load_case(pathlib.Path(args.case_dir),
                                        normalization="none")
    mods_disp = np.stack([brats.percentile_normalize(m) for m in mods_raw])
    shape = mods_disp.shape[1:]

    pred = None
    model = params = mods_z = None
    if args.inr_checkpoint or args.neural_march:
        from mri_raytracer_tpu.config import ModelConfig
        from mri_raytracer_tpu.io import checkpoint as ckpt
        from mri_raytracer_tpu.models.api import build_model

        params, cfg = ckpt.model_load(args.inr_checkpoint)
        mc = ModelConfig()
        if "model" in cfg and isinstance(cfg["model"], dict):
            for k, v in cfg["model"].items():
                if hasattr(mc, k):
                    setattr(mc, k, tuple(v) if isinstance(v, list) else v)
        elif "FOURIER_FREQS" in cfg:
            mc.fourier_freqs = cfg["FOURIER_FREQS"]
            mc.num_classes = cfg.get("NUM_CLASSES", 4)
            mc.hidden_dims = tuple(cfg.get("HIDDEN_DIMS", [64] * 4))
        model = build_model(mc, num_modalities=mods_disp.shape[0])
        # Re-apply TRAINING normalization before inference, exactly like the
        # viewer's Load-INR path (brats_viewer.py:278-289).
        mods_z = np.stack([brats.zscore_nonzero(m.copy()) for m in mods_raw])
        if not args.neural_march:
            from mri_raytracer_tpu.eval.inference import predict_volume

            pred, _ = predict_volume(model, params,
                                     {"mods": mods_z, "seg": seg})
            print(f"[app] baked INR prediction: classes "
                  f"{np.bincount(pred.reshape(-1), minlength=4)}")

    # ------------------------------------------------------------ params
    enabled = [float(x) for x in args.modalities.split(",")]
    weights = [float(x) for x in args.weights.split(",")]
    p = rp.default_render_params(
        shape, step_size=args.step, show_seg=args.show_seg,
        show_pred=pred is not None or args.neural_march,
        vol_enabled=enabled, vol_weight=weights, near=args.near,
        far=args.far)
    if args.preset:
        from mri_raytracer_tpu.render.presets import apply_preset

        p = apply_preset(p, args.preset)
    # Explicit flags override the preset (same precedence as /frame).
    overrides = {k: np.float32(v) for k, v in
                 (("ww", args.ww), ("wl", args.wl),
                  ("intensity_alpha", args.alpha),
                  ("gamma", args.gamma)) if v is not None}
    if overrides:
        p = p._replace(**overrides)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, shape),
                        theta=args.theta0, phi=args.phi0,
                        fov_y=math.radians(args.fov))

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    d_theta = args.d_theta if args.d_theta is not None else \
        2 * math.pi / max(args.frames, 1)

    meter = FPSMeter()
    frames = []
    if args.neural_march:
        from mri_raytracer_tpu.ops.neural_march import render_brats_neural

        seg_j = jnp.asarray(seg.astype(np.int32)) if args.show_seg else None
        for i in range(args.frames):
            img = render_brats_neural(jnp.asarray(mods_disp),
                                      jnp.asarray(mods_z), seg_j, model,
                                      params, cam.basis(), p,
                                      args.width, args.height)
            sync(img)
            meter.tick()
            frames.append(np.clip(np.asarray(img), 0, 1))
            cam.orbit(d_theta, 0.0)
    else:
        renderer = BratsRenderer(
            jnp.asarray(mods_disp),
            jnp.asarray(seg.astype(np.int32)) if args.show_seg else None,
            None if pred is None else jnp.asarray(pred.astype(np.int32)),
            width=args.width, height=args.height, backend=args.backend)
        renderer.warmup(p)
        for i in range(args.frames):
            img = renderer.render(cam.basis(), p)
            sync(img)
            meter.tick()
            frames.append(np.clip(np.asarray(img), 0, 1))
            cam.orbit(d_theta, 0.0)

    for i, f in enumerate(frames):
        Image.fromarray((f * 255).astype(np.uint8)).save(
            out_dir / f"frame_{i:04d}.png")
    if args.mp4:
        import imageio.v3 as iio

        iio.imwrite(out_dir / "orbit.mp4",
                    [(f * 255).astype(np.uint8) for f in frames], fps=24)
    print(f"[app] {len(frames)} frames -> {out_dir}  (fps ~{meter.fps:.1f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
