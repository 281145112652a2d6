#!/usr/bin/env python
"""Full-geometry end-to-end smoke: the REAL BraTS case shape
(240 x 240 x 155, 4 modalities + seg — ``docs/Goals.md:139-152``) through
the complete pipeline: dataset write -> native/python loader -> INR training
-> full-volume bake -> TPU render orbit. Records wall-clock per stage.

Usage: python scripts/full_geometry_smoke.py [--steps 60] [--size 1024]
Appends a timing table to docs/RESULTS_r2.md with --write-doc.
"""
import argparse
import json
import pathlib as _pl
import sys
import time

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/fullgeo_data")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--cases", type=int, default=3)
    ap.add_argument("--write-doc", action="store_true")
    args = ap.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.config import TrainConfig
    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.eval.inference import predict_volume
    from mri_raytracer_tpu.io import native
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.brats import BratsRenderer
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.train.engine import train_inr

    SHAPE = (240, 240, 155)  # real BraTS 2023 geometry
    timings = {}
    root = _pl.Path(args.root)

    t0 = time.perf_counter()
    if len(brats.find_cases(root)) < args.cases:
        synthetic.write_synthetic_dataset(root, num_cases=args.cases,
                                          shape=SHAPE, seed=0)
    timings["dataset_write_s"] = time.perf_counter() - t0
    print(f"[fg] dataset at {root} ({args.cases} cases of {SHAPE}) "
          f"in {timings['dataset_write_s']:.1f}s; native loader: "
          f"{native.available()}", file=sys.stderr)

    # ---- loader (the native C++ fast path when built)
    t0 = time.perf_counter()
    from mri_raytracer_tpu.data.cache import RAMCache

    cache = RAMCache(brats.find_cases(root), verbose=False)
    timings["load_all_cases_s"] = time.perf_counter() - t0
    assert cache.vol_shape == SHAPE, cache.vol_shape
    print(f"[fg] loaded {cache.n_cases} cases in "
          f"{timings['load_all_cases_s']:.1f}s", file=sys.stderr)

    # ---- training at full geometry
    cfg = TrainConfig()
    cfg.data.data_root = str(root)
    cfg.data.case_limit = args.cases
    cfg.data.num_folds = args.cases
    cfg.data.pool_size = max(2, args.cases - 1)
    cfg.model.hidden_dims = (64, 64, 64)
    cfg.train_steps = args.steps
    cfg.global_batch = 16384
    cfg.micro_batch = 8192
    cfg.checkpoint_every = 0
    cfg.out_dir = "/tmp/fullgeo_run"
    cfg.run_name = "fullgeo"
    t0 = time.perf_counter()
    state = train_inr(cfg, use_wandb=False)
    timings["train_s"] = time.perf_counter() - t0
    steps_per_s = args.steps / timings["train_s"]
    print(f"[fg] {args.steps} steps in {timings['train_s']:.1f}s "
          f"({steps_per_s:.2f} steps/s at global batch {cfg.global_batch})",
          file=sys.stderr)

    # ---- bake prediction volume (9.6M voxel forward passes per case)
    case = cache.get(0)
    t0 = time.perf_counter()
    pred, _ = predict_volume(state["model"], state["params"], case)
    timings["bake_s"] = time.perf_counter() - t0
    classes = np.unique(pred)
    print(f"[fg] baked {pred.shape} prediction in {timings['bake_s']:.1f}s "
          f"(classes {classes})", file=sys.stderr)

    # ---- render orbit at full (non-cubic!) geometry
    disp = np.stack([brats.percentile_normalize(m) for m in case["mods"]])
    p = rp.default_render_params(SHAPE, show_seg=True, show_pred=True)
    renderer = BratsRenderer(jnp.asarray(disp),
                             jnp.asarray(case["seg"].astype(np.int32)),
                             jnp.asarray(pred.astype(np.int32)),
                             width=args.size, height=args.size)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, SHAPE),
                        theta=0.6, phi=1.2)
    t0 = time.perf_counter()
    renderer.warmup(p)
    timings["render_compile_s"] = time.perf_counter() - t0
    img = renderer.render(cam.basis(), p)
    float(jnp.sum(img))
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.frames):
            cam.orbit(0.03, 0.01)
            img = renderer.render(cam.basis(), p)
        float(jnp.sum(img))
        rates.append(args.frames / (time.perf_counter() - t0))
    fps = float(np.median(rates))
    timings["render_fps"] = fps
    print(f"[fg] render {args.size}^2 on {SHAPE}: {fps:.1f} fps "
          f"(backend {renderer.backend})", file=sys.stderr)

    assert np.isfinite(np.asarray(img)).all()
    rec = {"metric": "full_geometry_fps", "value": round(fps, 2),
           "unit": "fps", "shape": list(SHAPE),
           **{k: round(v, 2) for k, v in timings.items()}}
    print(json.dumps(rec))
    if args.write_doc:
        doc = _pl.Path(__file__).resolve().parents[1] / "docs" / "RESULTS_r2.md"
        with open(doc, "a") as f:
            f.write(f"\n## Full BraTS geometry smoke (240x240x155 x4)\n\n"
                    f"| stage | time |\n|---|---|\n"
                    f"| load {cache.n_cases} cases "
                    f"({'native C++' if native.available() else 'python'}) | "
                    f"{timings['load_all_cases_s']:.1f} s |\n"
                    f"| train {args.steps} steps @ global {cfg.global_batch} |"
                    f" {timings['train_s']:.1f} s "
                    f"({steps_per_s:.2f} steps/s) |\n"
                    f"| bake 240x240x155 prediction | {timings['bake_s']:.1f}"
                    f" s |\n"
                    f"| render orbit {args.size}^2 | **{fps:.1f} fps** |\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
