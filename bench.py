"""Benchmark: BraTS volume-render throughput on the current backend.

North-star (BASELINE.md): >= 30 fps at 1024x1024 on a 256^3 BraTS-like volume
per TPU chip. Prints ONE JSON line:
  {"metric": "render_fps_1024_256", "value": N, "unit": "fps", "vs_baseline": N/30}

Runs the fastest available renderer backend; golden-image parity of that
backend vs the XLA oracle is enforced by the test suite. This script also
measures PSNR vs the oracle at the FULL bench configuration over a mini
pose sweep (orbit faces + the worst-case diagonal) and reports min/median
with the worst pose named, so the recorded quality artifact cannot flatter
a single lucky camera.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    # Persist compiled executables across bench runs (first compile of the
    # 1024^2 pipeline is minutes on a remote-attached backend).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from mri_raytracer_tpu.data import synthetic, brats
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.render.brats import BratsRenderer

    SIZE = 1024
    VOL = (256, 256, 256)
    # Median over batches rides out tunnel noise; the long warmup matters —
    # the first post-compile batch consistently measures ~20% slow until the
    # dispatch pipeline settles.
    WARMUP, ITERS, BATCHES = 15, 15, 7

    print(f"[bench] backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods_disp = np.stack([brats.percentile_normalize(m) for m in mods])
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL), theta=0.6, phi=1.2)

    renderer = BratsRenderer(jnp.asarray(mods_disp), jnp.asarray(seg.astype(np.int32)),
                             None, width=SIZE, height=SIZE)

    # Warmup compiles every sweep-axis variant, then timed orbit frames with
    # the camera moving each frame like the interactive loop (no recompiles —
    # params are arrays; axis flips hit pre-compiled variants).
    renderer.warmup(p)
    for i in range(WARMUP):
        cam.orbit(0.03, 0.0)
        img = renderer.render(cam.basis(), p)
    img.block_until_ready()

    import jax.numpy as jnp

    def sync(x):
        # On remote-attached backends block_until_ready can be a no-op; a
        # scalar readback provably waits for every queued frame (the device
        # stream is in-order).
        return float(jnp.sum(x))

    sync(img)
    rates = []
    for b in range(BATCHES):
        t0 = time.perf_counter()
        for i in range(ITERS):
            cam.orbit(0.03, 0.01)
            img = renderer.render(cam.basis(), p)
        sync(img)
        dt = time.perf_counter() - t0
        rates.append(ITERS / dt)
    fps = float(np.median(rates))
    # Bootstrap 95% CI of the median across batches (the README headline
    # cites exactly this number + CI; VERDICT r4 #4).
    rng = np.random.default_rng(0)
    boots = np.median(rng.choice(rates, size=(2000, len(rates))), axis=1)
    fps_ci = [float(np.percentile(boots, 2.5)),
              float(np.percentile(boots, 97.5))]

    print(f"[bench] fps per batch: {[round(r, 2) for r in rates]} "
          f"median {fps:.1f} [95% CI {fps_ci[0]:.1f}, {fps_ci[1]:.1f}] "
          f"backend_kind={renderer.backend}", file=sys.stderr)

    # North-star quality half (BASELINE.md): PSNR of the benched backend vs
    # the lockstep oracle at the FULL bench configuration, over a mini pose
    # sweep — orbit/face poses plus the exact diagonal (the historical worst
    # pose, docs/RESULTS_r2.md) — reporting min and median with the worst
    # pose named. ">= 40 dB" means at ANY pose, not one.
    worst = worst_pose = med = None
    try:
        from mri_raytracer_tpu.ops import raymarch_xla

        poses = [("orbit", 0.6, 1.2), ("face-x", 0.0, np.pi / 2),
                 ("face-y", np.pi / 2, np.pi / 2), ("top", 0.3, 0.12),
                 ("diag-low", 0.85, 0.6), ("diagonal", 0.85, 0.85)]
        dt_oracle = float(np.min(np.asarray(p.voxel_size)))
        p_o = p._replace(step_size=np.float32(dt_oracle))
        psnrs = []
        for name, th, ph in poses:
            pose_cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                                     theta=th, phi=ph)
            basis = pose_cam.basis()
            fast = np.clip(np.asarray(renderer.render(basis, p)), 0.0, 1.0)
            oracle = np.clip(np.asarray(raymarch_xla.render_brats(
                renderer.mods, renderer.seg, None, basis, p_o, SIZE, SIZE,
                max_steps=640)), 0.0, 1.0)
            mse = float(np.mean((fast - oracle) ** 2))
            psnrs.append((10.0 * float(np.log10(1.0 / max(mse, 1e-12))),
                          name))
        worst, worst_pose = min(psnrs)
        med = float(np.median([q for q, _ in psnrs]))
        print(f"[bench] PSNR vs oracle at {SIZE}^2/{VOL[0]}^3 over "
              f"{len(poses)} poses: min {worst:.1f} dB at '{worst_pose}', "
              f"median {med:.1f} dB (>=40 required at every pose); "
              f"per-pose: "
              + ", ".join(f"{n}={q:.1f}" for q, n in psnrs), file=sys.stderr)
    except Exception as e:  # quality sanity must not break the bench metric
        print(f"[bench] PSNR check failed: {e}", file=sys.stderr)

    # Arithmetic accounting (the reference protocol's steps/ray overlay,
    # docs/showcase-plan.md:7, plus TPU-native FLOPs/MFU — utils/arith):
    # model MXU FLOPs/frame averaged over poses along the timed orbit, with
    # the in-kernel stage made EXACT by the compositor's executed-plane
    # instrumentation (echo='planes').
    acct = None
    try:
        from mri_raytracer_tpu.utils import arith

        # Sample 5 poses spaced along the SAME orbit the timing loop walked
        # (theta0 + 0.03k, phi0 + 0.01k for k in 0..BATCHES*ITERS after the
        # warmup offset) so the FLOPs averaged here describe the frames the
        # fps was measured on, not a different sweep.
        n_timed = BATCHES * ITERS
        per_pose = []
        for k in np.linspace(1, n_timed, 5):
            cam_a = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                                  theta=0.6 + 0.03 * (WARMUP + k),
                                  phi=1.2 + 0.01 * k)
            basis = cam_a.basis()
            stats = renderer.frame_stats(basis, p)
            counts = renderer.executed_planes(basis, p)
            per_pose.append(arith.frame_flops(stats, SIZE, SIZE,
                                              executed_planes=counts))
        fl = float(np.mean([f["flops_total"] for f in per_pose]))
        m = arith.mfu(fl, fps)
        acct = {
            "flops_per_frame": round(fl, 0),
            "tflops_per_s": round(m["tflops_per_s"], 2),
            "mfu": round(m["mfu"], 4),
            "peak_tflops_bf16": m["peak_tflops"],
            "steps_per_ray_eff": round(float(np.mean(
                [f["steps_per_ray_eff"] for f in per_pose])), 1),
            "steps_per_ray_max": round(float(np.mean(
                [f["steps_per_ray_max"] for f in per_pose])), 1),
            "stage2_exact": all(f["stage2_exact"] for f in per_pose),
        }
        print(f"[bench] arith: {fl / 1e9:.1f} GFLOP/frame "
              f"(stage1 {np.mean([f['flops_stage1'] for f in per_pose]) / 1e9:.1f} "
              f"+ kernel {np.mean([f['flops_stage2'] for f in per_pose]) / 1e9:.1f} "
              f"+ warp {np.mean([f['flops_warp'] for f in per_pose]) / 1e9:.1f}) "
              f"-> {m['tflops_per_s']:.1f} TFLOP/s at {fps:.1f} fps, "
              f"MFU {100 * m['mfu']:.1f}% of {m['peak_tflops']:.0f} bf16 peak; "
              f"steps/ray eff {acct['steps_per_ray_eff']} "
              f"(max {acct['steps_per_ray_max']})", file=sys.stderr)
    except Exception as e:  # accounting must never break the bench metric
        print(f"[bench] arith accounting failed: {e}", file=sys.stderr)

    rec = {"metric": "render_fps_1024_256", "value": round(fps, 3),
           "unit": "fps", "vs_baseline": round(fps / 30.0, 3),
           "fps_ci95": [round(fps_ci[0], 2), round(fps_ci[1], 2)]}
    if worst is not None:
        rec.update(psnr_min_db=round(worst, 2), psnr_min_pose=worst_pose,
                   psnr_median_db=round(med, 2))
    if acct is not None:
        rec.update(acct)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
