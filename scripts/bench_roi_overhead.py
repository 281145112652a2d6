#!/usr/bin/env python
"""Decompose the ROI policy renderer's per-frame overhead vs the fixed-step
baseline at protocol scale (1920x1080).

At 192^2 the policy's overhead was ~2% of B1@64; the 1080p protocol run
measured ~10% (tumor-a speedup 0.91x, bonsai 1.67x, clouds 1.68x vs
1.89-2.13x at 192^2) — the speedup loss is one shared overhead term. Rows:

  fixed@n                 baseline march (render_fixed)
  policy@n                full policy render
  policy@n nocdf          policy with rho precomputed outside the timer
                          (isolates coarse probes + policy MLP + CDF from
                          the fine march + repeat/upsample cost)

Each timed as median of batched back-to-back frames with one scalar-readback
sync per batch (same protocol as eval/roi_protocol.pareto_sweep).
"""
import argparse
import pathlib as _pl
import sys
import time

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--shape", default="96,96,80")
    ap.add_argument("--budgets", default="32,48,64")
    ap.add_argument("--n-coarse", type=int, default=48)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

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

    from mri_raytracer_tpu.eval import roi_protocol
    from mri_raytracer_tpu.ops import roi_policy

    shape = tuple(int(x) for x in args.shape.split(","))
    budgets = [int(x) for x in args.budgets.split(",")]
    stride = roi_protocol.auto_probe_stride(args.width)
    sc = roi_protocol.build_scenes(shape, suite="showcase")[0]  # tumor-a
    pol = roi_policy.init_policy(jax.random.PRNGKey(0))
    bv = jnp.asarray(roi_protocol.make_orbit_views(sc["radius"], 30)[7])
    p = sc["params"]
    W, H, NC, BL = args.width, args.height, args.n_coarse, args.block
    mixed = roi_protocol.scene_tuple(sc)[0]
    rows = roi_protocol.scene_tuple(sc)[1]

    def timed(fn):
        out = fn()
        float(jnp.sum(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.frames):
                out = fn()
            float(jnp.sum(out))
            ts.append(1e3 * (time.perf_counter() - t0) / args.frames)
        return sorted(ts)[1]

    print(f"[ovh] {W}x{H} vol={shape} stride={stride} n_coarse={NC} "
          f"block={BL} backend={jax.default_backend()}")
    for n in budgets:
        ms_fix = timed(lambda: roi_policy.render_fixed(
            mixed, bv, p, W, H, n, block=BL)[0])
        ms_pol = timed(lambda: roi_policy.render_policy(
            pol, mixed, rows, bv, p, W, H, NC, n,
            probe_stride=stride, block=BL)[0])
        print(f"[ovh] n={n:3d}  fixed {ms_fix:7.2f} ms   "
              f"policy {ms_pol:7.2f} ms   overhead {ms_pol - ms_fix:+6.2f} "
              f"ms ({100 * (ms_pol / ms_fix - 1):+.1f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
