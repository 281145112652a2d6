#!/usr/bin/env python
"""Decompose the ROI policy renderer's 1080p overhead vs the fixed-step
baseline.

The 192^2 protocol results showed ~0.4% policy overhead at equal budget;
the (lost) 1080p run printed speedups consistent with ~10-15% overhead.
This prints ms for baseline and policy at a small and an operating budget:
the n=4 pair estimates the FIXED per-frame overhead (coarse pass + CDF +
repeat machinery), the slope pair the per-sample cost ratio.
"""
import argparse
import pathlib as _pl
import sys
import time

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--shape", default="96,96,80")
    ap.add_argument("--scene", default="bonsai")
    ap.add_argument("--budgets", default="4,32,64")
    ap.add_argument("--n-coarse", type=int, default=48)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--policy", default="docs/roi_policy.npz")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

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
    sc = next(s for s in roi_protocol.build_scenes(shape)
              if s["name"] == args.scene)
    stride = roi_protocol.auto_probe_stride(args.width)
    pol_f = _pl.Path(args.policy)
    pol = (roi_policy.load_policy(pol_f) if pol_f.exists()
           else roi_policy.init_policy(jax.random.PRNGKey(0)))
    bv = jnp.asarray(roi_protocol.make_orbit_views(sc["radius"], 8)[0])
    st = roi_protocol.scene_tuple(sc)
    p = sc["params"]
    W, H = args.width, args.height

    def t_ms(fn, n=9):
        out = fn()
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(jnp.sum(out))
        return 1e3 * (time.perf_counter() - t0) / n

    print(f"[diag] backend={jax.default_backend()} {W}x{H} "
          f"scene={args.scene} stride={stride} n_coarse={args.n_coarse}")
    for n in [int(x) for x in args.budgets.split(",")]:
        ms_b = t_ms(lambda: roi_policy.render_fixed(
            st[0], bv, p, W, H, n, block=args.block)[0])
        ms_p = t_ms(lambda: roi_policy.render_policy(
            pol, *st, bv, p, W, H, args.n_coarse, n,
            probe_stride=stride, block=args.block)[0])
        print(f"[diag] n={n:3d}  baseline {ms_b:7.2f} ms   "
              f"policy {ms_p:7.2f} ms   overhead {ms_p - ms_b:+7.2f} ms "
              f"({100 * (ms_p / ms_b - 1):+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
