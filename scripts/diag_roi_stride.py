#!/usr/bin/env python
"""Probe-stride quality/speed diagnostic at protocol scale.

The 1080p protocol run (old trilinear probes, auto stride 8) failed the
bar on every scene; at 192^2 (stride 3) three scenes passed. Hypotheses:
(a) coarse-pass overhead (fixed by nearest probes), (b) 8x8 decision
sharing is too coarse at 1080p — skip/scale mistakes at silhouettes cost
the 0.5 dB allowance. This sweeps stride x budget on chosen scenes with
the occupancy-informed INIT policy (no training), using the disk ref
cache, printing wPSNR + ms per point vs the tuned baseline B1@64.
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
    ap.add_argument("--scenes", default="noise,tumor-a")
    ap.add_argument("--budgets", default="32,48,64")
    ap.add_argument("--strides", default="4,6,8")
    ap.add_argument("--n-coarse", type=int, default=48)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--poses", type=int, default=3)
    ap.add_argument("--ref-steps", type=int, default=512)
    ap.add_argument("--ref-cache", default="/tmp/roi_refs")
    ap.add_argument("--frames", type=int, default=9)
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
    import numpy as np

    from mri_raytracer_tpu.eval import roi_protocol
    from mri_raytracer_tpu.ops import roi_policy

    shape = tuple(int(x) for x in args.shape.split(","))
    budgets = [int(x) for x in args.budgets.split(",")]
    # "8" = probe stride 8; "8/2" = probe stride 8 with the rho decision
    # field bilinearly upsampled 2x (decisions at stride 4).
    strides = [(int(s.split("/")[0]),
                int(s.split("/")[1]) if "/" in s else 1)
               for s in args.strides.split(",")]
    want = args.scenes.split(",")
    scenes = [s for s in roi_protocol.build_scenes(shape, suite="showcase")
              if s["name"] in want]
    pol = roi_policy.init_policy(jax.random.PRNGKey(0))
    W, H, NC, BL = args.width, args.height, args.n_coarse, args.block

    def timed(fn):
        out = fn()
        float(jnp.sum(out))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.frames // 3):
                out = fn()
            float(jnp.sum(out))
            ts.append(1e3 * (time.perf_counter() - t0) / (args.frames // 3))
        return sorted(ts)[1]

    for sc in scenes:
        p = sc["params"]
        mixed, rows = roi_protocol.scene_tuple(sc)
        views = roi_protocol.make_orbit_views(sc["radius"], 30)[:args.poses]
        refs = [roi_protocol._render_ref(sc, bv, p, W, H, args.ref_steps,
                                         BL, args.ref_cache, sc["name"])
                for bv in views]
        wmaps = [roi_protocol._wmap_for(sc, bv, p, W, H) for bv in views]

        def q_of(render_fn):
            vals = []
            for bv, ref, wm in zip(views, refs, wmaps):
                img = render_fn(jnp.asarray(bv))
                vals.append(roi_protocol._metrics_of(img, ref, wm)[1])
            return float(np.median(vals))

        b64 = q_of(lambda bv: roi_policy.render_fixed(
            mixed, bv, p, W, H, 64, block=BL)[0])
        ms64 = timed(lambda: roi_policy.render_fixed(
            mixed, jnp.asarray(views[0]), p, W, H, 64, block=BL)[0])
        print(f"[stride] {sc['name']}: B1@64 wPSNR {b64:.2f} dB, "
              f"{ms64:.1f} ms (bar {b64 - 0.5:.2f})", flush=True)
        for n in budgets:
            bq = q_of(lambda bv, n=n: roi_policy.render_fixed(
                mixed, bv, p, W, H, n, block=BL)[0])
            line = f"[stride]   n={n:3d} fixed {bq:6.2f} dB | "
            for S, u in strides:
                pq = q_of(lambda bv, n=n, S=S, u=u: roi_policy.render_policy(
                    pol, mixed, rows, bv, p, W, H, NC, n,
                    probe_stride=S, block=BL, rho_upsample=u)[0])
                ms = timed(lambda n=n, S=S, u=u: roi_policy.render_policy(
                    pol, mixed, rows, jnp.asarray(views[0]), p, W, H, NC, n,
                    probe_stride=S, block=BL, rho_upsample=u)[0])
                mark = "*" if (pq >= b64 - 0.5 and ms < ms64 / 1.8) else " "
                tag = f"S{S}" + (f"/{u}" if u > 1 else "")
                line += f"{tag}: {pq:6.2f} dB {ms:6.1f} ms{mark} | "
            print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
