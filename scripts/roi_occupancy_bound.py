#!/usr/bin/env python
"""Arithmetic ceiling of per-ray sample redistribution, per ROI scene.

At equal in-content quality, a redistribution policy cannot sample the
live (occupied AND unoccluded) parts of a ray's chord coarser than the
fixed-step baseline does — so its budget floor is
``live_chord_fraction x B1`` per ray, and the speedup ceiling is
``1 / live_chord_fraction`` BEFORE coarse-pass overhead and decision-
block granularity. Tumor scenes measure ~0.52 (the whole head emits),
capping redistribution at ~1.9x ideal / ~1.5-1.7x realized — below the
showcase-plan 1.8x bar, which is why the foveated screen-space mode
exists (ops/roi_policy.render_policy_foveated). Run on CPU; the bound
is geometry, not wall-clock.
"""
import pathlib as _pl
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="96,96,80")
    ap.add_argument("--suite", default="showcase",
                    choices=["showcase", "adversarial"])
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--rect-frac", type=float, default=0.5,
                    help="foveated inset fraction per screen axis "
                    "(ops/roi_policy.render_policy_foveated default)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.eval import roi_protocol
    from mri_raytracer_tpu.ops import roi_policy
    from mri_raytracer_tpu.ops.trilinear import nearest_sample_rows
    from mri_raytracer_tpu.render.camera import unpack_basis

    shape = tuple(int(x) for x in args.shape.split(","))
    scenes = roi_protocol.build_scenes(shape, suite=args.suite)
    W, H = args.width, args.height
    n = 64
    for sc in scenes:
        p = sc["params"]
        mixed = sc["mixed"]
        fracs = []
        for bv in roi_protocol.make_orbit_views(sc["radius"], args.frames):
            basis = unpack_basis(jnp.asarray(bv))
            dims = jnp.array(mixed.shape, jnp.float32)
            ro, rd, t0, t1, valid, bmin = roi_policy._ray_setup(
                basis, p, dims, W, H)
            kk = (jnp.arange(n) + 0.5) / n
            t = t0[..., None] + kk * (t1 - t0)[..., None]
            pos = ro[..., None, :] + t[..., None] * rd[..., None, :]
            pidx = (pos - bmin) / p.voxel_size
            occ = nearest_sample_rows(sc["feat_rows"], pidx)[..., 7]
            val = roi_policy.transfer_function(
                roi_policy._sample_any(mixed, pidx), p.ww, p.wl, p.gamma)
            dt = ((t1 - t0) / n)[..., None]
            a = 1 - jnp.exp(-val * p.intensity_alpha * dt)
            T_in = jnp.concatenate(
                [jnp.ones_like(a[..., :1]),
                 jnp.cumprod(1 - a, axis=-1)[..., :-1]], -1)
            live = (occ > 0.02) & (T_in > 1e-3) & valid[..., None]
            frac = jnp.sum(live, axis=-1) / n
            m = valid & (frac > 0)
            fracs.append(float(jnp.sum(jnp.where(m, frac, 0.0))
                               / jnp.maximum(jnp.sum(m), 1)))
        f = float(np.mean(fracs))
        # Foveated screen-space ceiling ON TOP of redistribution: ROI
        # inset at full resolution (rect_frac^2 of the rays) + the rest of
        # the frame at half resolution (1/4 of the rays), every ray still
        # bounded by the live-chord floor — the combined arithmetic limit
        # the protocol's foveated operating points are measured against.
        ray_factor = 0.25 + args.rect_frac ** 2
        print(f"{sc['name']:10s} live-chord fraction {f:.3f} -> "
              f"redistribution ceiling ~{1.0 / f:.2f}x (ideal); "
              f"+foveation (rect_frac={args.rect_frac}, ray factor "
              f"{ray_factor:.2f}) -> ~{1.0 / (f * ray_factor):.2f}x")


if __name__ == "__main__":
    main()
