#!/usr/bin/env python
"""Probe what the Pallas composite kernel actually SEES at runtime.

diag_overlay_bisect narrowed the diagonal corruption to the mere presence
of `jnp.take(seg_s, zi)` in the program (its VALUES provably unused). The
prep values are bit-identical as jit outputs — so something the kernel
reads must differ at runtime inside the full program. This harness calls
sweep_composite_pallas directly (no renderer, no warp) and
1. checks the harness reproduces the C-divergence with vs without seg,
2. echoes kernel INPUTS (r, dt, vmag via out channels) to see which one
   the kernel observes differently.
"""
import functools
import pathlib as _pl
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--vol", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.ops import pallas_composite as pc
    from mri_raytracer_tpu.ops import shearwarp as sw
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    SIZE = args.size
    VOL = (args.vol, args.vol, args.vol)
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    seg0 = jnp.zeros(VOL, jnp.int32)
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                        theta=0.85, phi=0.85)
    basis = cam.basis()
    axis = sw.dominant_axis(basis)
    mixed_s, seg_s, _ = sw.prepare_sweep_volumes(mods, seg0, seg0, p, axis,
                                                 True, False)
    Nk, Na, Nb = mixed_s.shape
    bv = basis.pack()
    kw = dict(interpret=args.cpu)

    @functools.partial(jax.jit, static_argnames=("with_seg", "echo"))
    def run(mixed_s, seg_s, bv, with_seg, echo=None):
        b = sw.unpack_basis(bv)
        geom = sw.sweep_geometry(b, p, (Nk, Na, Nb), axis, SIZE,
                                 jnp.zeros(3),
                                 jnp.asarray([Nk, Na, Nb], jnp.float32),
                                 frustum_wh=(SIZE, SIZE))
        C, T = pc.sweep_composite_pallas(
            mixed_s, seg_s if with_seg else None, None, geom, p, axis, SIZE,
            use_gamma=False, use_clip=True, echo=echo, **kw)
        return C, T

    base = {}
    for ws in (False, True):
        for echo in (None, "r", "dt", "vmag"):
            C, T = run(mixed_s, seg_s, bv, with_seg=ws, echo=echo)
            key = echo or "C"
            val = np.asarray(T if echo else C)
            if not ws:
                base[key] = val
            else:
                d = np.abs(np.where(np.isfinite(val), val, 3e38)
                           - np.where(np.isfinite(base[key]), base[key],
                                      3e38))
                print(f"[kin] {key:5s} with-seg vs none: max|diff| "
                      f"{d.max():.3e}  nonzero {(d > 0).mean() * 100:.4f}%",
                      flush=True)


if __name__ == "__main__":
    main()
