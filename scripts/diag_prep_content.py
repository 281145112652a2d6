#!/usr/bin/env python
"""Compare the XLA-side sweep-slab prep WITH vs WITHOUT the seg einsum.

diag_overlay_bisect.py narrowed the diagonal-pose kernel corruption to the
XLA prep: appending `take(seg_s, zi) @ Wbn` rows changes the rendered image
by ~40 dB even when seg_s is all-zero (appending literal jnp.zeros rows is
clean). This script checks, WITHOUT any Pallas involvement, whether the
intensity rows t1b (and the seg rows) that XLA produces differ between the
two program shapes — on the same inputs at the same diagonal pose.
"""
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
    import functools

    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.data import brats, synthetic
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
    mixed_s, seg_s, _ = sw.prepare_sweep_volumes(
        mods, seg0, seg0, p, axis, True, False)
    Nk, Na, Nb = mixed_s.shape
    n_planes = Nk + 1
    out_res = SIZE
    bv = basis.pack()

    @functools.partial(jax.jit, static_argnames=("with_seg",))
    def prep(mixed_s, seg_s, bv, with_seg):
        b = sw.unpack_basis(bv)
        geom = sw.sweep_geometry(b, p, (Nk, Na, Nb), axis, out_res,
                                 jnp.zeros(3),
                                 jnp.asarray([Nk, Na, Nb], jnp.float32),
                                 frustum_wh=(SIZE, SIZE))
        z, z_glob, lam, off_a, sc_a, off_b, sc_b = sw.sweep_plane_affines(
            geom, p, axis, n_planes)
        bcl, bch, bcn, bml, bmh = sw._geom_bounds(geom, 1, Nb)
        zi = jnp.clip(z, 0.0, Nk - 1).astype(jnp.int32)
        slices = jnp.take(mixed_s, zi, axis=0)
        Wb, _ = sw._batched_hat(off_b, sc_b, Nb, out_res, bcl, bch, bml, bmh)
        t1b = jnp.einsum("knb,kob->kno", slices.astype(jnp.bfloat16),
                         Wb.astype(jnp.bfloat16),
                         preferred_element_type=jnp.bfloat16)
        blocks = [t1b]
        if with_seg:
            Wbn = sw._batched_nearest(off_b, sc_b, Nb, out_res, bcl, bcn)
            segsl = jnp.take(seg_s, zi, axis=0).astype(jnp.bfloat16)
            blocks.append(jnp.einsum("knb,kob->kno", segsl,
                                     Wbn.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.bfloat16))
        fused = blocks[0] if len(blocks) == 1 else \
            jnp.concatenate(blocks, axis=1)
        # Also return the other kernel inputs that could corrupt instead.
        return fused, geom.vmag, geom.dt_map, \
            sw.entry_ratio_map(geom, jnp.maximum(p.near, 0.0), geom.dt_map)

    a = prep(mixed_s, seg_s, bv, with_seg=False)
    b = prep(mixed_s, seg_s, bv, with_seg=True)
    names = ["t1b[0:Na]", "vmag", "dt_map", "r_map"]
    arrs_a = [a[0]] + list(a[1:])
    arrs_b = [b[0][:, :Na]] + list(b[1:])
    for nm, x, y in zip(names, arrs_a, arrs_b):
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.float32)
        d = np.abs(x - y)
        print(f"[prep] {nm:10s} max|diff| {d.max():.3e}  "
              f"nonzero {(d > 0).mean() * 100:.4f}%  "
              f"(shape {x.shape})", flush=True)
    segrows = np.asarray(b[0][:, Na:], np.float32)
    print(f"[prep] seg rows   max|val|  {np.abs(segrows).max():.3e}  "
          f"(should be 0 for a zero seg volume)", flush=True)


if __name__ == "__main__":
    main()
