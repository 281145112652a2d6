#!/usr/bin/env python
"""Ablate BratsRenderer's content-crop stages at the diagonal pose.

diag_diagonal (r4) showed sw.render_brats direct = 64.05 dB at the
1024^2/256^3 diagonal while BratsRenderer.render = 40.70 dB — the
corruption lives in the renderer's crop machinery (slab z-offset,
in-plane ab-offset, out_res shrink), not in the kernels. This script
renders the SAME prepared volumes through shearwarp.render_prepared
under each crop stage separately, vs the dumped oracle.
"""
import pathlib as _pl
import sys
import time

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--vol", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--oracle", default="/tmp/diag_r4/diagonal_oracle.npy")
    ap.add_argument("--composite", default="pallas")
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
    import numpy as np

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.ops import raymarch_xla, shearwarp as sw
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    SIZE = args.size
    VOL = (args.vol,) * 3
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    seg = jnp.asarray(seg.astype(np.int32))
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                        theta=0.85, phi=0.85)
    b = cam.basis()

    orc = _pl.Path(args.oracle)
    if orc.exists():
        oracle = np.load(orc)
    else:
        dt_oracle = float(np.min(np.asarray(p.voxel_size)))
        p_o = p._replace(step_size=np.float32(dt_oracle))
        oracle = np.asarray(raymarch_xla.render_brats(
            mods, seg, None, b, p_o, SIZE, SIZE, max_steps=640))

    def psnr(a, ref):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(ref, 0, 1)) ** 2))
        return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))

    axis = sw.dominant_axis(b)
    print(f"[crop] dominant axis = {axis}", flush=True)
    prep_full = sw.prepare_sweep_volumes(mods, seg, jnp.zeros((1, 1, 1),
                                                              jnp.int32),
                                         p, axis, True, False)
    nk, na, nb = (int(prep_full[0].shape[i]) for i in range(3))
    LO, HI = 16, 240  # the _crop16 result for this case (all axes)

    def cropped(kc, ac, bc):
        out = []
        for v in prep_full[:2]:
            if kc:
                v = jax.lax.slice_in_dim(v, LO, HI, axis=0)
            if ac:
                v = jax.lax.slice_in_dim(v, LO, HI, axis=1)
            if bc:
                v = jax.lax.slice_in_dim(v, LO, HI, axis=2)
            out.append(v)
        return out[0], out[1], None

    rows = [
        ("nocrop-1024", (0, 0, 0), None, None, None, None, 1024),
        ("slab-1024", (1, 0, 0), LO, nk, None, None, 1024),
        ("inplane-1024", (0, 1, 1), None, None, (LO, LO), (na, nb), 1024),
        ("inplane-896", (0, 1, 1), None, None, (LO, LO), (na, nb), 896),
        ("full-896 (renderer)", (1, 1, 1), LO, nk, (LO, LO), (na, nb), 896),
        ("full-1024", (1, 1, 1), LO, nk, (LO, LO), (na, nb), 1024),
        ("nocrop-896", (0, 0, 0), None, None, None, None, 896),
    ]
    for label, (kc, ac, bc), z_off, nkg, ab, ipg, out_res in rows:
        mixed_s, seg_s, pred_s = cropped(kc, ac, bc)
        t0 = time.time()
        img = np.asarray(sw.render_prepared(
            mixed_s, seg_s, pred_s, b, p, axis, SIZE, SIZE, out_res,
            composite=args.composite, z_offset=z_off, nk_global=nkg,
            ab_offset=ab, inplane_global=ipg))
        print(f"[crop] {label:22s} PSNR {psnr(img, oracle):6.2f} dB "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
