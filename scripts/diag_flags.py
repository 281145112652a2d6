#!/usr/bin/env python
"""Flag/warp ablation at the diagonal pose, nocrop, out_res=1024.

diag_renderer_crop (r4) showed render_prepared nocrop-1024 = 40.66 dB
while sw.render_brats direct (same geometry, same kernels) = 64.05 dB.
Remaining differences: use_gamma/use_clip (render_brats specializes both
False for default params; render_prepared defaults True), the warp
backend, and in-graph vs pre-done blending. This matrix isolates them.
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
    print(f"[flags] axis={axis}, preparing volumes...", flush=True)
    prep = sw.prepare_sweep_volumes(mods, seg, jnp.zeros((1, 1, 1),
                                                         jnp.int32),
                                    p, axis, True, False)
    mixed_s, seg_s = prep[0], prep[1]
    jax.block_until_ready(mixed_s)
    print("[flags] prep done", flush=True)

    # What does the warp fit-check say at this pose? (one jit program:
    # eager per-op dispatch over the tunnel takes minutes)
    @jax.jit
    def _probe_fits(basis_vec):
        from mri_raytracer_tpu.ops.pallas_warp import warp_fit_starts
        from mri_raytracer_tpu.ops.shearwarp import (camera_rays, _EPS,
                                                     unpack_basis)
        bb = unpack_basis(basis_vec)
        geom = sw.sweep_geometry(bb, p, tuple(mixed_s.shape), axis, 1024,
                                 frustum_wh=(SIZE, SIZE))
        ro, rd = camera_rays(bb, SIZE, SIZE)
        order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
        dk = rd[..., order[0]]
        denom = jnp.where(jnp.abs(dk) < _EPS, _EPS, dk)
        t_base = (geom.w_base - geom.e[0]) / denom
        i_map = jnp.clip((geom.e[1] + t_base * rd[..., order[1]] - geom.a0)
                         / geom.da, 0.0, 1023.0)
        j_map = jnp.clip((geom.e[2] + t_base * rd[..., order[2]] - geom.b0)
                         / geom.db, 0.0, 1023.0)
        _, _, _, fits = warp_fit_starts(i_map, j_map, 1024, SIZE, SIZE)
        return fits

    rows = [
        ("gTcT-warpG", dict(use_gamma=True, use_clip=True,
                            use_pallas=False)),
        ("gFcF-warpP", dict(use_gamma=False, use_clip=False,
                            use_pallas=True)),
        ("gTcT-warpP", dict(use_gamma=True, use_clip=True, use_pallas=True)),
        ("gFcT-warpP", dict(use_gamma=False, use_clip=True, use_pallas=True)),
        ("gTcF-warpP", dict(use_gamma=True, use_clip=False, use_pallas=True)),
        ("gFcF-warpG", dict(use_gamma=False, use_clip=False,
                            use_pallas=False)),
    ]
    for label, kw in rows:
        t0 = time.time()
        # _unsafe_coexist bypasses the production safety invariant (the
        # combined program force-selects the gather warp); the warpP rows
        # deliberately reproduce the Mosaic coexistence miscompile.
        img = np.asarray(sw._render_prepared(
            mixed_s, seg_s, jnp.zeros((1, 1, 1), jnp.int32), b.pack(), p,
            axis, SIZE, SIZE, 1024, 1, True, False,
            use_gamma=kw["use_gamma"], use_clip=kw["use_clip"],
            use_pallas=kw["use_pallas"], composite="pallas",
            _unsafe_coexist=kw["use_pallas"]))
        print(f"[flags] {label:12s} PSNR {psnr(img, oracle):6.2f} dB "
              f"({time.time() - t0:.0f}s)", flush=True)

    print(f"[flags] warp fits at diagonal/1024: "
          f"{bool(_probe_fits(b.pack()))}", flush=True)


if __name__ == "__main__":
    main()
