#!/usr/bin/env python
"""Per-tile source-footprint span statistics of the screen warp, by pose and
tile size — sizes the Pallas warp window (pallas_warp.WIN_I/WIN_J): the
kernel's matmul FLOPs scale with win_i*win_j, so the window should hug the
real footprint distribution instead of the static worst case.
"""
import pathlib as _pl
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")  # pure map algebra, no TPU
    import jax.numpy as jnp

    from mri_raytracer_tpu.data import synthetic, brats
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.ops import shearwarp

    SIZE = 1024
    VOL = (256, 256, 256)
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)

    poses = [("orbit", 0.6, 1.2), ("face-x", 0.0, np.pi / 2),
             ("face-y", np.pi / 2, np.pi / 2), ("top", 0.3, 0.12),
             ("diag-low", 0.85, 0.6), ("diagonal", 0.85, 0.85)]

    # mimic the renderer's crop at bench params: content bbox 16..240 per axis
    # for the synthetic case (out_res 896) — emulate by using the full-volume
    # path at out_res=896 with a 224^3 'cropped' geometry.
    dims_local = (224, 224, 224)
    out_res = 896
    z_off = jnp.float32(16.0)
    ab = (jnp.float32(16.0), jnp.float32(16.0))
    nk_g, ip_g = 256, (256, 256)

    for name, th, ph in poses:
        cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                            theta=th, phi=ph)
        basis = cam.basis()
        axis = shearwarp.dominant_axis(basis)
        geom = shearwarp.content_geometry(basis, p, dims_local, axis,
                                          out_res, SIZE, SIZE, z_off, nk_g,
                                          ab, ip_g)
        ro, rd = shearwarp.camera_rays(basis, SIZE, SIZE)
        order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
        dk = rd[..., order[0]]
        da_ = rd[..., order[1]]
        db_ = rd[..., order[2]]
        denom = jnp.where(jnp.abs(dk) < 1e-12, 1e-12, dk)
        t_base = (geom.w_base - geom.e[0]) / denom
        i_map = np.clip(np.asarray((geom.e[1] + t_base * da_ - geom.a0)
                                   / geom.da), 0.0, out_res - 1.0)
        j_map = np.clip(np.asarray((geom.e[2] + t_base * db_ - geom.b0)
                                   / geom.db), 0.0, out_res - 1.0)

        line = [f"{name:9s} axis={axis}"]
        for ti, tj in ((32, 32), (16, 32), (16, 16), (8, 32)):
            nTi, nTj = SIZE // ti, SIZE // tj
            im = i_map.reshape(nTi, ti, nTj, tj)
            jm = j_map.reshape(nTi, ti, nTj, tj)
            si = (np.floor(im.max((1, 3))) - np.floor(im.min((1, 3)))) + 1
            sj = (np.floor(jm.max((1, 3))) - np.floor(jm.min((1, 3)))) + 1
            line.append(f"[{ti}x{tj}: i p50={np.percentile(si, 50):.0f} "
                        f"max={si.max():.0f} | j p50={np.percentile(sj, 50):.0f} "
                        f"max={sj.max():.0f}]")
        print(" ".join(line))


if __name__ == "__main__":
    main()
