#!/usr/bin/env python
"""Dump the compiled-HLO operand layouts of the Pallas composite custom
call, with vs without the seg rows — hunting a layout mismatch that
corrupts the kernel's manual HBM DMA at scale (diag_overlay_bisect.py)."""
import pathlib as _pl
import re
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--vol", type=int, default=256)
    ap.add_argument("--dump", default=None, help="write full HLO here")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import functools

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

    @functools.partial(jax.jit, static_argnames=("with_seg",))
    def render(mixed_s, seg_s, bv, with_seg):
        b = sw.unpack_basis(bv)
        geom = sw.sweep_geometry(b, p, (Nk, Na, Nb), axis, SIZE,
                                 jnp.zeros(3),
                                 jnp.asarray([Nk, Na, Nb], jnp.float32),
                                 frustum_wh=(SIZE, SIZE))
        C, T = pc.sweep_composite_pallas(
            mixed_s, seg_s if with_seg else None, None, geom, p, axis, SIZE,
            use_gamma=False, use_clip=False)
        return C

    for ws in (False, True):
        comp = render.lower(mixed_s, seg_s, bv, with_seg=ws).compile()
        txt = comp.as_text()
        if args.dump:
            _pl.Path(args.dump + f".seg{int(ws)}.hlo").write_text(txt)
        print(f"=== with_seg={ws} ===")
        for line in txt.splitlines():
            if "custom-call" in line and "tpu_custom_call" in line:
                # strip backend_config blobs for readability
                line = re.sub(r'backend_config=.*', '', line)
                print(line.strip()[:800])
        # concatenate / fusion producing the slab
        for line in txt.splitlines():
            if re.search(r"concatenate|bf16\[257,512,1024\]|"
                         r"bf16\[257,256,1024\]", line):
                print(line.strip()[:300])


if __name__ == "__main__":
    main()
