#!/usr/bin/env python
"""Decompose the 4.6 ms warp program (scripts/diag_frame_budget.py): rays +
fit analysis prelude, the Pallas kernel, the tile reassembly transpose, and
the gather fallback — each timed as its own jit program on the real TPU.
"""
import pathlib as _pl
import sys
import time

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
    import jax.numpy as jnp

    from mri_raytracer_tpu.data import synthetic, brats
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera
    from mri_raytracer_tpu.render.brats import BratsRenderer
    from mri_raytracer_tpu.ops import shearwarp
    from mri_raytracer_tpu.ops import pallas_warp as pw

    SIZE = 1024
    VOL = (256, 256, 256)
    ITERS, BATCHES = 20, 5

    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods_disp = np.stack([brats.percentile_normalize(m) for m in mods])
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL), theta=0.6,
                        phi=1.2)
    renderer = BratsRenderer(jnp.asarray(mods_disp),
                             jnp.asarray(seg.astype(np.int32)), None,
                             width=SIZE, height=SIZE)
    renderer.warmup(p)

    captured = {}
    real_rp = shearwarp.render_prepared

    def capture(*a, **k):
        captured["a"] = a
        captured["k"] = k
        return real_rp(*a, **k)

    shearwarp.render_prepared = capture
    try:
        renderer.render(cam.basis(), p)
    finally:
        shearwarp.render_prepared = real_rp
    (mixed_s, seg_s, pred_s, basis, pp, axis, width, height, out_res) = \
        captured["a"]
    kw = captured["k"]
    z_off = kw.get("z_offset")
    z_off = None if z_off is None else jnp.asarray(z_off, jnp.float32)
    ab = kw.get("ab_offset")
    ab = None if ab is None else (jnp.asarray(ab[0], jnp.float32),
                                  jnp.asarray(ab[1], jnp.float32))
    nk_g = kw.get("nk_global")
    ip_g = kw.get("inplane_global")
    dims_local = tuple(int(d) for d in mixed_s.shape)
    O = out_res
    print(f"[diag] out_res={O} axis={axis}", file=sys.stderr)

    # One compositor output to feed the warp variants.
    zeros = jnp.zeros((1, 1, 1), jnp.int32)
    C = shearwarp._render_prepared(
        mixed_s, seg_s if seg_s is not None else zeros,
        pred_s if pred_s is not None else zeros, cam.basis().pack(), pp,
        axis, width, height, out_res, 1, seg_s is not None,
        pred_s is not None, kw.get("use_gamma"), kw.get("use_clip"), False,
        "pallas", z_off, nk_g, ab, ip_g, warp=False)
    C.block_until_ready()

    def timed(name, fn):
        fn(cam.basis())  # compile
        rates = []
        for _ in range(BATCHES):
            t0 = time.perf_counter()
            out = None
            for _ in range(ITERS):
                cam.orbit(0.03, 0.01)
                out = fn(cam.basis())
            float(jnp.sum(out))
            dt = time.perf_counter() - t0
            rates.append(dt / ITERS * 1e3)
        med = float(np.median(rates))
        print(f"[diag] {name:14s} {med:7.3f} ms (batches "
              f"{[round(r, 2) for r in rates]})", file=sys.stderr)
        return med

    def full_warp(basis):
        return shearwarp.warp_program(C, basis.pack(), pp, axis, width,
                                      height, out_res, dims_local, z_off,
                                      nk_g, ab, ip_g, use_pallas=True)

    def gather_warp_prog(basis):
        return shearwarp.warp_program(C, basis.pack(), pp, axis, width,
                                      height, out_res, dims_local, z_off,
                                      nk_g, ab, ip_g, use_pallas=False)

    # Prelude only: rays + maps + fit analysis, no kernel, no reassembly.
    @jax.jit
    def prelude(basis_vec):
        basis_u = shearwarp.unpack_basis(basis_vec)
        geom = shearwarp.content_geometry(basis_u, pp, dims_local, axis,
                                          out_res, width, height, z_off,
                                          nk_g, ab, ip_g)
        from mri_raytracer_tpu.render.camera import CameraBasis  # noqa
        ro, rd = shearwarp.camera_rays(basis_u, width, height)
        order = {0: (0, 1, 2), 1: (1, 0, 2), 2: (2, 0, 1)}[axis]
        dk = rd[..., order[0]]
        da_ = rd[..., order[1]]
        db_ = rd[..., order[2]]
        e = geom.e
        denom = jnp.where(jnp.abs(dk) < 1e-12, 1e-12, dk)
        t_base = (geom.w_base - e[0]) / denom
        i_map = jnp.clip((e[1] + t_base * da_ - geom.a0) / geom.da, 0.0,
                         O - 1.0)
        j_map = jnp.clip((e[2] + t_base * db_ - geom.b0) / geom.db, 0.0,
                         O - 1.0)
        it, jt, starts, fits = pw.warp_fit_starts(i_map, j_map, O, height,
                                                  width)
        return it, jt, starts, fits

    it, jt, starts, fits = jax.block_until_ready(prelude(cam.basis().pack()))
    print(f"[diag] fits={bool(fits)}", file=sys.stderr)

    # Kernel only (fixed prelude outputs), including reassembly.
    C3 = jnp.moveaxis(C, -1, 0)

    @jax.jit
    def kernel_only(it, jt, starts):
        return pw.warp_pallas_exec(C3, it, jt, starts, height, width)

    @jax.jit
    def kernel_noreassemble(it, jt, starts):
        # copy of warp_pallas_exec without the final transpose
        Oc = C3.shape[1]
        win_i = min(pw.WIN_I, Oc)
        win_j = min(pw.WIN_J, Oc)
        nTi = height // pw.TILE_I
        nTj = width // pw.TILE_J
        nT = nTi * nTj
        group = 8 if nT % 8 == 0 else nT
        n_groups = nT // group
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_groups,),
            in_specs=[
                pl.BlockSpec((group, pw.PIX), lambda t, s: (t, 0)),
                pl.BlockSpec((group, pw.PIX), lambda t, s: (t, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((3, group, pw.PIX), lambda t, s: (0, t, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, 3, win_i, win_j), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            pw._make_warp_kernel(win_i, win_j, group, n_groups),
            out_shape=jax.ShapeDtypeStruct((3, nT, pw.PIX), jnp.float32),
            grid_spec=grid_spec,
        )(starts, it, jt, C3)

    timed("warp_full", full_warp)
    timed("warp_gather", gather_warp_prog)
    timed("prelude", lambda b: prelude(b.pack())[0])
    t_k = timed("kernel+asm", lambda b: kernel_only(it, jt, starts))
    t_nk = timed("kernel_only", lambda b: kernel_noreassemble(it, jt, starts))
    print(f"[diag] reassembly transpose ~ {t_k - t_nk:.3f} ms",
          file=sys.stderr)

    # how much of the screen is covered by valid tiles at this pose?
    itn = np.asarray(it)
    jtn = np.asarray(jt)
    # tiles where every pixel clipped to the border are (likely) invalid
    span_i = itn.max(1) - itn.min(1)
    span_j = jtn.max(1) - jtn.min(1)
    degen = (span_i < 1e-3) & (span_j < 1e-3)
    print(f"[diag] degenerate (border-clipped) tiles: {int(degen.sum())} "
          f"/ {len(degen)}", file=sys.stderr)


if __name__ == "__main__":
    main()
