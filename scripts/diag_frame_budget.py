#!/usr/bin/env python
"""Decompose the bench frame time: where do the ms go between the isolated
two-program chain (~8 ms measured r4) and the bench loop (~10 ms)?

Phases timed (each median over batches, interleaved-friendly):
  host     — the renderer.render() Python path with the device calls stubbed
             out (cache-key hashing, crop math, dispatch glue)
  comp     — compositor program alone (queue N, sync once)
  warp     — warp program alone
  chain    — compositor+warp chained per frame (the render_prepared path)
  render   — the full BratsRenderer.render per frame (bench loop pattern)

Run on the real TPU: python scripts/diag_frame_budget.py
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

    SIZE = 1024
    VOL = (256, 256, 256)
    ITERS, BATCHES = 15, 5

    print(f"[diag] backend={jax.default_backend()}", file=sys.stderr)
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    mods_disp = np.stack([brats.percentile_normalize(m) for m in mods])
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL), theta=0.6,
                        phi=1.2)
    renderer = BratsRenderer(jnp.asarray(mods_disp),
                             jnp.asarray(seg.astype(np.int32)), None,
                             width=SIZE, height=SIZE)
    renderer.warmup(p)
    for _ in range(15):
        cam.orbit(0.03, 0.0)
        img = renderer.render(cam.basis(), p)
    img.block_until_ready()

    def sync(x):
        return float(jnp.sum(x))

    def timed(name, fn, sync_out=True):
        rates = []
        for _ in range(BATCHES):
            t0 = time.perf_counter()
            out = None
            for _ in range(ITERS):
                cam.orbit(0.03, 0.01)
                out = fn(cam.basis())
            if sync_out and out is not None:
                sync(out)
            dt = time.perf_counter() - t0
            rates.append(dt / ITERS * 1e3)
        med = float(np.median(rates))
        print(f"[diag] {name:8s} {med:7.3f} ms/frame "
              f"(batches: {[round(r, 2) for r in rates]})", file=sys.stderr)
        return med

    # --- full render path (bench pattern)
    timed("render", lambda b: renderer.render(b, p))

    # --- host-only: run the renderer call with shearwarp.render_prepared
    #     stubbed to return a constant (measures cache-key + crop + glue)
    from mri_raytracer_tpu.ops import shearwarp
    real_rp = shearwarp.render_prepared
    const = jnp.zeros((SIZE, SIZE, 3), jnp.float32)
    shearwarp.render_prepared = lambda *a, **k: const
    try:
        timed("host", lambda b: renderer.render(b, p), sync_out=False)
    finally:
        shearwarp.render_prepared = real_rp

    # --- isolated programs at the exact bench operating point: replay one
    #     render to capture the args reaching render_prepared, then drive the
    #     split programs directly.
    captured = {}

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
    print(f"[diag] operating point: out_res={out_res} "
          f"mixed={tuple(mixed_s.shape)} axis={axis} kw_keys={list(kw)}",
          file=sys.stderr)

    zeros = jnp.zeros((1, 1, 1), jnp.int32)
    z_off = kw.get("z_offset")
    z_off = None if z_off is None else jnp.asarray(z_off, jnp.float32)
    ab = kw.get("ab_offset")
    ab = None if ab is None else (jnp.asarray(ab[0], jnp.float32),
                                  jnp.asarray(ab[1], jnp.float32))
    nk_g = kw.get("nk_global")
    ip_g = kw.get("inplane_global")
    use_gamma = kw.get("use_gamma")
    use_clip = kw.get("use_clip")
    dims_local = tuple(int(d) for d in mixed_s.shape)

    def comp_only(basis):
        bv = basis.pack()
        return shearwarp._render_prepared(
            mixed_s, seg_s if seg_s is not None else zeros,
            pred_s if pred_s is not None else zeros, bv, pp, axis, width,
            height, out_res, 1, seg_s is not None, pred_s is not None,
            use_gamma, use_clip, False, "pallas", z_off, nk_g, ab, ip_g,
            warp=False)

    C_once = comp_only(cam.basis())
    C_once.block_until_ready()

    def warp_only(basis):
        bv = basis.pack()
        return shearwarp.warp_program(C_once, bv, pp, axis, width, height,
                                      out_res, dims_local, z_off, nk_g, ab,
                                      ip_g, use_pallas=True)

    def chain(basis):
        C = comp_only(basis)
        bv = basis.pack()
        return shearwarp.warp_program(C, bv, pp, axis, width, height,
                                      out_res, dims_local, z_off, nk_g, ab,
                                      ip_g, use_pallas=True)

    warp_only(cam.basis()).block_until_ready()
    chain(cam.basis()).block_until_ready()
    timed("comp", comp_only)
    timed("warp", warp_only)
    timed("chain", chain)
    # a second render pass at the end to see drift within this run
    timed("render2", lambda b: renderer.render(b, p))


if __name__ == "__main__":
    main()
