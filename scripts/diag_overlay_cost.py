#!/usr/bin/env python
"""Attribute the label-overlay frame cost (VERDICT r4 weak #4: ~7 ms/frame,
54-55 vs 87-90 fps at 1024^2/256^3 with a seg overlay).

Candidate costs, timed separately at bench scale:
  A. full fused render WITH seg          (renderer path, interleaved A/B)
  B. full fused render WITHOUT seg
  C. the seg prep alone: the one-hot z-pick einsum ("kz,znb->knb") +
     nearest b-resample einsum — nominally 2*K*Nk*Na*Nb FLOPs, which at
     bench crops is ~1-2 TFLOP/frame IF XLA executes it densely
  D. compositor with seg rows streamed but overlay math dropped
     (no_overlay=True) — isolates DMA + prep from kernel VPU work
  E. seg z-pick via flip/slice instead of the one-hot einsum (the candidate
     fix: at supersample=1 the plane z-indices are an affine clamped ramp,
     so the pick is a flip + edge pad, no matmul)

Interleaved batches; scalar-readback sync (tunnel-safe).
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
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
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
    import functools

    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.ops import shearwarp as sw
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.brats import BratsRenderer
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    SIZE = args.size
    VOL = (args.vol, args.vol, args.vol)
    mods, seg = synthetic.synthetic_case(VOL, seed=0)
    disp = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    seg_j = jnp.asarray(seg.astype(np.int32))
    p = rp.default_render_params(VOL, show_seg=True, show_pred=False)
    p_ns = rp.default_render_params(VOL, show_seg=False, show_pred=False)

    rend_seg = BratsRenderer(disp, seg_j, None, width=SIZE, height=SIZE)
    rend_no = BratsRenderer(disp, None, None, width=SIZE, height=SIZE)
    print(f"[diag] backend={jax.default_backend()} kind={rend_seg.backend}")

    def sync(x):
        return float(jnp.sum(x))

    def time_fn(fn, label):
        out = fn()
        sync(out)
        rates = []
        for _ in range(args.batches):
            t0 = time.perf_counter()
            for _ in range(args.frames):
                out = fn()
            sync(out)
            rates.append((time.perf_counter() - t0) / args.frames * 1e3)
        med = float(np.median(rates))
        print(f"[diag] {label:40s} {med:8.2f} ms/frame "
              f"(batches {['%.2f' % r for r in rates]})")
        return med

    cam = OrbitalCamera(radius=rp.default_camera_radius(p, VOL),
                        theta=0.6, phi=1.2)
    basis = cam.basis()

    rend_seg.warmup(p)
    rend_no.warmup(p_ns)

    # Full overlay ladder at bench scale: plain / +seg / +seg+pred(baked).
    # The round-4 "54-55 fps" point had BOTH overlays on (bench_neural_march
    # p = show_seg=True, show_pred=True), so G is the config the VERDICT #3
    # target ("overlay-on >= 80 fps") is scored on.
    pred = np.roll(seg, 5, axis=0).astype(np.int32)  # overlay-shaped labels
    p_sp = rp.default_render_params(VOL, show_seg=True, show_pred=True)
    rend_sp = BratsRenderer(disp, seg_j, jnp.asarray(pred), width=SIZE,
                            height=SIZE)
    rend_sp.warmup(p_sp)

    # A/B interleaved
    a = time_fn(lambda: rend_seg.render(basis, p), "A: fused render WITH seg")
    b = time_fn(lambda: rend_no.render(basis, p_ns), "B: without seg")
    a2 = time_fn(lambda: rend_seg.render(basis, p), "A2: with seg (retime)")
    g = time_fn(lambda: rend_sp.render(basis, p_sp),
                "G: with seg + baked pred")
    b2 = time_fn(lambda: rend_no.render(basis, p_ns), "B2: without (retime)")
    g2 = time_fn(lambda: rend_sp.render(basis, p_sp),
                 "G2: seg + pred (retime)")
    print(f"[diag] seg overlay cost = {min(a, a2) - min(b, b2):+.2f} ms "
          f"(A {a:.2f}/{a2:.2f} vs B {b:.2f}/{b2:.2f})")
    gm = min(g, g2)
    print(f"[diag] seg+pred overlay cost = {gm - min(b, b2):+.2f} ms; "
          f"overlay-on fps = {1e3 / gm:.1f} "
          f"(target >= 80; VERDICT r4 #3)")

    # C: seg prep einsums alone, at the renderer's actual crop geometry.
    stats = rend_seg.frame_stats(basis, p)
    axis = stats["axis"]
    O = stats["out_res"]
    (k_lo, k_hi) = stats["crop_k"]
    Nk = k_hi - k_lo
    Na, Nb = stats["Na"], stats["Nb"]
    n_planes = Nk + 1
    print(f"[diag] geometry: axis={axis} O={O} Nk={Nk} Na={Na} Nb={Nb}")
    segv = jnp.asarray(
        np.random.default_rng(0).integers(0, 4, (Nk, Na, Nb)), jnp.int32)
    zi = jnp.clip(jnp.arange(n_planes, dtype=jnp.float32), 0, Nk - 1) \
        .astype(jnp.int32)
    offb = jnp.linspace(0.0, 1.0, n_planes)
    scb = jnp.full((n_planes,), Nb / O)

    @jax.jit
    def seg_prep_onehot(vol_s, offb, scb):
        oz = (jnp.arange(Nk, dtype=jnp.float32)[None, :]
              == zi[:, None].astype(jnp.float32)).astype(jnp.bfloat16)
        picked = jnp.einsum("kz,znb->knb", oz, vol_s.astype(jnp.bfloat16),
                            preferred_element_type=jnp.bfloat16)
        Wbn = sw._batched_nearest(offb, scb, Nb, O)
        return jnp.einsum("knb,kob->kno", picked, Wbn.astype(jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)

    time_fn(lambda: seg_prep_onehot(segv, offb, scb),
            "C: seg prep (one-hot zpick + b-resample)")

    @jax.jit
    def seg_prep_pickonly(vol_s):
        oz = (jnp.arange(Nk, dtype=jnp.float32)[None, :]
              == zi[:, None].astype(jnp.float32)).astype(jnp.bfloat16)
        return jnp.einsum("kz,znb->knb", oz, vol_s.astype(jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)

    time_fn(lambda: seg_prep_pickonly(segv), "C1: one-hot z-pick alone")

    @jax.jit
    def seg_prep_flip(vol_s, offb, scb, flip):
        # Candidate fix: zi is an affine clamped ramp at ss=1 — replicate
        # the pick with flip + edge-duplicate of the closing plane.
        v = vol_s.astype(jnp.bfloat16)
        v = jnp.where(flip, jnp.flip(v, 0), v)
        picked = jnp.concatenate([v, v[-1:]], axis=0)  # K = Nk + 1
        Wbn = sw._batched_nearest(offb, scb, Nb, O)
        return jnp.einsum("knb,kob->kno", picked, Wbn.astype(jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)

    time_fn(lambda: seg_prep_flip(segv, offb, scb, jnp.bool_(False)),
            "E: seg prep (flip/slice zpick + b-resample)")

    @jax.jit
    def intensity_prep(vol_s, offb, scb):
        # The intensity path's own stage 1 for comparison: take + bilinear.
        slices = jnp.take(vol_s, zi, axis=0)
        Wb, _ = sw._batched_hat(offb, scb, Nb, O)
        return jnp.einsum("knb,kob->kno", slices.astype(jnp.bfloat16),
                          Wb.astype(jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)

    time_fn(lambda: intensity_prep(segv, offb, scb),
            "F: intensity prep (take + bilinear)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
