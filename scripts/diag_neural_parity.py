#!/usr/bin/env python
"""Mode-2 fused-vs-scan parity at FULL bench scale on the real device.

The interpret-mode parity test (test_neural_march.py) runs at small shapes;
the diagonal-pose slab-layout hazard (see pallas_composite._make_kernel)
only shows at scale on real hardware — this script is the full-scale check
for the FIELD stream path: fused Pallas mode-2 vs the scan compositor with
the same INR, at an orbit pose and the exact diagonal.
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
    ap.add_argument("--pred-stride", type=int, default=4)
    ap.add_argument("--pred-kstride", type=int, default=1)
    ap.add_argument("--hidden", default="32,32")
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

    from mri_raytracer_tpu.config import ModelConfig
    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.models.api import build_model
    from mri_raytracer_tpu.ops.neural_march import NeuralBratsRenderer
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.camera import OrbitalCamera

    V = (args.vol, args.vol, args.vol)
    S = args.size
    mods, seg = synthetic.synthetic_case(V, seed=0)
    disp = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    zsc = jnp.asarray(np.stack([brats.zscore_nonzero(m.copy())
                                for m in mods]))
    segj = jnp.asarray(seg.astype(np.int32))
    hidden = tuple(int(x) for x in args.hidden.split(","))
    cfg = ModelConfig(hidden_dims=hidden, fourier_freqs=6, num_classes=4)
    model = build_model(cfg, num_modalities=4)
    params = model.init(jax.random.PRNGKey(0))
    p = rp.default_render_params(V, show_seg=True, show_pred=True)

    import jax.numpy as _jnp

    from mri_raytracer_tpu.ops import neural_march, shearwarp as sw
    from mri_raytracer_tpu.ops.pallas_composite import sweep_composite_pallas
    from mri_raytracer_tpu.ops.raymarch_xla import blend_modalities

    # Both paths get the SAME precomputed geometry + prediction field
    # (like test_fused_field_path_matches_scan, but at bench scale on the
    # real device): geometry rebuilt in a second jit program differs at
    # ~1e-5, which flips argmax labels of a near-tie random model and
    # would measure tie-breaking noise instead of compositing parity.
    params[-1]["b"] = params[-1]["b"] + _jnp.array([0.0, 0.4, 0.5, 0.45])
    St = args.pred_stride

    def psnr(a, b):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
        return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))

    for name, th, ph in [("orbit", 0.6, 1.2), ("diagonal", 0.85, 0.85)]:
        cam = OrbitalCamera(radius=rp.default_camera_radius(p, V),
                            theta=th, phi=ph)
        b = cam.basis()
        axis = sw.dominant_axis(b)
        mixed = blend_modalities(disp, p.vol_enabled, p.vol_weight)
        mixed_s = sw._perm_volume(mixed, axis)
        modsz_s = jnp.stack([sw._perm_volume(zsc[m], axis)
                             for m in range(4)])
        seg_s = sw._perm_volume(segj, axis)
        geom = sw.sweep_geometry(b, p, mixed_s.shape, axis, S,
                                 frustum_wh=(S, S))
        t0 = time.time()
        field = neural_march.predict_field(model, params, modsz_s, geom, p,
                                           axis, S, St, block=8,
                                           kstride=args.pred_kstride)
        img_scan = np.asarray(neural_march.render_brats_neural(
            disp, zsc, segj, model, params, b, p, S, S, out_res=S,
            pred_stride=St, geom=geom,
            field=field if args.pred_kstride == 1 else None))
        C, T = sweep_composite_pallas(
            mixed_s, seg_s, None, geom, p, axis, S,
            use_gamma=False, use_clip=False, interpret=args.cpu,
            pred_field=field.astype(jnp.bfloat16), field_stride=St,
            field_kstride=args.pred_kstride)
        img_fused = np.asarray(sw.warp_to_screen(C, geom, b, axis, S, S,
                                                 p.bg_color))
        print(f"[nm-parity] {name:9s} fused-vs-scan (shared field, "
              f"k{args.pred_kstride}) PSNR {psnr(img_fused, img_scan):6.2f} "
              f"dB  ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
