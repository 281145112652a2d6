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

    def mk(backend):
        return NeuralBratsRenderer(disp, zsc, segj, model, params,
                                   width=S, height=S, backend=backend,
                                   pred_stride=args.pred_stride,
                                   pred_kstride=args.pred_kstride)

    fused = mk("fused" if not args.cpu else "scan")
    scan = mk("scan")

    def psnr(a, b):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
        return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))

    for name, th, ph in [("orbit", 0.6, 1.2), ("diagonal", 0.85, 0.85)]:
        cam = OrbitalCamera(radius=rp.default_camera_radius(p, V),
                            theta=th, phi=ph)
        b = cam.basis()
        t0 = time.time()
        img_f = fused.render_numpy(b, p)
        img_s = scan.render_numpy(b, p)
        print(f"[nm-parity] {name:9s} fused-vs-scan PSNR "
              f"{psnr(img_f, img_s):6.2f} dB  ({time.time() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
