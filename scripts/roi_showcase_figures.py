#!/usr/bin/env python
"""Showcase-plan figure deliverables for the ROI policy renderer
(reference ``docs/showcase-plan.md:52-57``: "Reference, baseline, and ours
frames exported for key views", "Pareto plots ... generated from
docs/experiments.csv").

Reads the protocol sweep (``docs/roi_results.json``) + the exported policy
(``docs/roi_policy.npz``) and writes, per benchmark scene:
  docs/img/roi_pareto_<scene>.png    speed-quality Pareto curve
  docs/img/roi_frames_<scene>.png    reference | B1 | policy side-by-side
  docs/experiments.csv               every (scene, view-set, method, budget)
"""
import argparse
import csv
import json
import pathlib as _pl
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

# Validated categorical palette (dataviz reference instance, light mode).
C_BASE = "#2a78d6"   # series 1: fixed-step baseline
C_POL = "#eb6834"    # series 2: policy renderer
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"


def pareto_figure(scene: str, sweep: dict, verdict: dict, out_png):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.2, 3.6), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    for series, color, label in ((sweep["baseline"], C_BASE, "fixed-step"),
                                 (sweep["policy"], C_POL, "policy")):
        ms = [p["ms"] for p in series]
        q = [p["wpsnr"] for p in series]
        ax.plot(ms, q, "-", color=color, lw=2, label=label, zorder=3)
        ax.plot(ms, q, "o", color=color, ms=4.5, mec=SURFACE, mew=1, zorder=4)
    b1 = next(b for b in sweep["baseline"] if b["n"] == verdict["tuned_n"])
    ax.plot([b1["ms"]], [b1["wpsnr"]], "o", ms=9, mfc="none", mec=C_BASE,
            mew=2, zorder=5)
    ax.annotate(f"B1 (n={verdict['tuned_n']})", (b1["ms"], b1["wpsnr"]),
                textcoords="offset points", xytext=(6, -12), color=INK2,
                fontsize=8)
    if verdict.get("policy_n") is not None:
        pp = next(p for p in sweep["policy"] if p["n"] == verdict["policy_n"])
        ax.plot([pp["ms"]], [pp["wpsnr"]], "o", ms=9, mfc="none", mec=C_POL,
                mew=2, zorder=5)
        ax.annotate(f"ours (n={verdict['policy_n']}, "
                    f"{verdict['speedup']:.2f}×)",
                    (pp["ms"], pp["wpsnr"]), textcoords="offset points",
                    xytext=(6, 6), color=INK2, fontsize=8)
    ax.set_xlabel("ms / frame (median)", color=INK)
    ax.set_ylabel("ROI-weighted PSNR (dB)", color=INK)
    ax.set_title(f"{scene}: speed–quality Pareto", color=INK, fontsize=11)
    ax.grid(True, color="#e6e5e0", lw=0.7, zorder=0)
    for s in ax.spines.values():
        s.set_color("#d8d7d2")
    ax.tick_params(colors=INK2, labelsize=8)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK)
    fig.tight_layout()
    fig.savefig(out_png, facecolor=SURFACE)
    plt.close(fig)


def frames_figure(sc, pol, verdict, width, ref_steps, out_png,
                  n_coarse=40, probe_stride=4):
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from mri_raytracer_tpu.eval import roi_protocol
    from mri_raytracer_tpu.ops import roi_policy

    p = sc["params"]
    bv = jnp.asarray(roi_protocol.make_views(sc["radius"])[0])
    ref, _ = roi_policy.render_fixed(sc["mixed"], bv, p, width, width,
                                     ref_steps)
    b1, _ = roi_policy.render_fixed(sc["mixed"], bv, p, width, width,
                                    verdict["tuned_n"])
    n_pol = verdict.get("policy_n") or verdict["tuned_n"]
    ours, _ = roi_policy.render_policy(pol, sc["mixed"], sc["feat_rows"], bv,
                                       p, width, width, n_coarse, n_pol,
                                       probe_stride=probe_stride)
    tiles = [np.asarray(x) for x in (ref, b1, ours)]
    gap = np.full((width, 6, 3), 1.0, np.float32)
    strip = np.concatenate(sum(([t, gap] for t in tiles[:-1]),
                               []) + [tiles[-1]], axis=1)
    img = (np.clip(strip, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(out_png)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="96,96,80")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--ref-steps", type=int, default=448)
    ap.add_argument("--skip-frames", action="store_true",
                    help="figures + CSV only (no device renders)")
    args = ap.parse_args(argv)

    docs = _pl.Path(__file__).resolve().parents[1] / "docs"
    img = docs / "img"
    img.mkdir(exist_ok=True)
    results = json.loads((docs / "roi_results.json").read_text())
    verdicts = {v["scene"]: v for v in results["verdicts"]}

    rows = [("scene", "view_set", "method", "n", "ms", "psnr", "wpsnr",
             "ssim", "steps_per_ray")]
    for tag, sweep in results["scenes"].items():
        scene, _, held = tag.partition("-heldout")
        vs = "heldout" if tag.endswith("-heldout") else "train"
        for method in ("baseline", "policy"):
            for pt in sweep[method]:
                rows.append((scene, vs, method, pt["n"], round(pt["ms"], 2),
                             round(pt["psnr"], 2), round(pt["wpsnr"], 2),
                             round(pt.get("ssim", 0.0), 4),
                             round(pt.get("steps", 0.0), 1)))
    with open(docs / "experiments.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    print(f"[fig] wrote {docs / 'experiments.csv'} ({len(rows) - 1} rows)")

    for scene, v in verdicts.items():
        pareto_figure(scene, results["scenes"][scene], v,
                      img / f"roi_pareto_{scene}.png")
        print(f"[fig] wrote {img / f'roi_pareto_{scene}.png'}")

    if not args.skip_frames:
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        except Exception:
            pass
        from mri_raytracer_tpu.eval import roi_protocol
        from mri_raytracer_tpu.ops import roi_policy

        shape = tuple(int(x) for x in args.shape.split(","))
        pol = roi_policy.load_policy(docs / "roi_policy.npz")
        # Render frames at the operating point the eval run recorded, not a
        # hardcoded one (meta sits next to the exported policy npz).
        meta_path = docs / "roi_policy_meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        n_coarse = int(meta.get("n_coarse", 40))
        # Probe stride follows the FIGURE resolution (the meta value was
        # recorded at the protocol's 1920px).
        probe_stride = roi_protocol.auto_probe_stride(args.width)
        for sc in roi_protocol.build_scenes(shape):
            name = sc["name"]
            if name not in verdicts:
                continue
            out_png = img / ("roi_frames_" + name + ".png")
            frames_figure(sc, pol, verdicts[name], args.width,
                          args.ref_steps, out_png,
                          n_coarse=n_coarse, probe_stride=probe_stride)
            print(f"[fig] wrote {out_png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
