#!/usr/bin/env python
"""Regenerate docs/ROI_RESULTS{_hard}.md from an existing
docs/roi_results{_hard}.json (no renders) — used to re-report a completed
protocol run with the current report format (verdict table + anchor sweep).
"""
import argparse
import json
import pathlib as _pl
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="showcase",
                    choices=["showcase", "adversarial"])
    ap.add_argument("--docs", default=str(_pl.Path(__file__).resolve()
                                          .parents[1] / "docs"))
    args = ap.parse_args(argv)
    from mri_raytracer_tpu.eval import roi_protocol

    docs = _pl.Path(args.docs)
    suffix = "" if args.suite == "showcase" else "_hard"
    results = json.loads((docs / f"roi_results{suffix}.json").read_text())
    lod_line = None
    ab = results.get("lod_ablation")
    if ab and ab.get("policy") and ab.get("policy_lod"):
        pl_, plod = ab["policy"][-1], ab["policy_lod"][-1]
        lod_line = (f"LOD ablation (primary scene, n={pl_['n']}, fine-tuned "
                    f"head): policy {pl_['wpsnr']:.2f} dB wPSNR / "
                    f"{pl_['ms']:.1f} ms -> +LOD {plod['wpsnr']:.2f} dB / "
                    f"{plod['ms']:.1f} ms "
                    f"(delta {plod['wpsnr'] - pl_['wpsnr']:+.2f} dB, "
                    f"{plod['ms'] - pl_['ms']:+.1f} ms).")
    md = docs / ("ROI_RESULTS_hard.md" if suffix else "ROI_RESULTS.md")
    roi_protocol.write_report(results, md, suite=args.suite,
                              lod_line=lod_line)
    print(f"[roi-report] wrote {md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
