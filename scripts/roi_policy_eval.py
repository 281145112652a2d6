#!/usr/bin/env python
"""ROI policy-renderer evaluation: train the policy, run the Pareto sweep on
four scenes (train + held-out views), apply the showcase-plan success rule.

Protocol: docs/Methodology-ROI-Neural-Volumetric-Rendering.md:56-60 and
docs/showcase-plan.md:39-49 of the reference. Writes docs/ROI_RESULTS.md
plus a JSON dump.
"""
import argparse
import json
import pathlib as _pl
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="96,96,80")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--ref-steps", type=int, default=512)
    ap.add_argument("--budgets", default="16,24,32,48,64,96,128")
    ap.add_argument("--train-steps", type=int, default=800)
    ap.add_argument("--train-res", type=int, default=96)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--n-coarse", type=int, default=48)
    ap.add_argument("--probe-stride", type=int, default=3)
    ap.add_argument("--tuned-budget", type=int, default=64)
    ap.add_argument("--suite", default="showcase",
                    choices=["showcase", "adversarial"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.eval import roi_protocol
    from mri_raytracer_tpu.ops import roi_policy

    shape = tuple(int(x) for x in args.shape.split(","))
    budgets = [int(x) for x in args.budgets.split(",")]
    scenes = roi_protocol.build_scenes(shape, suite=args.suite)
    print(f"[roi] scenes: {[s['name'] for s in scenes]} "
          f"backend={jax.default_backend()}")

    # ---- train multi-scene on the benchmark scenes' TRAIN views
    # (Methodology:50 "a small set of volumes (medical + non-medical)");
    # held-out = the disjoint view set + the unseen tumor-b subject.
    R = args.train_res

    def scene_task(sc):
        p_s = sc["params"]
        vs = [jnp.asarray(v) for v in roi_protocol.make_views(sc["radius"])]
        rs, ws = [], []
        for bv in vs:
            ref, _ = roi_policy.render_fixed(sc["mixed"], bv, p_s, R, R,
                                             args.ref_steps)
            rs.append(ref)
            P_img, B_img = roi_policy.project_roi_maps(sc["P"], sc["B"], bv,
                                                       p_s, R, R)
            ws.append(roi_policy.roi_weight_map(P_img, B_img))
        return roi_protocol.scene_tuple(sc), p_s, vs, rs, ws

    tasks = [scene_task(sc) for sc in scenes[:4]]
    (tr_sc, p, views, refs, weights) = tasks[0]
    pol, losses = roi_policy.train_policy(
        jax.random.PRNGKey(0), tr_sc, views, refs, p,
        R, R, steps=args.train_steps, n_coarse=args.n_coarse,
        n_fine=budgets[len(budgets) // 2], weights=weights,
        probe_stride=args.probe_stride, extra_scenes=tasks[1:])
    print(f"[roi] policy trained: loss {losses[0]:.2e} -> {losses[-1]:.2e}")
    out_dir = _pl.Path(args.out or
                       _pl.Path(__file__).resolve().parents[1] / "docs")
    out_dir.mkdir(parents=True, exist_ok=True)
    roi_policy.save_policy(out_dir / "roi_policy.npz", pol,
                           meta={"train_steps": args.train_steps,
                                 "n_coarse": args.n_coarse,
                                 "probe_stride": args.probe_stride})

    # ---- sweep every scene, train and held-out views. The first four
    # scenes are the showcase-plan benchmark; any extra (tumor-b) is the
    # unseen-subject generalization check and does not vote on the bar.
    results = {"losses_first_last": [losses[0], losses[-1]], "scenes": {}}
    verdicts = []
    for i, sc in enumerate(scenes):
        for held in (False, True):
            vs = roi_protocol.make_views(sc["radius"], held_out=held)
            sweep = roi_protocol.pareto_sweep(
                pol, sc, vs, budgets, width=args.res, height=args.res,
                ref_steps=args.ref_steps, n_frames=args.frames,
                n_coarse=args.n_coarse, probe_stride=args.probe_stride)
            tag = f"{sc['name']}{'-heldout' if held else ''}"
            results["scenes"][tag] = sweep
            if not held:
                v = roi_protocol.evaluate_success(sweep, tuned_budget=args.tuned_budget)
                v["scene"] = sc["name"]
                v["counts_toward_bar"] = i < 4
                verdicts.append(v)
                print(f"[roi] {tag}: speedup={v['speedup']:.2f}x "
                      f"success={v['success']} (B1 n={v['tuned_n']})"
                      f"{'' if i < 4 else ' [unseen-subject check]'}")
    n_ok = sum(v["success"] for v in verdicts if v["counts_toward_bar"])
    results["verdicts"] = verdicts
    results["success_bar"] = {"target": ">=1.8x at <=0.5 dB on >=3/4 scenes",
                              "scenes_passing": n_ok,
                              "overall": n_ok >= 3}
    print(f"[roi] OVERALL: {n_ok}/4 scenes pass the 1.8x bar -> "
          f"{'SUCCESS' if n_ok >= 3 else 'FAIL'}")

    out = out_dir
    (out / "roi_results.json").write_text(json.dumps(results, indent=1))

    lines = ["# ROI policy renderer — protocol results", "",
             f"Backend: {jax.default_backend()}; eval {args.res}^2, "
             f"reference = fixed-step n={args.ref_steps}; median over "
             f"{args.frames} frames/point.", "",
             "| scene | B1 (n, ms, wPSNR) | policy (n, ms, wPSNR) | "
             "speedup | pass | Pareto | equal-budget gain |",
             "|---|---|---|---|---|---|---|"]
    for v in verdicts:
        name = v["scene"] + ("" if v["counts_toward_bar"]
                             else " (unseen-subject check)")
        pareto = (f"{v.get('pareto_dominated', 0)}/{v.get('pareto_total', 0)}"
                  f"{' DOM' if v.get('pareto_dominant') else ''}")
        gain = f"{v.get('equal_budget_gain_db', 0.0):+.1f} dB"
        if v.get("policy_n") is None:
            lines.append(f"| {name} | n={v['tuned_n']} | no point met "
                         f"the bar | - | NO | {pareto} | {gain} |")
            continue
        lines.append(
            f"| {name} | n={v['tuned_n']}, {v['tuned_ms']:.1f} ms | "
            f"n={v['policy_n']}, {v['policy_ms']:.1f} ms, "
            f"{v['policy_wpsnr']:.1f} dB | {v['speedup']:.2f}x | "
            f"{'YES' if v['success'] else 'no'} | {pareto} | {gain} |")
    lines += ["", f"**Overall: {n_ok}/4 scenes >= 1.8x at <= 0.5 dB** "
              f"({'SUCCESS' if n_ok >= 3 else 'FAIL'} vs showcase-plan bar).",
              "", "Held-out view sweeps are in `roi_results.json` "
              "(<= 0.7 dB extra loss bar)."]
    (out / "ROI_RESULTS.md").write_text("\n".join(lines) + "\n")
    print(f"[roi] wrote {out / 'ROI_RESULTS.md'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
