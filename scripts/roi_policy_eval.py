#!/usr/bin/env python
"""ROI policy-renderer evaluation at the reference's reporting protocol:
train the policy (validation-selected checkpoint), run the Pareto sweep on
the benchmark scenes over a >=30-frame camera orbit at 1920x1080, apply the
showcase-plan success rule, and report median + bootstrap 95% CI across
frames for PSNR / ROI-weighted PSNR / SSIM and ms/frame.

Protocol: /root/reference docs/Methodology-ROI-Neural-Volumetric-Rendering.md:53-60
("early stop on validation PSNR; choose checkpoint by best ROI-weighted
PSNR at target speed"; "Quality: PSNR/SSIM vs fine reference") and
docs/showcase-plan.md:39-49 ("Resolution: 1920x1080 fixed", "median over
>= 30 frames", "report 95% CI across frames for PSNR/SSIM and ms/frame").
Writes docs/ROI_RESULTS.md (+ _hard.md for the adversarial suite) plus a
JSON dump per suite.
"""
import argparse
import json
import pathlib as _pl
import sys

sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="96,96,80")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--ref-steps", type=int, default=512)
    ap.add_argument("--budgets", default="16,24,28,32,36,40,48,64,96",
                    help="fine grid around the expected operating points "
                         "(24-40): the success rule picks the FASTEST "
                         "qualifying budget, so coarse spacing rounds the "
                         "achievable speedup down")
    ap.add_argument("--train-steps", type=int, default=800)
    ap.add_argument("--train-res", type=int, default=96)
    ap.add_argument("--quality-frames", type=int, default=30,
                    help="orbit poses for the across-frame quality stats")
    ap.add_argument("--timing-frames", type=int, default=30)
    ap.add_argument("--n-coarse", type=int, default=48)
    ap.add_argument("--probe-stride", type=int, default=0,
                    help="0 = auto (scales with resolution)")
    ap.add_argument("--block", type=int, default=32,
                    help="sample-block size for the memory-bounded march")
    ap.add_argument("--tuned-budget", type=int, default=64)
    ap.add_argument("--suite", default="showcase",
                    choices=["showcase", "adversarial"])
    ap.add_argument("--ref-cache", default="/tmp/roi_refs")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize forces the "
                    "TPU platform, so an env var alone is not enough)")
    ap.add_argument("--no-foveated", action="store_true",
                    help="skip the foveated operating points (full-res ROI "
                    "inset + half-res background)")
    ap.add_argument("--policy-in", default=None,
                    help="skip training: load this policy npz (+ its _lod "
                    "sibling if present) — resume support for flaky "
                    "device links")
    ap.add_argument("--resume", action="store_true",
                    help="reuse per-scene sweeps already checkpointed in "
                    "the suite's results JSON (scene + heldout + verdict "
                    "present) — skip straight to the first unmeasured "
                    "scene after a tunnel/VM death")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from mri_raytracer_tpu.eval import roi_protocol
    from mri_raytracer_tpu.ops import roi_policy

    shape = tuple(int(x) for x in args.shape.split(","))
    budgets = [int(x) for x in args.budgets.split(",")]
    stride = args.probe_stride or roi_protocol.auto_probe_stride(args.width)
    ru = roi_protocol.auto_rho_upsample(stride)
    scenes = roi_protocol.build_scenes(shape, suite=args.suite)
    print(f"[roi] scenes: {[s['name'] for s in scenes]} "
          f"backend={jax.default_backend()} res={args.width}x{args.height} "
          f"probe_stride={stride} rho_upsample={ru}")

    # ---- train multi-scene on the benchmark scenes' TRAIN views
    # (Methodology:50 "a small set of volumes (medical + non-medical)").
    # Validation for checkpoint selection/early stop (Methodology:53): the
    # primary scene's held-out views — disjoint from every training view.
    R = args.train_res
    train_stride = 3  # training operates at train_res; keep r2's setting

    def scene_task(sc, held=False):
        p_s = sc["params"]
        vs = [jnp.asarray(v)
              for v in roi_protocol.make_views(sc["radius"], held_out=held)]
        rs, ws = [], []
        for bv in vs:
            ref, _ = roi_policy.render_fixed(
                roi_protocol.scene_tuple(sc)[0], bv, p_s, R, R,
                args.ref_steps)
            rs.append(ref)
            P_img, B_img = roi_policy.project_roi_maps(sc["P"], sc["B"], bv,
                                                       p_s, R, R)
            ws.append(roi_policy.roi_weight_map(P_img, B_img))
        return roi_protocol.scene_tuple(sc), p_s, vs, rs, ws

    tasks = [scene_task(sc) for sc in scenes[:4]]
    (tr_sc, p, views, refs, weights) = tasks[0]
    _, _, val_views, val_refs, val_weights = scene_task(scenes[0], held=True)
    out_dir = _pl.Path(args.out or
                       _pl.Path(__file__).resolve().parents[1] / "docs")
    out_dir.mkdir(parents=True, exist_ok=True)
    pol_lod_in = None
    if args.policy_in:
        pol = roi_policy.load_policy(args.policy_in)
        meta_f = _pl.Path(args.policy_in).with_name(
            _pl.Path(args.policy_in).stem + "_meta.json")
        sel = (json.loads(meta_f.read_text()).get("selection", {})
               if meta_f.exists() else {})
        sel.setdefault("selected_step", -1)
        sel.setdefault("steps_run", -1)
        losses = [float("nan"), float("nan")]
        lod_f = _pl.Path(args.policy_in).with_name(
            _pl.Path(args.policy_in).stem + "_lod.npz")
        if lod_f.exists():
            pol_lod_in = roi_policy.load_policy(lod_f)
        print(f"[roi] loaded policy from {args.policy_in} "
              f"(lod checkpoint: {pol_lod_in is not None})")
    else:
        # Selection "at target speed" (Methodology:53): validate at the
        # OPERATING budgets — about tuned/1.8x and nearby — not the training
        # budget. (A protocol run that selected on n=48 alone picked the
        # near-init step-50 checkpoint and lost the low-budget gains that
        # the 1.8x bar is scored on.)
        op = max(16, int(round(args.tuned_budget / 1.8 / 4)) * 4)
        pol, losses, sel = roi_policy.train_policy(
            jax.random.PRNGKey(0), tr_sc, views, refs, p,
            R, R, steps=args.train_steps, n_coarse=args.n_coarse,
            n_fine=budgets[len(budgets) // 2], weights=weights,
            probe_stride=train_stride, extra_scenes=tasks[1:],
            val_views=val_views, val_refs=val_refs, val_weights=val_weights,
            val_budgets=(max(16, op - 8), op, op + 8))
        print(f"[roi] policy trained: loss {losses[0]:.2e} -> "
              f"{losses[-1]:.2e}; "
              f"selected step {sel['selected_step']}/{sel['steps_run']} "
              f"(val wPSNR {sel['best_val_wpsnr']:.2f} dB, "
              f"early_stopped={sel['early_stopped']})")
        roi_policy.save_policy(out_dir / "roi_policy.npz", pol,
                               meta={"train_steps": args.train_steps,
                                     "n_coarse": args.n_coarse,
                                     "probe_stride": stride,
                                     "selection": sel})

    # ---- protocol sweep: every scene over the >=30-pose orbit at full
    # resolution; the first four scenes vote on the bar. Held-out check:
    # a disjoint phase-shifted orbit, evaluated at the operating-point
    # budgets found on the standard orbit.
    suffix = "_hard" if args.suite == "adversarial" else ""
    results = {"losses_first_last": [losses[0], losses[-1]],
               "selection": sel, "probe_stride": stride,
               "resolution": [args.width, args.height],
               "scenes": {}}
    verdicts = []
    results_f = out_dir / f"roi_results{suffix}.json"
    prior = {}
    if args.resume and results_f.exists():
        try:
            old = json.loads(results_f.read_text())
            # Only trust a checkpoint produced at the same protocol scale.
            if old.get("resolution") == [args.width, args.height]:
                prior = old
                done = [v["scene"] for v in old.get("verdicts", [])
                        if v["scene"] in old.get("scenes", {})
                        and v["scene"] + "-heldout" in old.get("scenes", {})]
                print(f"[roi] resume: reusing measured scenes {done}")
        except Exception as e:
            print(f"[roi] resume: ignoring unreadable checkpoint ({e})",
                  file=sys.stderr)

    def checkpoint_results():
        # Incremental persistence: a crash in a later stage (e.g. an OOM in
        # the optional LOD ablation) must never lose hours of measured
        # sweeps again.
        results_f.write_text(json.dumps(results, indent=1))

    for i, sc in enumerate(scenes):
        pv = next((v for v in prior.get("verdicts", [])
                   if v["scene"] == sc["name"]), None)
        if (pv is not None and sc["name"] in prior.get("scenes", {})
                and sc["name"] + "-heldout" in prior.get("scenes", {})):
            results["scenes"][sc["name"]] = prior["scenes"][sc["name"]]
            results["scenes"][sc["name"] + "-heldout"] = \
                prior["scenes"][sc["name"] + "-heldout"]
            verdicts.append(pv)
            results["verdicts"] = verdicts
            checkpoint_results()
            print(f"[roi] {sc['name']}: resumed "
                  f"(speedup={pv['speedup']:.2f}x success={pv['success']})")
            continue
        vs = roi_protocol.make_orbit_views(sc["radius"],
                                           args.quality_frames)
        sweep = roi_protocol.pareto_sweep(
            pol, sc, vs, budgets, width=args.width, height=args.height,
            ref_steps=args.ref_steps, n_frames=args.timing_frames,
            n_coarse=args.n_coarse, probe_stride=stride, block=args.block,
            ref_cache=args.ref_cache, foveated=not args.no_foveated)
        results["scenes"][sc["name"]] = sweep
        v = roi_protocol.evaluate_success(sweep,
                                          tuned_budget=args.tuned_budget)
        v["scene"] = sc["name"]
        v["counts_toward_bar"] = i < 4
        verdicts.append(v)
        print(f"[roi] {sc['name']}: speedup={v['speedup']:.2f}x "
              f"success={v['success']} (B1 n={v['tuned_n']})"
              f"{'' if i < 4 else ' [unseen-subject check]'}")

        # Held-out orbit at the operating points only (cost control; the
        # full grid is already measured on the standard orbit).
        op_budgets = sorted({v["tuned_n"]} |
                            ({v["policy_n"]} if v.get("policy_n") else set()))
        vs_h = roi_protocol.make_orbit_views(sc["radius"],
                                             max(15, args.quality_frames // 2),
                                             held_out=True)
        sweep_h = roi_protocol.pareto_sweep(
            pol, sc, vs_h, op_budgets, width=args.width,
            height=args.height, ref_steps=args.ref_steps,
            n_frames=args.timing_frames, n_coarse=args.n_coarse,
            probe_stride=stride, block=args.block,
            ref_cache=args.ref_cache, foveated=not args.no_foveated)
        results["scenes"][sc["name"] + "-heldout"] = sweep_h
        # Held-out view quality target (showcase-plan:49: <= 0.7 dB extra
        # loss): policy wPSNR delta standard-orbit -> held-out-orbit at the
        # policy operating point (same renderer kind: plain or foveated).
        if v.get("policy_n") is not None:
            kind = v.get("policy_kind", "policy")
            q_std = next(q for q in sweep[kind] if q["n"] == v["policy_n"])
            q_ho = next(q for q in sweep_h[kind]
                        if q["n"] == v["policy_n"])
            v["heldout_extra_loss_db"] = round(q_std["wpsnr"]
                                               - q_ho["wpsnr"], 3)
            v["heldout_ok"] = v["heldout_extra_loss_db"] <= 0.7
        results["verdicts"] = verdicts
        checkpoint_results()

    # ---- LOD ablation (Methodology:43 optional output): fine-tune the LOD
    # head on top of the selected checkpoint (training renders with the mip
    # blend so the third output receives gradient — without this the head
    # stays at its neutral init and the ablation would measure a fixed
    # log2(dt) heuristic, not a learned output), then sweep the primary
    # scene at the operating budgets with vs without the blend.
    lod_line = None
    if pol_lod_in is not None:
        pol_lod = pol_lod_in
    else:
        # lr: Adam's step magnitude ~= lr, and the LOD logit must travel
        # O(1) from neutral within a few hundred steps (3e-4 moves it
        # ~0.03 — the head would stay effectively frozen).
        pol_lod, lod_losses, _ = roi_policy.train_policy(
            jax.random.PRNGKey(1), tr_sc, views, refs, p, R, R,
            steps=max(200, args.train_steps // 4), n_coarse=args.n_coarse,
            n_fine=budgets[len(budgets) // 2], weights=weights, lr=5e-3,
            probe_stride=train_stride, extra_scenes=tasks[1:], init=pol,
            lod_vols=[sc.get("mixed_p1") for sc in scenes[:4]])
        print(f"[roi] LOD fine-tune: loss {lod_losses[0]:.2e} -> "
              f"{lod_losses[-1]:.2e}")
        roi_policy.save_policy(out_dir / "roi_policy_lod.npz", pol_lod,
                               meta={"finetuned_from": "roi_policy.npz",
                                     "lod": True})
    v0 = verdicts[0]
    ab_budgets = sorted({v0["tuned_n"]} |
                        ({v0["policy_n"]} if v0.get("policy_n") else set()))
    vs0 = roi_protocol.make_orbit_views(scenes[0]["radius"],
                                        max(10, args.quality_frames // 3))
    try:
        # The LOD blend holds BOTH the fine and mip corner-gathers (+ lam)
        # live per sample block — roughly 2.5x the plain policy march's
        # peak; block//4 keeps the 1080p ablation inside HBM (a full-block
        # attempt allocated 34 GB and killed a 2 h protocol run).
        sweep_lod = roi_protocol.pareto_sweep(
            pol, scenes[0], vs0, ab_budgets, width=args.width,
            height=args.height, ref_steps=args.ref_steps,
            n_frames=max(6, args.timing_frames // 3), n_coarse=args.n_coarse,
            probe_stride=stride, block=max(8, args.block // 4),
            ref_cache=args.ref_cache, lod=True, policy_lod=pol_lod)
        results["lod_ablation"] = sweep_lod
        pl_, plod = sweep_lod["policy"][-1], sweep_lod["policy_lod"][-1]
        lod_line = (f"LOD ablation ({scenes[0]['name']}, n={pl_['n']}, "
                    f"fine-tuned head): policy "
                    f"{pl_['wpsnr']:.2f} dB wPSNR / {pl_['ms']:.1f} ms -> "
                    f"+LOD {plod['wpsnr']:.2f} dB / {plod['ms']:.1f} ms "
                    f"(delta {plod['wpsnr'] - pl_['wpsnr']:+.2f} dB, "
                    f"{plod['ms'] - pl_['ms']:+.1f} ms).")
        print(f"[roi] {lod_line}")
    except Exception as e:  # the ablation is optional; never lose the run
        lod_line = f"LOD ablation skipped ({type(e).__name__})."
        print(f"[roi] LOD ablation failed: {e}", file=sys.stderr)

    n_ok = sum(v["success"] for v in verdicts if v["counts_toward_bar"])
    results["verdicts"] = verdicts
    results["success_bar"] = {"target": ">=1.8x at <=0.5 dB on >=3/4 scenes",
                              "scenes_passing": n_ok,
                              "overall": n_ok >= 3}
    print(f"[roi] OVERALL: {n_ok}/4 scenes pass the 1.8x bar -> "
          f"{'SUCCESS' if n_ok >= 3 else 'FAIL'}")

    checkpoint_results()

    md = out_dir / ("ROI_RESULTS_hard.md" if suffix else "ROI_RESULTS.md")
    roi_protocol.write_report(results, md, suite=args.suite,
                              lod_line=lod_line)
    print(f"[roi] wrote {md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
