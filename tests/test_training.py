"""Training engine end-to-end on synthetic data + unit pieces."""

import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.config import TrainConfig, ModelConfig, LossConfig, OptimConfig
from mri_raytracer_tpu.data import synthetic
from mri_raytracer_tpu.io import checkpoint as ckpt
from mri_raytracer_tpu.models.api import build_model
from mri_raytracer_tpu.train import engine, optimizers, steps
from mri_raytracer_tpu import losses


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats_train")
    synthetic.write_synthetic_dataset(root, num_cases=3, shape=(16, 16, 12), seed=3)
    return root


def _tiny_config(dataset, tmp_path, **kw):
    c = TrainConfig()
    c.data.data_root = str(dataset)
    c.data.case_limit = 3
    c.data.num_folds = 3
    c.data.fold_index = 0
    c.data.pool_size = 2
    c.data.pool_refresh = 0
    c.model.hidden_dims = (16, 16)
    c.model.fourier_freqs = 2
    c.train_steps = 12
    c.global_batch = 256
    c.micro_batch = 128
    c.checkpoint_every = 10
    c.log_every = 4
    c.out_dir = str(tmp_path / "run")
    c.update(kw)
    return c


def test_losses_zoo():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (64, 4))
    labels = jax.random.randint(key, (64,), 0, 4)
    base = LossConfig()
    l, aux = losses.segmentation_loss(logits, labels, base, 4)
    assert np.isfinite(float(l))
    assert aux["dice_per_class"].shape == (4,)
    # every optional term keeps the loss finite and changes its value
    variants = [
        dict(focal_gamma=2.0), dict(label_smoothing=0.1),
        dict(edema_fp_weight=0.5), dict(tversky_weight=0.5),
        dict(edema_logit_reg=0.1), dict(unified_focal_weight=1.0),
        dict(per_class_dice=True),
    ]
    for v in variants:
        cfg = LossConfig(**v)
        lv, _ = losses.segmentation_loss(logits, labels, cfg, 4)
        assert np.isfinite(float(lv)), v


def test_loss_decreases_with_perfect_logits():
    labels = jnp.array([0, 1, 2, 3] * 16)
    good = jax.nn.one_hot(labels, 4) * 10.0
    bad = -jax.nn.one_hot(labels, 4) * 10.0
    cfg = LossConfig()
    lg, _ = losses.segmentation_loss(good, labels, cfg, 4)
    lb, _ = losses.segmentation_loss(bad, labels, cfg, 4)
    assert float(lg) < float(lb)


@pytest.mark.parametrize("name", ["adamw", "adam", "sgd", "lion", "muon",
                                  "prodigy", "dadapt_adamw",
                                  "schedule_free_adamw", "momo_adam"])
def test_optimizer_zoo(name):
    cfg = OptimConfig(optimizer=name)
    opt = optimizers.build_optimizer(cfg, 100)
    params = [{"W": jnp.ones((4, 3)), "b": jnp.zeros(3)}]
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params, value=jnp.float32(1.0))
    assert jnp.isfinite(updates[0]["W"]).all()


def test_schedules():
    for s in ("constant", "warmup_cosine", "cosine", "two_stage"):
        cfg = OptimConfig(schedule=s, lr=1e-3, warmup_steps=10)
        sched = optimizers.build_schedule(cfg, 100)
        if callable(sched):
            vals = [float(sched(i)) for i in (0, 50, 99)]
            assert all(np.isfinite(v) and v >= 0 for v in vals)


def test_train_end_to_end(dataset, tmp_path):
    c = _tiny_config(dataset, tmp_path)
    state = engine.train_inr(c)
    assert state["history"][0]["loss"] > state["history"][-1]["loss"] * 0.5  # moving
    # final object checkpoint + sidecar exist and load
    params, cfg = ckpt.model_load(state["checkpoint"])
    assert cfg["FOURIER_FREQS"] == 2
    # flat reference-format checkpoint round-trips
    flat = ckpt.load_params(str(tmp_path / "run" / f"{c.run_name}_flat.npz"))
    assert len(flat) == 3  # 2 hidden + 1 out layer
    # eval produced aggregates
    assert state["eval"] is not None
    assert "mean_dice" in state["eval"]
    # scalar log exists
    assert (tmp_path / "run" / f"{c.run_name}_scalars.jsonl").exists()


def test_train_resume(dataset, tmp_path):
    c = _tiny_config(dataset, tmp_path)
    state = engine.train_inr(c)
    c2 = _tiny_config(dataset, tmp_path)
    c2.train_steps = 3
    c2.resume_from = state["checkpoint"]
    state2 = engine.train_inr(c2)
    assert state2["history"][-1]["loss"] < 10.0


def test_resume_shape_mismatch_raises(dataset, tmp_path):
    c = _tiny_config(dataset, tmp_path)
    state = engine.train_inr(c)
    c2 = _tiny_config(dataset, tmp_path)
    c2.model.hidden_dims = (8, 8)
    c2.resume_from = state["checkpoint"]
    with pytest.raises(ValueError, match="shape mismatch"):
        engine.train_inr(c2)


@pytest.mark.parametrize("kind", ["siren", "coord_injection"])
def test_model_variants_train(dataset, tmp_path, kind):
    c = _tiny_config(dataset, tmp_path)
    c.model.kind = kind
    c.model.dropout = 0.1 if kind == "coord_injection" else 0.0
    c.train_steps = 4
    state = engine.train_inr(c)
    assert np.isfinite(state["history"][-1]["loss"])


def test_tumor_sampler_training(dataset, tmp_path):
    c = _tiny_config(dataset, tmp_path)
    c.data.sampler = "tumor"
    c.train_steps = 4
    state = engine.train_inr(c)
    assert np.isfinite(state["history"][-1]["loss"])


def test_coord_noise_schedule():
    s = steps.make_coord_noise_schedule(0.3, 0.1, 100)
    assert abs(float(s(jnp.int32(0))) - 0.3) < 1e-6
    assert abs(float(s(jnp.int32(100))) - 0.1) < 1e-6
    assert steps.make_coord_noise_schedule(0.0, 0.0, 100) is None


def test_inspect_npz(tmp_path):
    p = tmp_path / "x.npz"
    ckpt.save_flat([{"W": np.ones((3, 2)), "b": np.zeros(2)}], p)
    lines = ckpt.inspect_npz(p)
    assert any("W_0" in l for l in lines)


def test_hybrid_sampler_training(dataset, tmp_path):
    """Hybrid (MC-dropout uncertainty) sampler runs in-graph with live params."""
    c = _tiny_config(dataset, tmp_path)
    c.data.sampler = "hybrid"
    c.model.kind = "coord_injection"
    c.model.dropout = 0.2
    c.train_steps = 3
    state = engine.train_inr(c)
    assert np.isfinite(state["history"][-1]["loss"])


def test_tv_loss_training(dataset, tmp_path):
    """Spatial-coherence TV patch loss (reference L8) in the jitted step."""
    c = _tiny_config(dataset, tmp_path)
    c.loss.tv_weight = 0.1
    c.train_steps = 3
    state = engine.train_inr(c)
    assert np.isfinite(state["history"][-1]["loss"])


def test_two_stage_schedule_training(dataset, tmp_path):
    c = _tiny_config(dataset, tmp_path)
    c.optim.schedule = "two_stage"
    c.optim.coord_noise_sigma_start = 0.3
    c.optim.coord_noise_sigma_end = 0.1
    c.train_steps = 4
    state = engine.train_inr(c)
    assert np.isfinite(state["history"][-1]["loss"])


def test_periodic_eval_and_best_checkpoint(dataset, tmp_path):
    """eval_every triggers mid-training validation + best-checkpoint save +
    rich observability (bar/table JSONL mirrors, slice overlay PNGs, live
    dashboard — reference O3/O6)."""
    c = _tiny_config(dataset, tmp_path)
    c.eval_every = 6
    c.train_steps = 12
    c.live_dashboard = True
    state = engine.train_inr(c)
    run = tmp_path / "run"
    best = run / f"{c.run_name}_best.npz"
    assert best.exists()
    params, info = ckpt.model_load(best)
    assert "val_mean_dice" in info
    # rich logging artifacts
    assert (run / f"{c.run_name}_tables.jsonl").exists()
    media = list((run / "media").glob("val_slice_overlay_step*.png"))
    assert media, "slice overlay PNGs missing"
    assert (run / "dashboard.png").exists()
    import json
    recs = [json.loads(l) for l in
            (run / f"{c.run_name}_scalars.jsonl").read_text().splitlines()]
    bar_keys = [k for r in recs for k in r if k.startswith("val/dice_per_class/")]
    assert bar_keys, "per-class bar values missing from scalars"


def test_boundary_weighted_training(dataset, tmp_path):
    """loss.boundary_weight > 0 builds boundary maps into the pool and the
    jitted step consumes them."""
    c = _tiny_config(dataset, tmp_path)
    c.loss.boundary_weight = 2.0
    c.train_steps = 4
    state = engine.train_inr(c)
    assert np.isfinite(state["history"][-1]["loss"])


def test_exact_train_state_resume(dataset, tmp_path):
    """Resuming from a train-state checkpoint (params + opt moments + RNG +
    step) reproduces the uninterrupted run bit-exactly."""
    ca = _tiny_config(dataset, tmp_path)
    ca.train_steps = 8
    ca.checkpoint_every = 4
    ca.out_dir = str(tmp_path / "runA")
    full = engine.train_inr(ca)

    cb = _tiny_config(dataset, tmp_path)
    cb.train_steps = 4
    cb.checkpoint_every = 4
    cb.out_dir = str(tmp_path / "runB")
    engine.train_inr(cb)
    cc = _tiny_config(dataset, tmp_path)
    cc.train_steps = 8
    cc.checkpoint_every = 0
    cc.out_dir = str(tmp_path / "runB2")
    cc.resume_from = str(tmp_path / "runB" / f"{cb.run_name}_trainstate.npz")
    resumed = engine.train_inr(cc)

    fa = jax.tree_util.tree_leaves(full["params"])
    fb = jax.tree_util.tree_leaves(resumed["params"])
    for a, b in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_written_checkpoint_fixtures(tmp_path):
    """Load checkpoints written EXACTLY the way the reference writes them
    (raw numpy, no framework code) — interop by fixture, not construction.

    Formats per inr/inr/train.py:216-223 (flat), :371-411 (object-array +
    sidecar) and inr/inr/model.py:217-301 (single-key fallback)."""
    rng = np.random.default_rng(0)
    layers = [{"W": rng.normal(size=(7, 16)).astype(np.float32),
               "b": rng.normal(size=(16,)).astype(np.float32)},
              {"W": rng.normal(size=(16, 4)).astype(np.float32),
               "b": rng.normal(size=(4,)).astype(np.float32)}]

    # 1. periodic flat checkpoint: np.savez_compressed(W_0, b_0, ...)
    flat_p = tmp_path / "ref_step000200.npz"
    np.savez_compressed(flat_p, **{f"W_{i}": l["W"] for i, l in enumerate(layers)},
                        **{f"b_{i}": l["b"] for i, l in enumerate(layers)})
    got = ckpt.load_params(flat_p)
    for a, b in zip(got, layers):
        np.testing.assert_array_equal(a["W"], b["W"])
        np.testing.assert_array_equal(a["b"], b["b"])

    # 2. final object-array checkpoint + _info.json sidecar
    obj_p = tmp_path / "ref_run.npz"
    arr = np.empty((), dtype=object)
    arr[()] = layers
    np.savez_compressed(obj_p, params=arr)
    (tmp_path / "ref_run_info.json").write_text(json.dumps(
        {"FOURIER_FREQS": 6, "HIDDEN_DIMS": [16], "NUM_CLASSES": 4}))
    got, cfg = ckpt.model_load(obj_p)
    np.testing.assert_array_equal(got[0]["W"], layers[0]["W"])
    assert cfg["FOURIER_FREQS"] == 6

    # 3. single-key fallback
    single_p = tmp_path / "ref_other.npz"
    np.savez(single_p, weights=arr)
    got = ckpt.load_params(single_p)
    np.testing.assert_array_equal(got[1]["b"], layers[1]["b"])

    # 4. reverse direction: a reference-style reader (raw numpy, the
    # model_load logic) understands OUR save_flat output.
    ours = tmp_path / "ours_flat.npz"
    ckpt.save_flat(layers, ours)
    with np.load(ours) as z:
        n = sum(1 for k in z.files if k.startswith("W_"))
        assert n == 2
        np.testing.assert_array_equal(z["W_1"], layers[1]["W"])
