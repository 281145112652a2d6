"""RunLogger's W&B branch under a FAKE ``wandb`` module (VERDICT r4
missing #4: wandb is absent from this image, so the branch that mirrors
the reference's system-of-record usage — ``inr/inr/train.py:74-108``
init/config, ``:426-435`` ``wandb.plot.bar``/``wandb.Table``, image
logging ``jax_inr_training_wandb_improved.py:1005-1036``, artifact upload
``train.py:443-461`` — had never executed. This locks the full call
surface without the dependency, like ``test_nnunet_mocked.py`` does for
nnunetv2).
"""
import importlib
import json
import sys
import types

import numpy as np
import pytest


class _FakeRun:
    def __init__(self):
        self.logged = []          # (payload, step)
        self.summary = {}
        self.artifacts = []
        self.finished = False

    def log(self, payload, step=None):
        self.logged.append((payload, step))

    def log_artifact(self, art):
        self.artifacts.append(art)

    def finish(self):
        self.finished = True


class _FakeTable:
    def __init__(self, data=None, columns=None):
        self.data = data
        self.columns = columns


class _FakeBar:
    def __init__(self, table, x, y, title=""):
        self.table, self.x, self.y, self.title = table, x, y, title


class _FakeImage:
    def __init__(self, path, caption=""):
        self.path, self.caption = path, caption


class _FakeArtifact:
    def __init__(self, name, type=""):
        self.name, self.type, self.files = name, type, []

    def add_file(self, path):
        self.files.append(path)


@pytest.fixture()
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.calls = {}

    def init(**kwargs):
        mod.calls["init"] = kwargs
        mod.run = _FakeRun()
        return mod.run

    mod.init = init
    mod.Table = _FakeTable
    mod.Image = _FakeImage
    mod.Artifact = _FakeArtifact
    mod.plot = types.SimpleNamespace(bar=_FakeBar)
    monkeypatch.setitem(sys.modules, "wandb", mod)
    import mri_raytracer_tpu.io.logging as logging_mod

    importlib.reload(logging_mod)
    yield mod, logging_mod
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    importlib.reload(logging_mod)


def test_wandb_branch_full_surface(fake_wandb, tmp_path):
    mod, logging_mod = fake_wandb
    cfg = {"hidden": [32, 32], "steps": 10}
    lg = logging_mod.RunLogger(tmp_path, "demo", cfg, use_wandb=True,
                               wandb_project="proj-x", wandb_entity="ent-y",
                               tags=["t1"], notes="n")
    # init carries the reference's identity/config kwargs (train.py:74-108)
    assert mod.calls["init"] == {
        "project": "proj-x", "entity": "ent-y", "name": "demo",
        "config": cfg, "tags": ["t1"], "notes": "n"}
    run = mod.run
    assert lg.wandb_run is run

    lg.log({"loss": 0.5, "dice": 0.9}, step=3)
    assert ({"loss": 0.5, "dice": 0.9}, 3) in run.logged

    lg.log_bar("val/dice", ["bg", "tumor"], [0.99, 0.5], step=4)
    bar_payloads = [p for p, s in run.logged
                    if s == 4 and "val/dice" in p
                    and isinstance(p["val/dice"], _FakeBar)]
    assert bar_payloads, run.logged
    bar = bar_payloads[0]["val/dice"]
    assert bar.table.columns == ["class", "value"]
    assert bar.table.data == [["bg", 0.99], ["tumor", 0.5]]
    assert (bar.x, bar.y, bar.title) == ("class", "value", "val/dice")

    lg.log_table("folds", ["fold", "dice"], [[0, 0.8], [1, 0.7]], step=5)
    tbl = [p["folds"] for p, s in run.logged
           if s == 5 and isinstance(p.get("folds"), _FakeTable)]
    assert tbl and tbl[0].columns == ["fold", "dice"]

    img = np.zeros((4, 4, 3), np.float32)
    lg.log_image("render/orbit", img, step=6, caption="pose 0")
    ims = [p["render/orbit"] for p, s in run.logged
           if s == 6 and isinstance(p.get("render/orbit"), _FakeImage)]
    assert ims and ims[0].caption == "pose 0"
    assert ims[0].path.endswith("render_orbit_step000006.png")

    lg.log_summary({"best_dice": 0.91})
    assert run.summary["best_dice"] == 0.91

    ckpt = tmp_path / "model.npz"
    ckpt.write_bytes(b"x")
    lg.log_artifact(ckpt, kind="model")
    assert run.artifacts and run.artifacts[0].name == "demo-model"
    assert run.artifacts[0].type == "model"
    assert run.artifacts[0].files == [str(ckpt)]

    lg.finish()
    assert run.finished

    # Offline mirrors still written alongside the wandb stream.
    scal = (tmp_path / "demo_scalars.jsonl").read_text().strip().splitlines()
    assert any(json.loads(ln).get("loss") == 0.5 for ln in scal)
    assert (tmp_path / "training_config_and_results.json").exists()
    assert (tmp_path / "demo_tables.jsonl").exists()


def test_wandb_network_failure_never_kills_training(fake_wandb, tmp_path):
    """Reference wraps every W&B call in try/except (train.py:443-461);
    a raising backend must degrade to offline-only, not propagate."""
    mod, logging_mod = fake_wandb
    lg = logging_mod.RunLogger(tmp_path, "flaky", {}, use_wandb=True)

    def boom(*a, **k):
        raise ConnectionError("w&b down")

    mod.run.log = boom
    mod.run.log_artifact = boom
    lg.log({"loss": 1.0}, step=0)                      # must not raise
    lg.log_bar("b", ["x"], [1.0], step=0)
    lg.log_table("t", ["c"], [[1.0]], step=0)
    lg.log_image("i", np.zeros((2, 2, 3)), step=0)
    p = tmp_path / "w.npz"
    p.write_bytes(b"x")
    lg.log_artifact(p)
    scal = (tmp_path / "flaky_scalars.jsonl").read_text()
    assert '"loss": 1.0' in scal
