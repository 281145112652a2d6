"""nnU-Net pipeline integration test with a MOCKED nnunetv2 module.

nnunetv2 (and a GPU) are absent in this image, so the adapter's execution
path can't run for real; this locks the API *surface* instead — a fake
nnunetv2 records every call, and each one is asserted against the exact
argument signature the reference drives
(``/root/reference/scripts/nnunet_train_export.py:308-394``). Runs without
torch or nnunetv2 installed."""

import pathlib
import sys
import types

import numpy as np
import pytest


@pytest.fixture()
def fake_nnunet(monkeypatch, tmp_path):
    """Install a recording fake nnunetv2 into sys.modules."""
    calls = {}

    root = types.ModuleType("nnunetv2")
    ep = types.ModuleType("nnunetv2.experiment_planning")
    api = types.ModuleType(
        "nnunetv2.experiment_planning.plan_and_preprocess_api")
    run_mod = types.ModuleType("nnunetv2.run")
    run_tr = types.ModuleType("nnunetv2.run.run_training")
    share = types.ModuleType("nnunetv2.model_sharing")
    export = types.ModuleType("nnunetv2.model_sharing.model_export")

    def extract_fingerprints(ids, **kw):
        calls["fingerprint"] = (ids, kw)

    def plan_experiments(ids, **kw):
        calls["plan"] = (ids, kw)
        return "nnUNetPlans"

    def preprocess(ids, **kw):
        calls["preprocess"] = (ids, kw)

    def run_training(dataset, configuration, fold, **kw):
        calls["train"] = ((dataset, configuration, fold), kw)
        # nnU-Net writes results/<Dataset>/<trainer>__<plans>__<cfg>/fold_k/
        res = pathlib.Path(tmp_path / "work" / "nnUNet_results")
        d = (res / "Dataset501_BraTS2023"
             / f"{kw['trainer_class_name']}__{kw['plans_identifier']}"
               f"__{configuration}" / f"fold_{fold}")
        d.mkdir(parents=True, exist_ok=True)
        (d / "checkpoint_final.pth").write_bytes(b"\x00")

    def export_pretrained_model(dataset_id, out_path, **kw):
        calls["export"] = ((dataset_id, out_path), kw)
        pathlib.Path(out_path).write_bytes(b"\x00")

    api.extract_fingerprints = extract_fingerprints
    api.plan_experiments = plan_experiments
    api.preprocess = preprocess
    run_tr.run_training = run_training
    export.export_pretrained_model = export_pretrained_model
    root.experiment_planning = ep
    ep.plan_and_preprocess_api = api
    root.run = run_mod
    run_mod.run_training = run_tr
    root.model_sharing = share
    share.model_export = export

    for name, mod in [
            ("nnunetv2", root),
            ("nnunetv2.experiment_planning", ep),
            ("nnunetv2.experiment_planning.plan_and_preprocess_api", api),
            ("nnunetv2.run", run_mod),
            ("nnunetv2.run.run_training", run_tr),
            ("nnunetv2.model_sharing", share),
            ("nnunetv2.model_sharing.model_export", export)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return calls


def test_pipeline_drives_reference_api(fake_nnunet, tmp_path, monkeypatch):
    from mri_raytracer_tpu.data import synthetic
    from mri_raytracer_tpu.train import nnunet

    # torch may or may not be importable; pin the device decision so the
    # assertion below is environment-independent.
    monkeypatch.setattr(nnunet, "select_device", lambda: "cpu")

    data = tmp_path / "data"
    synthetic.write_synthetic_dataset(data, num_cases=2, shape=(12, 12, 10),
                                      seed=3)
    cases = sorted(p for p in data.iterdir() if p.is_dir())
    work = tmp_path / "work"

    ckpt = nnunet.run_pipeline(cases, work, dataset_id=501,
                               dataset_name="BraTS2023", fold=0,
                               num_processes=4, device="cpu")

    calls = fake_nnunet
    # fingerprint (reference :313): check_dataset_integrity=False,
    # clean=True, verbose=True
    ids, kw = calls["fingerprint"]
    assert ids == [501]
    assert kw == {"check_dataset_integrity": False, "clean": True,
                  "verbose": True}
    # plan (reference :316): bare id list
    assert calls["plan"][0] == [501]
    # preprocess (reference :321): plans threaded, tuple configs,
    # num_processes=(4,), verbose=False
    ids, kw = calls["preprocess"]
    assert ids == [501]
    assert kw == {"plans_identifier": "nnUNetPlans",
                  "configurations": ("3d_fullres",),
                  "num_processes": (4,), "verbose": False}
    # train (reference :355-368): STRING dataset arg — the FULL
    # 'DatasetXXX_Name' (reference :78,341; nnunetv2's
    # get_trainer_from_args rejects a bare suffix with ValueError)
    (ds, cfg, fold), kw = calls["train"]
    assert ds == "Dataset501_BraTS2023" and isinstance(ds, str)
    assert cfg == "3d_fullres" and fold == 0
    expect = {"trainer_class_name": "nnUNetTrainer",
              "plans_identifier": "nnUNetPlans", "num_gpus": 1,
              "export_validation_probabilities": False,
              "continue_training": False, "only_run_validation": False,
              "disable_checkpointing": False, "val_with_best": False}
    for k, v in expect.items():
        assert kw[k] == v, (k, kw.get(k))
    assert str(kw["device"]) == "cpu"  # torch.device('cpu') or 'cpu'
    # export (reference :383-393)
    (ds_id, out), kw = calls["export"]
    assert ds_id == 501 and out.endswith(".zip")
    assert kw == {"configurations": ("3d_fullres",),
                  "trainer": "nnUNetTrainer",
                  "plans_identifier": "nnUNetPlans", "folds": (0,),
                  "strict": False,
                  "save_checkpoints": ("checkpoint_final.pth",),
                  "export_crossval_predictions": False}
    # checkpoint located (reference :404-410)
    assert ckpt is not None and ckpt.name == "checkpoint_final.pth"

    # and the conversion actually produced the nnU-Net raw layout
    ds_dir = work / "nnUNet_raw" / "Dataset501_BraTS2023"
    assert (ds_dir / "dataset.json").exists()
    imgs = sorted((ds_dir / "imagesTr").iterdir())
    assert len(imgs) == 2 * 4  # 2 cases x 4 modalities
    labs = sorted((ds_dir / "labelsTr").iterdir())
    assert len(labs) == 2
    # 4 -> 3 label remap applied
    from mri_raytracer_tpu.data import nifti
    arr = nifti.load(labs[0]).data
    assert arr.max() <= 3 and not np.any(arr == 4)


def test_plan_and_preprocess_threads_custom_plans(fake_nnunet, tmp_path):
    """A non-default plans identifier from plan_experiments must flow into
    preprocess / training / export / checkpoint discovery."""
    import sys as _sys

    from mri_raytracer_tpu.train import nnunet

    api = _sys.modules["nnunetv2.experiment_planning.plan_and_preprocess_api"]
    api.plan_experiments = lambda ids, **kw: "MyPlans"
    plans = nnunet.plan_and_preprocess(7, num_processes=2)
    assert plans == "MyPlans"
    assert fake_nnunet["preprocess"][1]["plans_identifier"] == "MyPlans"

    res = tmp_path / "results"
    d = (res / "Dataset007_X" / "nnUNetTrainer__MyPlans__3d_fullres"
         / "fold_0")
    d.mkdir(parents=True)
    (d / "checkpoint_final.pth").write_bytes(b"\x00")
    assert nnunet.find_checkpoint(res, 7, plans_identifier="MyPlans") \
        is not None
    assert nnunet.find_checkpoint(res, 7) is None  # default plans: no match
