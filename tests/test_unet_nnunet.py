"""U-Net trainer, distillation, nnU-Net conversion, manifests, slice pipeline."""

import json
import numpy as np
import jax
import pytest

from mri_raytracer_tpu.data import brats, cache, manifest, nifti, slices, synthetic
from mri_raytracer_tpu.train import nnunet, unet_trainer


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats_unet")
    synthetic.write_synthetic_dataset(root, num_cases=3, shape=(16, 16, 12), seed=9)
    return root


@pytest.fixture(scope="module")
def caches(dataset):
    cases = brats.find_cases(dataset)
    return cache.RAMCache(cases[:2], verbose=False), \
        cache.RAMCache(cases[2:], verbose=False)


def test_slice_index_and_batches(caches):
    tr, _ = caches
    idx = slices.build_slice_index(tr, bg_keep_ratio=1.0)
    assert len(idx) == 2 * 12  # all slices kept
    gen = slices.slice_batches(tr, idx, batch_size=4, epochs=1)
    imgs, labs = next(gen)
    assert imgs.shape == (4, 16, 16, 4)
    assert labs.shape == (4, 16, 16)


def test_slice_batches_pad(caches):
    tr, _ = caches
    idx = slices.build_slice_index(tr, bg_keep_ratio=1.0)
    gen = slices.slice_batches(tr, idx, batch_size=2, pad_mult=8)
    imgs, labs = next(gen)
    assert imgs.shape[1] % 8 == 0 and imgs.shape[2] % 8 == 0


def test_prefetch(caches):
    tr, _ = caches
    idx = slices.build_slice_index(tr, bg_keep_ratio=1.0)
    gen = slices.slice_batches(tr, idx, batch_size=2, epochs=1)
    items = list(slices.prefetch(gen, max_prefetch=2))
    assert len(items) >= 10


def test_unet_shapes():
    from mri_raytracer_tpu.models import unet as um

    model, variables = um.create_unet(jax.random.PRNGKey(0), 4, 4, base=8,
                                      image_size=(16, 16))
    x = np.zeros((2, 16, 16, 4), np.float32)
    logits = um.unet_apply(model, variables, x)
    assert logits.shape == (2, 16, 16, 4)
    logits2, mut = um.unet_apply(model, variables, x, train=True)
    assert "batch_stats" in mut


def test_unet_training_learns(caches, tmp_path):
    tr, va = caches
    out = unet_trainer.train_unet(tr, va, epochs=2, batch_size=4, base=8,
                                  out_dir=str(tmp_path), verbose=False)
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["loss"])
    assert out["history"][-1]["loss"] < out["history"][0]["loss"] * 1.5
    assert (tmp_path / "unet_best.npz").exists()


def test_distillation():
    _, seg = synthetic.synthetic_case((16, 16, 12), seed=4)
    out = unet_trainer.distill_to_implicit(seg.astype(np.int16), hidden=(16, 16),
                                           steps=120, batch=512)
    assert out["loss_history"][-1] < out["loss_history"][0]
    # distilled MLP predicts mostly the right classes on tumor center
    import jax.numpy as jnp

    coords, labels = unet_trainer.collect_voxels(seg.astype(np.int16), 512, 1)
    logits = out["model"].apply(out["params"], jnp.asarray(coords), None)
    acc = float((np.asarray(logits).argmax(-1) == labels).mean())
    assert acc > 0.5


def test_nnunet_conversion(dataset, tmp_path):
    env = nnunet.setup_nnunet_env(tmp_path)
    cases = brats.find_cases(dataset)
    ds_dir = nnunet.prepare_brats_dataset(cases, env["nnUNet_raw"],
                                          dataset_id=501)
    assert (ds_dir / "dataset.json").exists()
    meta = json.loads((ds_dir / "dataset.json").read_text())
    assert meta["numTraining"] == 3
    assert meta["labels"]["ET"] == 3
    imgs = sorted((ds_dir / "imagesTr").iterdir())
    assert len(imgs) == 12  # 3 cases x 4 modalities
    assert imgs[0].name.endswith("_0000.nii.gz")
    # labels remapped: no 4s
    lab = nifti.load(next((ds_dir / "labelsTr").iterdir())).data
    assert set(np.unique(lab)).issubset({0, 1, 2, 3})


def test_nnunet_gating():
    if not nnunet.has_nnunet():
        with pytest.raises(RuntimeError, match="not installed"):
            nnunet.plan_and_preprocess(501)


def test_find_checkpoint(tmp_path):
    d = tmp_path / "Dataset501_X" / "nnUNetTrainer__nnUNetPlans__3d_fullres" \
        / "fold_0"
    d.mkdir(parents=True)
    (d / "checkpoint_final.pth").write_bytes(b"x")
    found = nnunet.find_checkpoint(tmp_path, 501)
    assert found is not None and found.name == "checkpoint_final.pth"


def test_manifest_roundtrip(dataset, tmp_path):
    rows = manifest.build_brats_manifest(dataset, tmp_path / "manifest.csv")
    assert len(rows) == 3
    assert rows[0]["t1"].endswith("-t1n.nii.gz")
    loaded = manifest.load_manifest(tmp_path / "manifest.csv")
    assert loaded[0]["case_id"] == rows[0]["case_id"]
    paths = manifest.manifest_case_paths(loaded, dataset)
    assert len(paths) == 3 and paths[0].is_dir()
    df = manifest.load_mu_glioma_manifest(tmp_path / "manifest.csv")
    assert len(df) == 3
