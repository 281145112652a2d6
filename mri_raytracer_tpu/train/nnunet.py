"""nnU-Net v2 pipeline adapter (reference T10, ``scripts/nnunet_train_export.py``).

nnU-Net itself is an external torch dependency (it stays external in the
reference too); this module implements the framework-owned parts natively —
environment setup, BraTS->nnU-Net dataset conversion (modality-indexed
filenames, 4->3 label remap), dataset.json generation, result/checkpoint
discovery — and gates the nnunetv2 API calls behind availability so the
pipeline degrades to a clear error rather than an import crash.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
from typing import Dict, Optional, Sequence

import numpy as np

from mri_raytracer_tpu.data import nifti

MODALITY_ORDER = ["t1n", "t1c", "t2w", "t2f"]  # -> _0000.._0003


def has_nnunet() -> bool:
    try:
        import nnunetv2  # noqa: F401

        return True
    except ImportError:
        return False


def setup_nnunet_env(base_dir) -> Dict[str, str]:
    """Create + export the nnUNet_raw/preprocessed/results tree
    (reference :39-41)."""
    base = pathlib.Path(base_dir)
    env = {}
    for name in ("nnUNet_raw", "nnUNet_preprocessed", "nnUNet_results"):
        d = base / name
        d.mkdir(parents=True, exist_ok=True)
        os.environ[name] = str(d)
        env[name] = str(d)
    return env


def prepare_brats_dataset(case_dirs: Sequence[pathlib.Path], raw_dir,
                          dataset_id: int = 501,
                          dataset_name: str = "BraTS2023",
                          use_symlinks: bool = True) -> pathlib.Path:
    """BraTS cases -> nnU-Net raw layout (reference :235-297):
    imagesTr/{case}_{0000..0003}.nii.gz (symlinked), labelsTr/{case}.nii.gz
    with labels remapped 4->3, plus dataset.json."""
    ds_dir = pathlib.Path(raw_dir) / f"Dataset{dataset_id:03d}_{dataset_name}"
    images = ds_dir / "imagesTr"
    labels = ds_dir / "labelsTr"
    images.mkdir(parents=True, exist_ok=True)
    labels.mkdir(parents=True, exist_ok=True)

    n = 0
    for case_dir in case_dirs:
        case_dir = pathlib.Path(case_dir)
        base = case_dir.name
        mods = [case_dir / f"{base}-{m}.nii.gz" for m in MODALITY_ORDER]
        seg = case_dir / f"{base}-seg.nii.gz"
        if not all(m.exists() for m in mods) or not seg.exists():
            continue
        for i, m in enumerate(mods):
            dst = images / f"{base}_{i:04d}.nii.gz"
            if dst.exists() or dst.is_symlink():
                dst.unlink()
            if use_symlinks:
                dst.symlink_to(m.resolve())
            else:
                shutil.copy(m, dst)
        img = nifti.load(seg)
        arr = img.data.astype(np.int16)
        arr[arr == 4] = 3  # remap (reference :262-output convention)
        nifti.save(labels / f"{base}.nii.gz", arr, affine=img.affine)
        n += 1

    (ds_dir / "dataset.json").write_text(json.dumps({
        "channel_names": {str(i): m.upper() for i, m in enumerate(MODALITY_ORDER)},
        "labels": {"background": 0, "NCR_NET": 1, "ED": 2, "ET": 3},
        "numTraining": n,
        "file_ending": ".nii.gz",
    }, indent=2))
    return ds_dir


def plan_and_preprocess(dataset_id: int, num_processes: int = 4) -> None:
    """fingerprint -> plan -> preprocess (reference :308-322)."""
    if not has_nnunet():
        raise RuntimeError("nnunetv2 is not installed in this image; "
                           "dataset conversion completed — run planning on a "
                           "GPU host with nnunetv2 available")
    from nnunetv2.experiment_planning.plan_and_preprocess_api import (
        extract_fingerprints, plan_experiments, preprocess)

    extract_fingerprints([dataset_id])
    plan_experiments([dataset_id])
    preprocess([dataset_id], num_processes=(num_processes,))


def run_training(dataset_id: int, configuration: str = "3d_fullres",
                 fold: int = 0, trainer: str = "nnUNetTrainer",
                 device: str = "cuda") -> None:
    """reference :333-368 (device auto-select cuda/mps/cpu)."""
    if not has_nnunet():
        raise RuntimeError("nnunetv2 is not installed")
    from nnunetv2.run.run_training import run_training as _run

    _run(str(dataset_id), configuration, fold, trainer_class_name=trainer,
         device=device)


def export_model(dataset_id: int, out_zip, configuration: str = "3d_fullres",
                 trainer: str = "nnUNetTrainer") -> None:
    """reference :379-394."""
    if not has_nnunet():
        raise RuntimeError("nnunetv2 is not installed")
    from nnunetv2.model_sharing.model_export import export_pretrained_model

    export_pretrained_model(dataset_id, str(out_zip),
                            configurations=(configuration,))


def find_checkpoint(results_dir, dataset_id: int,
                    configuration: str = "3d_fullres", fold: int = 0,
                    trainer: str = "nnUNetTrainer") -> Optional[pathlib.Path]:
    """Locate checkpoint_final.pth (reference :404-410) without importing
    nnunetv2 (plain path walk)."""
    root = pathlib.Path(results_dir)
    pattern = f"Dataset{dataset_id:03d}_*"
    for ds in root.glob(pattern):
        cand = ds / f"{trainer}__nnUNetPlans__{configuration}" \
            / f"fold_{fold}" / "checkpoint_final.pth"
        if cand.exists():
            return cand
    return None
