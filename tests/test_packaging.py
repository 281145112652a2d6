"""Packaging contract: the CORE install (jax/optax/numpy only,
pyproject.toml dependencies) must import the full non-extra surface;
every optional dependency is function-level gated and declared as an
extra (pyproject [project.optional-dependencies]).

Runs a subprocess with a meta-path blocker that refuses the extras'
modules, then imports every core module — a regression here means a
module-level import of an extra leaked in (the round-4 VERDICT's
"clean pip install -e . cannot run the suite" finding).
"""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

BLOCKED = ["flax", "scipy", "pandas", "PIL", "wandb", "matplotlib",
           "ipywidgets", "orbax", "torch", "nibabel"]

# The core surface: everything a lean install must import. Extras-only
# modules (models.unet, train.unet_trainer, train.nnunet) are NOT here —
# they may import flax/torch at module level by design.
CORE_MODULES = [
    "mri_raytracer_tpu",
    "mri_raytracer_tpu.config",
    "mri_raytracer_tpu.losses",
    "mri_raytracer_tpu.data.brats",
    "mri_raytracer_tpu.data.nifti",
    "mri_raytracer_tpu.data.cache",
    "mri_raytracer_tpu.data.sampling",
    "mri_raytracer_tpu.data.slices",
    "mri_raytracer_tpu.data.manifest",
    "mri_raytracer_tpu.data.synthetic",
    "mri_raytracer_tpu.data.pool",
    "mri_raytracer_tpu.models.features",
    "mri_raytracer_tpu.models.mlp",
    "mri_raytracer_tpu.ops.raymarch_xla",
    "mri_raytracer_tpu.ops.shearwarp",
    "mri_raytracer_tpu.ops.pallas_composite",
    "mri_raytracer_tpu.ops.pallas_warp",
    "mri_raytracer_tpu.ops.neural_march",
    "mri_raytracer_tpu.ops.diffrender",
    "mri_raytracer_tpu.ops.trilinear",
    "mri_raytracer_tpu.ops.importance",
    "mri_raytracer_tpu.ops.isosurface",
    "mri_raytracer_tpu.ops.roi_policy",
    "mri_raytracer_tpu.ops.sdf",
    "mri_raytracer_tpu.render.brats",
    "mri_raytracer_tpu.render.camera",
    "mri_raytracer_tpu.render.params",
    "mri_raytracer_tpu.render.mesh",
    "mri_raytracer_tpu.render.volume",
    "mri_raytracer_tpu.train.engine",
    "mri_raytracer_tpu.train.steps",
    "mri_raytracer_tpu.train.optimizers",
    "mri_raytracer_tpu.eval.metrics",
    "mri_raytracer_tpu.eval.inference",
    "mri_raytracer_tpu.eval.roi_protocol",
    "mri_raytracer_tpu.io.checkpoint",
    "mri_raytracer_tpu.io.logging",
    "mri_raytracer_tpu.io.dashboard",
    "mri_raytracer_tpu.parallel.mesh",
    "mri_raytracer_tpu.parallel.training",
    "mri_raytracer_tpu.parallel.render",
]

BLOCKER = r"""
import importlib
import importlib.abc
import sys

BLOCKED = {blocked!r}


class _Blocker(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        root = fullname.split(".")[0]
        if root in BLOCKED:
            raise ImportError(f"[test] extra dependency {{root}} is blocked")
        return None


sys.meta_path.insert(0, _Blocker())
import jax
jax.config.update("jax_platforms", "cpu")

failures = []
for mod in {modules!r}:
    try:
        importlib.import_module(mod)
    except ImportError as e:
        failures.append(f"{{mod}}: {{e}}")
if failures:
    print("CORE IMPORTS REQUIRE EXTRAS:\n" + "\n".join(failures))
    sys.exit(1)
print("ok")
"""


def test_core_imports_without_extras():
    code = BLOCKER.format(blocked=BLOCKED, modules=CORE_MODULES)
    proc = subprocess.run([sys.executable, "-c", code], cwd=str(REPO),
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_extras_declared_for_gated_modules():
    """Every extra referenced by the core modules' gated imports is declared
    in pyproject (keeps the extras table honest as imports move)."""
    try:
        import tomllib
    except ImportError:  # pragma: no cover
        pytest.skip("tomllib unavailable")
    text = (REPO / "pyproject.toml").read_text()
    cfg = tomllib.loads(text)
    extras = cfg["project"]["optional-dependencies"]
    declared = " ".join(v for vs in extras.values() for v in vs)
    for pkg in ["flax", "scipy", "pandas", "pillow", "matplotlib",
                "ipywidgets", "wandb", "orbax-checkpoint", "torch"]:
        assert pkg in declared, f"extra for {pkg} missing from pyproject"
    assert "all" in extras
