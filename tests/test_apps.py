"""CLI apps (headless) + notebook viewer rendering logic."""

import numpy as np
import pytest

from mri_raytracer_tpu.data import synthetic, brats
from mri_raytracer_tpu.render import widgets


def test_brats_app_synthetic(tmp_path):
    from mri_raytracer_tpu.apps import brats_app

    rc = brats_app.main(["--synthetic", "--synthetic-shape", "24,24,20",
                         "--width", "40", "--height", "40", "--frames", "2",
                         "--out", str(tmp_path / "r")])
    assert rc == 0
    assert (tmp_path / "r" / "frame_0000.png").exists()
    assert (tmp_path / "r" / "frame_0001.png").exists()


def test_brats_app_with_inr(tmp_path):
    from mri_raytracer_tpu.apps import brats_app
    from mri_raytracer_tpu.config import TrainConfig
    from mri_raytracer_tpu.train.engine import train_inr

    root = tmp_path / "data"
    synthetic.write_synthetic_dataset(root, num_cases=2, shape=(12, 12, 10))
    c = TrainConfig()
    c.data.data_root = str(root)
    c.data.case_limit = 2
    c.data.num_folds = 2
    c.data.pool_size = 1
    c.model.hidden_dims = (8,)
    c.model.fourier_freqs = 1
    c.train_steps = 2
    c.global_batch = 64
    c.micro_batch = 64
    c.checkpoint_every = 0
    c.out_dir = str(tmp_path / "run")
    state = train_inr(c)

    case_dir = sorted(root.iterdir())[0]
    rc = brats_app.main(["--case-dir", str(case_dir), "--width", "32",
                         "--height", "32", "--frames", "1",
                         "--inr-checkpoint", state["checkpoint"],
                         "--out", str(tmp_path / "r2")])
    assert rc == 0


def test_volume_app(tmp_path):
    from mri_raytracer_tpu.apps import volume_app

    rc = volume_app.main(["--synthetic", "--width", "32", "--height", "32",
                          "--frames", "2", "--steps", "16",
                          "--out", str(tmp_path / "v")])
    assert rc == 0
    assert (tmp_path / "v" / "frame_0001.png").exists()


def test_mesh_app(tmp_path):
    from mri_raytracer_tpu.apps import mesh_app

    rc = mesh_app.main(["--width", "32", "--height", "32", "--frames", "1",
                        "--out", str(tmp_path / "m")])
    assert rc == 0


def test_sdf_app(tmp_path):
    from mri_raytracer_tpu.apps import sdf_app

    rc = sdf_app.main(["--width", "32", "--height", "32", "--frames", "1",
                       "--max-steps", "32", "--out", str(tmp_path / "s")])
    assert rc == 0


def test_slice_viewer_rendering():
    mods, seg = synthetic.synthetic_case((16, 16, 12), seed=0)
    disp = np.stack([brats.percentile_normalize(m) for m in mods])
    v = widgets.SliceViewer(disp, seg=seg, pred=seg)
    img = v.render_slice("axial", 6, weights=[1, 0.5, 0, 0], ww=0.8, wl=0.4)
    assert img.shape == (16, 16, 3)
    assert img.min() >= 0 and img.max() <= 1.0 + 1e-6
    multi = v.render_multiview(0.5)
    assert multi.shape[1] > multi.shape[0]  # 3 panels side by side
    # overlay actually colors tumor voxels
    plain = v.render_slice("axial", 6, show_seg=False)
    assert np.abs(img - plain).max() > 0.05


def test_holdout_viewer(tmp_path):
    import jax

    from mri_raytracer_tpu.config import ModelConfig
    from mri_raytracer_tpu.models.api import build_model

    mods, seg = synthetic.synthetic_case((12, 12, 10), seed=1)
    zsc = np.stack([brats.zscore_nonzero(m.copy()) for m in mods])
    cfg = ModelConfig(hidden_dims=(8,), fourier_freqs=1)
    model = build_model(cfg, num_modalities=4)
    params = model.init(jax.random.PRNGKey(0))
    hv = widgets.HoldoutViewer(model, params,
                               [{"mods": zsc, "seg": seg, "name": "syn0"}])
    rep = hv.slice_report(0, 5)
    assert np.isfinite(rep["macro_dice"]) or np.isnan(rep["macro_dice"])
    img = hv.render(0, 5)
    assert img.shape == (12, 24, 3)
    # cached
    assert 0 in hv._pred_cache


def test_interactive_notebook_wellformed():
    """notebooks/interactive.ipynb parses and its imports resolve (the full
    run-all is exercised manually/by CI at longer budgets)."""
    import importlib
    import json
    import pathlib
    import re

    nb_path = (pathlib.Path(__file__).resolve().parents[1] / "notebooks"
               / "interactive.ipynb")
    nb = json.loads(nb_path.read_text())
    assert nb["nbformat"] == 4
    code = "\n".join("".join(c["source"]) for c in nb["cells"]
                     if c["cell_type"] == "code")
    mods = set(re.findall(r"from (mri_raytracer_tpu[\w.]*) import", code))
    assert len(mods) >= 5
    for m in mods:
        importlib.import_module(m)


def test_render_http_service():
    """HTTP serving surface: /info JSON + /frame PNGs that respond to the
    camera and transfer-function query args."""
    import io
    import json
    import threading
    import urllib.request

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from mri_raytracer_tpu.apps.serve import RenderService, make_server
    from mri_raytracer_tpu.data import brats, synthetic
    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.brats import BratsRenderer

    mods, seg = synthetic.synthetic_case((24, 24, 20), seed=1)
    disp = np.stack([brats.percentile_normalize(m) for m in mods])
    p = rp.default_render_params(disp.shape[1:], show_seg=True)
    r = BratsRenderer(jnp.asarray(disp), jnp.asarray(seg.astype(np.int32)),
                      None, width=64, height=64, backend="sweep")
    svc = RenderService(r, p, rp.default_camera_radius(p, disp.shape[1:]))
    srv = make_server(svc, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        info = json.loads(urllib.request.urlopen(f"{base}/info").read())
        assert info["width"] == 64 and info["has_seg"]
        assert info["radius"] > 0
        # The interactive browser viewer ships at / and drives /frame.
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "<html" in page and "/frame?" in page and "theta" in page
        # Preset dropdown is generated from render/presets.PRESETS (single
        # source of truth) and the placeholder must be substituted.
        from mri_raytracer_tpu.render.presets import preset_names
        assert "__PRESET_OPTIONS__" not in page
        for name in preset_names():
            assert f"<option>{name}</option>" in page

        def frame(q):
            data = urllib.request.urlopen(f"{base}/frame?{q}").read()
            return np.asarray(Image.open(io.BytesIO(data)))

        a = frame("theta=0.3&phi=1.2")
        b = frame("theta=2.1&phi=0.8")
        assert a.shape == (64, 64, 3)
        assert not np.array_equal(a, b)  # camera args change the frame
        c = frame("theta=0.3&phi=1.2&ww=0.2&wl=0.9")
        assert not np.array_equal(a, c)  # transfer args change the frame
        d = frame("theta=0.3&phi=1.2&preset=xray")
        assert not np.array_equal(a, d)  # named preset changes the frame
    finally:
        srv.shutdown()


def test_transfer_presets():
    """Named transfer-function presets: every preset applies cleanly onto
    default params (array leaves only, no recompilation triggers), the
    modality one-hots select the intended volume, and an unknown name
    raises with the available list."""
    import numpy as np
    import pytest

    from mri_raytracer_tpu.render import params as rp
    from mri_raytracer_tpu.render.presets import (PRESETS, apply_preset,
                                                  preset_names)

    base = rp.default_render_params((16, 16, 12))
    for name in preset_names():
        p = apply_preset(base, name)
        assert p.vol_min is base.vol_min  # geometry untouched
        assert p.lut is base.lut
        for leaf in (p.ww, p.wl, p.intensity_alpha, p.gamma,
                     p.vol_enabled, p.vol_weight):
            assert np.asarray(leaf).dtype == np.float32
    t1c = apply_preset(base, "t1c-enhancing")
    assert list(np.asarray(t1c.vol_enabled)) == [0, 1, 0, 0]
    assert float(t1c.gamma) > 1.0
    with pytest.raises(KeyError, match="t1-anatomy"):
        apply_preset(base, "nope")
    assert set(PRESETS) == set(preset_names())
