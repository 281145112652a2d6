"""Inverse-rendering fit pipeline (train/fit_views) at smoke scale: the
full protocol machinery — multi-modal target renders, RFF+MLP radiance
field, coarse-to-fine importance-sampled differentiable march, PSNR
bookkeeping — must converge on CPU. The credible-scale run
(64^3 / 256^2 / 16 views, >=30 dB) is scripts/fit_from_views.py on TPU
(docs/FIT_FROM_VIEWS.md)."""

import numpy as np

from mri_raytracer_tpu.train import fit_views


def test_fit_from_views_smoke():
    rec = fit_views.run(shape=(12, 12, 12), res=24, n_train_views=3,
                        n_held_views=1, steps=90, batch_rays=384,
                        n_coarse=12, n_fine=16, seed=1,
                        log_fn=lambda *_: None)
    # Converges (PSNR of a zero-init field on these targets is ~7-12 dB).
    assert rec["psnr_train_mean"] > 18.0, rec["psnr_train_mean"]
    assert np.isfinite(rec["psnr_heldout_mean"])
    assert rec["losses"][-1] < rec["losses"][0] * 0.2
    assert rec["n_params"] > 1000
    assert rec["_recovered"].shape == (3, 24, 24, 3)


def test_target_field_multimodal():
    """Target color channels are the raw modalities (multi-modal contract)."""
    import jax.numpy as jnp

    from mri_raytracer_tpu.data import brats, synthetic

    mods, _ = synthetic.synthetic_case((10, 10, 10), seed=0)
    disp = jnp.asarray(np.stack([brats.percentile_normalize(m)
                                 for m in mods]))
    field = fit_views.make_target_field(disp)
    x = jnp.zeros((5, 3))  # volume center
    sigma, rgb = field(x)
    assert sigma.shape == (5,) and rgb.shape == (5, 3)
    assert float(sigma.min()) >= 0.0
    # channel c equals a trilinear sample of modality c, not a blend:
    # perturb one modality and only that channel moves.
    disp2 = disp.at[1].mul(0.5)
    _, rgb2 = fit_views.make_target_field(disp2)(x)
    moved = np.abs(np.asarray(rgb2 - rgb))
    assert moved[:, 1].max() > 1e-6
    assert moved[:, 0].max() < 1e-9 and moved[:, 2].max() < 1e-9
