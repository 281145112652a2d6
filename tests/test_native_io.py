"""Native C++ IO runtime vs the pure-Python implementations."""

import gzip
import numpy as np
import pytest

from mri_raytracer_tpu.data import codecs, nifti, brats, synthetic
from mri_raytracer_tpu.io import native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="libmri_io.so not built")


@requires_native
def test_native_gunzip():
    payload = b"hello native runtime " * 100
    assert native.gunzip(gzip.compress(payload), len(payload) + 64) == payload


@requires_native
def test_native_bc4_matches_python():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (8, 12), np.uint8).astype(np.uint8)
    data = codecs.encode_bc4(img)
    py = codecs.decode_bc4(data, 12, 8, 1)
    nat = native.decode_bc4(data, 12, 8, 1)
    np.testing.assert_array_equal(py, nat)


@requires_native
def test_native_nifti_batch_matches_python(tmp_path):
    mods, seg = synthetic.synthetic_case((10, 12, 8), seed=5)
    paths = []
    for i in range(3):
        p = tmp_path / f"v{i}.nii.gz"
        nifti.save(p, mods[i])
        paths.append(p)

    nat = native.load_nifti_batch(paths, zscore=True, max_voxels=10 * 12 * 8,
                                  n_threads=2)
    for i, item in enumerate(nat):
        assert item is not None
        vol, dims = item
        assert dims == (10, 12, 8)
        ref = brats.zscore_nonzero(mods[i].astype(np.float32).copy())
        np.testing.assert_allclose(vol, ref, rtol=1e-4, atol=1e-4)


@requires_native
def test_native_nifti_batch_handles_failures(tmp_path):
    good = tmp_path / "ok.nii.gz"
    nifti.save(good, np.ones((4, 4, 4), np.float32))
    bad = tmp_path / "bad.nii.gz"
    bad.write_bytes(gzip.compress(b"not a nifti"))
    out = native.load_nifti_batch([good, bad], max_voxels=64)
    assert out[0] is not None
    assert out[1] is None


@requires_native
def test_ramcache_native_modality_subset(tmp_path):
    """Regression: with a non-default modality subset the native fast path
    must pair each case with ITS seg (stride bug: seg list was previously
    strided by the default 4-modality group size)."""
    from mri_raytracer_tpu.data import cache as cache_mod

    root = synthetic.write_synthetic_dataset(tmp_path, num_cases=3,
                                             shape=(10, 10, 8), seed=7)
    cases = brats.find_cases(root)
    kw = dict(modalities=["t1n", "t2w"], remap=True)
    nat = cache_mod.RAMCache(cases, use_native=True, verbose=False, **kw)
    py = cache_mod.RAMCache(cases, use_native=False, verbose=False, **kw)
    assert nat.n_modalities == 2
    for a, b in zip(nat.cache, py.cache):
        np.testing.assert_array_equal(a["seg"], b["seg"])
        np.testing.assert_allclose(a["mods"], b["mods"], rtol=1e-4, atol=1e-4)


def test_python_fallback_path(tmp_path, monkeypatch):
    """With the library 'absent', the API still works via Python."""
    monkeypatch.setattr(native, "_LIB", None)
    mods, _ = synthetic.synthetic_case((6, 6, 6), seed=1)
    p = tmp_path / "v.nii.gz"
    nifti.save(p, mods[0])
    out = native.load_nifti_batch([p], zscore=False)
    np.testing.assert_allclose(out[0][0], mods[0], rtol=1e-5)
