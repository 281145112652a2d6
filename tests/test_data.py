"""Data layer: NIfTI codec, synthetic dataset, caches, samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mri_raytracer_tpu.data import nifti, synthetic, brats, cache, sampling, pool


@pytest.fixture(scope="session")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("brats_syn")
    synthetic.write_synthetic_dataset(root, num_cases=3, shape=(16, 16, 12), seed=7)
    return root


def test_nifti_roundtrip(tmp_path):
    for dtype in (np.float32, np.int16, np.uint8):
        arr = (np.random.default_rng(0).normal(0, 100, size=(7, 9, 5))).astype(dtype)
        path = tmp_path / f"x_{np.dtype(dtype).name}.nii.gz"
        nifti.save(path, arr)
        img = nifti.load(path)
        np.testing.assert_array_equal(img.data, arr)
    # uncompressed too
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    nifti.save(tmp_path / "y.nii", arr)
    np.testing.assert_array_equal(nifti.load(tmp_path / "y.nii").data, arr)


def test_nifti_affine_roundtrip(tmp_path):
    aff = np.diag([2.0, 3.0, 4.0, 1.0])
    aff[:3, 3] = [10, -5, 2]
    arr = np.zeros((4, 4, 4), np.float32)
    nifti.save(tmp_path / "a.nii.gz", arr, affine=aff)
    img = nifti.load(tmp_path / "a.nii.gz")
    np.testing.assert_allclose(img.affine, aff)
    np.testing.assert_allclose(img.pixdim, [2.0, 3.0, 4.0])


def test_find_and_load_case(dataset):
    cases = brats.find_cases(dataset)
    assert len(cases) == 3
    mods, seg = brats.load_case(cases[0])
    assert mods.shape == (4, 16, 16, 12)
    assert seg.shape == (16, 16, 12)
    # remap happened: labels in {0,1,2,3}, no 4s
    assert set(np.unique(seg)).issubset({0, 1, 2, 3})
    assert (seg == 3).any()
    # z-score over nonzero mask: background (originally 0) maps to -mu/sigma,
    # brain voxels are ~N(0,1)
    bg_val = mods[0].flat[0]  # corner voxel = background
    assert bg_val < 0
    brain = mods[0][mods[0] != bg_val]
    assert abs(brain.mean()) < 0.3 and 0.5 < brain.std() < 2.0


def test_percentile_normalize():
    arr = np.random.default_rng(0).normal(100, 20, (32, 32, 8)).astype(np.float32)
    out = brats.percentile_normalize(arr)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_ram_cache_vectorized_gather(dataset):
    cases = brats.find_cases(dataset)
    c = cache.RAMCache(cases, verbose=False)
    ci = np.array([0, 1, 2, 0])
    h = np.array([1, 2, 3, 4]); w = np.array([5, 6, 7, 8]); d = np.array([1, 2, 3, 4])
    mods, segs = c.sample_voxels(ci, h, w, d)
    assert mods.shape == (4, 4) and segs.shape == (4,)
    # cross-check against direct indexing
    for i in range(4):
        np.testing.assert_allclose(mods[i], c.get(ci[i])["mods"][:, h[i], w[i], d[i]])
        assert segs[i] == c.get(ci[i])["seg"][h[i], w[i], d[i]]


def test_lru_cache(dataset):
    cases = brats.find_cases(dataset)
    c = cache.CaseLRU(cases, capacity=2)
    c.get(0); c.get(1); c.get(2)
    assert len(c._cache) == 2
    assert 0 not in c._cache


def test_kfold_split(dataset):
    cases = brats.find_cases(dataset)
    tr, va = cache.kfold_split(cases, num_folds=3, fold_index=1, seed=0)
    assert len(tr) == 2 and len(va) == 1
    assert set(map(str, tr)).isdisjoint(set(map(str, va)))


def test_boundary_map():
    seg = np.zeros((8, 8, 8), np.int16)
    seg[3:5, 3:5, 3:5] = 1
    bm = cache.ChunkedCache.boundary_map(seg)
    assert bm.shape == seg.shape
    assert bm.max() <= 1.0 and bm.min() > 0.0
    # boundary voxels should have high weight, far voxels low
    assert bm[3, 3, 3] > bm[0, 0, 0]


def test_device_pool_and_samplers(dataset):
    cases = brats.find_cases(dataset)
    c = cache.RAMCache(cases, verbose=False)
    p = pool.DevicePool(c, pool_size=2, seed=0)
    assert p.mods.shape == (2, 4, 16, 16, 12)

    key = jax.random.PRNGKey(0)
    b = sampling.sample_uniform(key, p.mods, p.segs, 64)
    assert b.coords.shape == (64, 3) and b.intensities.shape == (64, 4)
    assert b.labels.shape == (64,)
    assert float(b.coords.min()) >= -1.0 and float(b.coords.max()) <= 1.0

    # uniform tumor fraction is ~4-5%; biased sampling must beat it clearly
    bt = sampling.sample_tumor_biased(key, p.mods, p.segs, 64, tumor_ratio=0.5,
                                      oversample=16)
    assert int((bt.labels > 0).sum()) >= 16

    bb = sampling.sample_class_balanced(key, p.mods, p.segs, 64, (4, 4, 4),
                                        oversample=256)
    for cls in (2, 3):
        assert int((bb.labels == cls).sum()) >= 2
    assert int((bb.labels == 1).sum()) >= 1  # rarest class (necrotic core)

    bh = sampling.sample_hybrid(key, p.mods, p.segs, 64)
    assert bh.coords.shape[0] == 64


def test_boundary_weights_apply_to_full_batch(dataset):
    """Every sampler (and every hybrid sub-batch) gathers boundary weights."""
    cases = brats.find_cases(dataset)
    c = cache.RAMCache(cases, verbose=False)
    for i in range(c.n_cases):
        entry = c.get(i)
        entry["boundary"] = cache.ChunkedCache.boundary_map(entry["seg"])
    p = pool.DevicePool(c, pool_size=2, seed=0, with_boundary=True)
    assert p.boundary is not None
    key = jax.random.PRNGKey(3)
    H, W, D = (16, 16, 12)

    def check(b):
        # Weights must equal the boundary map at the sampled voxels — for
        # EVERY sample in the batch, including balanced sub-batches.
        idx = np.round((np.asarray(b.coords) + 1.0) / 2.0
                       * np.array([H - 1, W - 1, D - 1])).astype(int)
        w = np.asarray(b.weights)
        assert w.shape == (64,)
        assert not np.allclose(w, 1.0)  # boundary maps are non-trivial
        bp = np.asarray(p.boundary)
        # Can't recover the case index from coords alone; check each weight
        # matches the map value in at least one pool case at that voxel.
        for n in range(64):
            vals = bp[:, idx[n, 0], idx[n, 1], idx[n, 2]]
            assert np.any(np.isclose(w[n], vals, atol=1e-6)), (n, w[n], vals)

    check(sampling.sample_uniform(key, p.mods, p.segs, 64, p.boundary))
    check(sampling.sample_tumor_biased(key, p.mods, p.segs, 64, 0.5,
                                       boundary_pool=p.boundary))
    check(sampling.sample_class_balanced(key, p.mods, p.segs, 64, (4, 4, 4),
                                         boundary_pool=p.boundary))
    check(sampling.sample_hybrid(key, p.mods, p.segs, 64,
                                 boundary_pool=p.boundary))


def test_samplers_jit(dataset):
    cases = brats.find_cases(dataset)
    c = cache.RAMCache(cases, verbose=False)
    p = pool.DevicePool(c, pool_size=2, seed=0)
    f = jax.jit(lambda k: sampling.sample_tumor_biased(k, p.mods, p.segs, 32, 0.5))
    out = f(jax.random.PRNGKey(1))
    assert out.coords.shape == (32, 3)


def test_sample_batch_host(dataset):
    cases = brats.find_cases(dataset)
    c = cache.RAMCache(cases, verbose=False)
    b = sampling.sample_batch_host(jax.random.PRNGKey(0), 16, c, c.vol_shape)
    assert b.intensities.shape == (16, 4)
