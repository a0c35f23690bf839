"""Native host-pipeline library: build, bind, verify against numpy."""

import numpy as np
import pytest

from diffpose_tpu import native


def test_native_library_builds_and_loads():
    assert native.available(), "native library failed to build/load"


def test_gather_rows_matches_numpy(rng):
    src = rng.normal(size=(500, 17, 4, 5)).astype(np.float32)
    idx = rng.integers(0, 500, size=128)
    got = native.gather_rows(src, idx)
    np.testing.assert_array_equal(got, src[idx])
    assert got.flags["C_CONTIGUOUS"]


def test_gather_rows_int_dtype(rng):
    src = rng.integers(0, 100, size=(64, 3)).astype(np.int32)
    idx = np.array([5, 1, 63, 0])
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gmm_select_matches_numpy_fallback(rng):
    gmm = rng.uniform(0.1, 1.0, size=(32, 17, 5, 5)).astype(np.float32)
    gmm[..., 0] /= gmm[..., 0].sum(-1, keepdims=True)
    uniform = rng.uniform(0, 1, size=(32, 17)).astype(np.float32)

    uv_n, var_n = native.gmm_select(gmm, uniform)

    # Pure-numpy reference of the same inverse-CDF draw.
    w = gmm[..., 0]
    cdf = np.cumsum(w, axis=-1)
    pick = np.minimum(np.sum(uniform[..., None] >= cdf, axis=-1), 4)
    sel = np.take_along_axis(gmm, pick[..., None, None], axis=2)[:, :, 0]
    np.testing.assert_allclose(uv_n, sel[..., 1:3], atol=1e-6)
    np.testing.assert_allclose(var_n, sel[..., 3:5], atol=1e-6)


def test_gmm_select_follows_weights(rng):
    n = 8192
    gmm = np.zeros((n, 1, 3, 5), np.float32)
    gmm[..., 0] = [0.6, 0.3, 0.1]
    gmm[..., 1] = [1.0, 2.0, 3.0]
    uniform = rng.uniform(0, 1, size=(n, 1)).astype(np.float32)
    uv, _ = native.gmm_select(gmm, uniform)
    freqs = [(uv[:, 0, 0] == v).mean() for v in (1.0, 2.0, 3.0)]
    np.testing.assert_allclose(freqs, [0.6, 0.3, 0.1], atol=0.03)


def test_loader_uses_gather(rng):
    from diffpose_tpu.data import BatchLoader, make_synthetic_dataset

    ds = make_synthetic_dataset(num_frames=64, seed=0)
    loader = BatchLoader(ds, batch_size=32, shuffle=True, seed=9)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    # Batches must still be exact row gathers of the dataset.
    perm = np.random.default_rng(9 + 0).permutation(64)
    np.testing.assert_array_equal(batches[0]["poses_3d"], ds.poses_3d[perm[:32]])
