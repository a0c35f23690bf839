import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpose_tpu.data import (
    BatchLoader,
    make_synthetic_dataset,
    sample_gmm_batch,
)
from diffpose_tpu.data.gmm import gmm_mean_pose_2d


def test_synthetic_dataset_shapes_and_bone_lengths():
    ds = make_synthetic_dataset(num_frames=64, n_kernels=3, seed=1)
    assert ds.poses_3d.shape == (64, 17, 3)
    assert ds.poses_2d_gmm.shape == (64, 17, 3, 5)
    assert ds.camera_para.shape == (64, 4)
    assert len(ds.action_names()) == 64
    # Root-centered.
    np.testing.assert_allclose(ds.poses_3d[:, 0], 0.0, atol=1e-7)
    # Kernel weights sum to one per joint.
    np.testing.assert_allclose(ds.poses_2d_gmm[..., 0].sum(-1), 1.0, atol=1e-5)


def test_gmm_sample_assembly():
    ds = make_synthetic_dataset(num_frames=16, n_kernels=4, seed=2)
    key = jax.random.PRNGKey(0)
    uvxyz, noise_scale, pose_2d = sample_gmm_batch(
        key, jnp.asarray(ds.poses_2d_gmm), jnp.asarray(ds.poses_3d)
    )
    uvxyz, noise_scale, pose_2d = map(np.asarray, (uvxyz, noise_scale, pose_2d))
    assert uvxyz.shape == (16, 17, 5)
    assert noise_scale.shape == (16, 17, 5)
    # xyz channels pass through; noise scale is 1 there.
    np.testing.assert_allclose(uvxyz[..., 2:], ds.poses_3d, atol=0)
    np.testing.assert_allclose(noise_scale[..., 2:], 1.0, atol=0)
    # The selected (mean, var) must be one of the frame's kernels.
    for f in range(16):
        for j in range(17):
            row = np.concatenate([uvxyz[f, j, :2], noise_scale[f, j, :2]])
            kernels = np.concatenate(
                [ds.poses_2d_gmm[f, j, :, 1:3], ds.poses_2d_gmm[f, j, :, 3:5]], axis=-1
            )
            assert any(np.allclose(row, k, atol=1e-6) for k in kernels)
    np.testing.assert_allclose(pose_2d, uvxyz[..., :2], atol=0)


def test_gmm_choice_follows_weights():
    # One frame/joint with a dominant kernel: frequencies must track weights.
    gmm = np.zeros((1, 1, 3, 5), np.float32)
    gmm[0, 0, :, 0] = [0.7, 0.2, 0.1]
    gmm[0, 0, :, 1] = [10.0, 20.0, 30.0]  # distinguishable means
    gmm[0, 0, :, 3] = 1.0
    pose3d = np.zeros((1, 1, 3), np.float32)
    counts = {10.0: 0, 20.0: 0, 30.0: 0}
    batched_gmm = jnp.asarray(np.tile(gmm, (4096, 1, 1, 1)))
    batched_3d = jnp.asarray(np.tile(pose3d, (4096, 1, 1)))
    uvxyz, _, _ = sample_gmm_batch(jax.random.PRNGKey(7), batched_gmm, batched_3d)
    u = np.asarray(uvxyz)[:, 0, 0]
    freqs = np.array([(u == 10.0).mean(), (u == 20.0).mean(), (u == 30.0).mean()])
    np.testing.assert_allclose(freqs, [0.7, 0.2, 0.1], atol=0.03)


def test_gmm_mean_pose():
    ds = make_synthetic_dataset(num_frames=4, n_kernels=3, seed=3)
    mean = np.asarray(gmm_mean_pose_2d(jnp.asarray(ds.poses_2d_gmm)))
    w = ds.poses_2d_gmm[..., 0:1]
    want = (w * ds.poses_2d_gmm[..., 1:3]).sum(2) / w.sum(2)
    np.testing.assert_allclose(mean, want, atol=1e-6)


def test_loader_covers_all_frames_with_padding():
    ds = make_synthetic_dataset(num_frames=100, seed=4)
    loader = BatchLoader(ds, batch_size=32, shuffle=True, seed=5)
    assert len(loader) == 4
    seen = []
    for batch in loader.epoch(0):
        assert batch["poses_3d"].shape == (32, 17, 3)
        seen.append(batch)
    valid_count = sum(b["valid"].sum() for b in seen)
    assert valid_count == 100
    # Shuffling differs across epochs but is deterministic per epoch.
    a0 = np.stack([b["action_ids"] for b in loader.epoch(0)])
    a0b = np.stack([b["action_ids"] for b in loader.epoch(0)])
    a1 = np.stack([b["action_ids"] for b in loader.epoch(1)])
    np.testing.assert_array_equal(a0, a0b)
    assert not np.array_equal(a0, a1)


def test_loader_multihost_slices_partition_global_batch():
    ds = make_synthetic_dataset(num_frames=64, seed=6)
    global_loader = BatchLoader(ds, batch_size=16, shuffle=True, seed=1)
    shard_loaders = [
        BatchLoader(ds, batch_size=16, shuffle=True, seed=1, process_count=4, process_index=i)
        for i in range(4)
    ]
    for gb, *shards in zip(
        global_loader.epoch(3), *[l.epoch(3) for l in shard_loaders]
    ):
        merged = np.concatenate([s["poses_3d"] for s in shards])
        np.testing.assert_array_equal(merged, gb["poses_3d"])


def test_prefetch_to_device_preserves_batches():
    from diffpose_tpu.data.loader import prefetch_to_device

    ds = make_synthetic_dataset(num_frames=96, seed=8)
    loader = BatchLoader(ds, batch_size=32, shuffle=True, seed=3)
    plain = list(loader.epoch(0))
    fetched = list(prefetch_to_device(loader.epoch(0), size=2))
    assert len(plain) == len(fetched)
    for a, b in zip(plain, fetched):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(b[k]), a[k])


def test_pipeline_matches_reference_oracle(tmp_path, rng):
    """End-to-end host-pipeline parity on a fabricated mini-H36M npz pair."""
    from tests.oracle import load_reference_module, require_reference

    require_reference()

    subjects = {"S1": ["Walking 1", "Eating"], "S9": ["Walking 1"]}
    pos_3d = {
        s: {a: rng.normal(scale=0.3, size=(9, 32, 3)).astype(np.float32) for a in acts}
        for s, acts in subjects.items()
    }
    np.savez(tmp_path / "data_3d.npz", positions_3d=np.array(pos_3d, dtype=object))

    kp = {}
    for s, acts in subjects.items():
        kp[s] = {}
        for a in acts:
            # 4 cameras, a couple of extra frames to exercise truncation.
            kp[s][a] = [
                rng.uniform(0, 1000, size=(11, 17, 5, 5)).astype(np.float32)
                for _ in range(4)
            ]
            for arr in kp[s][a]:
                arr[..., 0] = 1.0 / 5
    np.savez(tmp_path / "data_2d.npz", positions_2d=np.array(kp, dtype=object))

    # Ours.
    from diffpose_tpu.data.h36m import Human36mDataset
    from diffpose_tpu.data.pipeline import create_2d_data, fetch, flatten_sequences, read_3d_data

    ours_ds = Human36mDataset(str(tmp_path / "data_3d.npz"))
    read_3d_data(ours_ds)
    ours_kp = create_2d_data(str(tmp_path / "data_2d.npz"), ours_ds)
    o3, o2, oact, ocam = fetch(["S1", "S9"], ours_ds, ours_kp)

    # Reference.
    ref_h36m = load_reference_module("common.h36m_dataset")
    ref_du = load_reference_module("common.data_utils")
    ref_ds = ref_h36m.Human36mDataset(str(tmp_path / "data_3d.npz"))
    ref_ds = ref_du.read_3d_data_me(ref_ds)
    ref_kp = ref_du.create_2d_data(str(tmp_path / "data_2d.npz"), ref_ds)
    r3, r2, ract, rcam = ref_du.fetch_me(["S1", "S9"], ref_ds, ref_kp)

    assert len(o3) == len(r3) == 12  # 3 seq × 4 cams
    for i in range(len(o3)):
        np.testing.assert_allclose(o3[i], r3[i], atol=2e-5)
        np.testing.assert_allclose(o2[i], r2[i], atol=1e-5)
        assert oact[i] == ract[i]
        np.testing.assert_allclose(ocam[i], np.asarray(rcam[i]), atol=1e-6)

    flat = flatten_sequences(o3, o2, oact, ocam)
    assert flat.poses_3d.shape == (12 * 9, 17, 3)
    np.testing.assert_allclose(flat.poses_3d[:, 0], 0.0, atol=1e-7)
