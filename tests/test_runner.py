"""End-to-end runner lifecycle on synthetic data (train → eval → resume)."""

import numpy as np
import pytest

from diffpose_tpu.config import Config, ModelConfig, TestingConfig, TrainingConfig, OptimConfig
from diffpose_tpu.data import make_synthetic_dataset
from diffpose_tpu.train import DiffposeRunner


def _tiny_config(batch_size=32, n_epochs=2):
    return Config(
        model=ModelConfig(hid_dim=32, num_layer=2, n_head=4),
        training=TrainingConfig(batch_size=batch_size, n_epochs=n_epochs),
        testing=TestingConfig(test_times=1, test_timesteps=2, test_num_diffusion_timesteps=12),
        optim=OptimConfig(lr=1e-3),
    )


def test_runner_train_eval_cycle(tmp_path):
    cfg = _tiny_config()
    runner = DiffposeRunner(cfg, log_dir=str(tmp_path / "ckpt"), seed=7)
    runner.create_diffusion_model()
    runner.create_pose_model()
    runner.set_data(
        make_synthetic_dataset(num_frames=96, seed=0),
        make_synthetic_dataset(num_frames=48, seed=1),
    )
    history = runner.train()
    assert len(history["loss"]) == 2
    assert len(history["p1"]) == 2
    assert all(np.isfinite(history["p1"]))
    stats = runner.throughput_stats()
    assert stats["eval_frames"] == 48
    assert stats["frames_per_second"] > 0


def test_runner_full_resume(tmp_path):
    cfg = _tiny_config(n_epochs=1)
    runner = DiffposeRunner(cfg, log_dir=str(tmp_path / "ck"), seed=3)
    runner.create_diffusion_model()
    runner.create_pose_model()
    train = make_synthetic_dataset(num_frames=64, seed=2)
    runner.set_data(train, None)
    runner.train()
    step_after = int(runner.state.step)
    assert step_after == 2  # 64/32 batches
    runner.checkpointer.close()

    # Fresh runner resumes epoch + step + optimizer state.
    cfg2 = _tiny_config(n_epochs=2)
    runner2 = DiffposeRunner(cfg2, log_dir=str(tmp_path / "ck"), seed=99)
    runner2.create_diffusion_model()
    runner2.create_pose_model()
    runner2.set_data(train, None)
    runner2.train(resume=True)
    # epoch 0 was done pre-resume; only epoch 1 ran now.
    assert int(runner2.state.epoch) == 2
    assert int(runner2.state.step) == 4


def test_runner_eval_only_with_converted_torch_checkpoint(tmp_path, rng):
    """Reference-format .pth states load straight into the runner."""
    from tests.oracle import load_reference_module
    import torch
    from types import SimpleNamespace

    chebconv = load_reference_module("models.ChebConv")
    gcndiff = load_reference_module("models.gcndiff")
    gcnpose = load_reference_module("models.gcnpose")

    mc = SimpleNamespace(hid_dim=32, emd_dim=32, coords_dim=[5, 5], num_layer=2,
                         n_head=4, dropout=0.25, n_pts=17)
    edges = torch.tensor(
        [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7], [7, 8], [8, 9],
         [9, 10], [8, 11], [11, 12], [12, 13], [8, 14], [14, 15], [15, 16]]
    )
    adj = chebconv.adj_mx_from_edges(17, edges, sparse=False)
    ref_diff = gcndiff.GCNdiff(adj, SimpleNamespace(model=mc))
    torch.save([ref_diff.state_dict()], tmp_path / "diff.pth")
    mc2 = SimpleNamespace(**{**vars(mc), "coords_dim": [2, 3]})
    ref_pose = gcnpose.GCNpose(adj, SimpleNamespace(model=mc2))
    torch.save([ref_pose.state_dict()], tmp_path / "pose.pth")

    cfg = _tiny_config()
    runner = DiffposeRunner(cfg, seed=11)
    runner.create_diffusion_model(str(tmp_path / "diff.pth"))
    runner.create_pose_model(str(tmp_path / "pose.pth"))
    runner.set_data(None, make_synthetic_dataset(num_frames=32, seed=5))
    p1, p2 = runner.evaluate()
    assert np.isfinite(p1) and np.isfinite(p2)
