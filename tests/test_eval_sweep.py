"""Device-side eval sweep gives identical results to per-batch eval."""

import numpy as np

from diffpose_tpu.config import Config, ModelConfig, OptimConfig, TestingConfig, TrainingConfig
from diffpose_tpu.data import make_synthetic_dataset
from diffpose_tpu.train import DiffposeRunner


def _cfg():
    return Config(
        model=ModelConfig(hid_dim=32, num_layer=2, n_head=4),
        training=TrainingConfig(batch_size=16, n_epochs=1),
        testing=TestingConfig(test_times=1, test_timesteps=2, test_num_diffusion_timesteps=12),
        optim=OptimConfig(),
    )


def test_eval_sweep_matches_per_batch():
    test_ds = make_synthetic_dataset(num_frames=72, seed=3)  # 5 batches, last partial

    def run(sweep):
        runner = DiffposeRunner(_cfg(), seed=21, eval_sweep=sweep)
        runner.create_diffusion_model()
        runner.create_pose_model()
        runner.set_data(None, test_ds)
        return runner.evaluate(is_train=True)

    p1_a, p2_a = run(1)
    p1_b, p2_b = run(2)
    # Same seed → identical model init and per-sample GMM keys... except the
    # runner consumes keys per dispatch; per-sample seeds come from the
    # loader, so results must agree to float tolerance.
    np.testing.assert_allclose(p1_b, p1_a, rtol=1e-4)
    np.testing.assert_allclose(p2_b, p2_a, rtol=1e-4)


def test_sharded_eval_sweep_matches_unsharded(rng):
    """sweep>1 composed with the data-parallel mesh (lax.map INSIDE the
    shard_map) must match the unsharded per-batch eval exactly
    (VERDICT r1 item 6)."""
    from diffpose_tpu.parallel import make_mesh

    test_ds = make_synthetic_dataset(num_frames=128, seed=7)  # 8 batches of 16

    def run(sweep, mesh):
        runner = DiffposeRunner(_cfg(), seed=33, eval_sweep=sweep, mesh=mesh)
        runner.create_diffusion_model()
        runner.create_pose_model()
        runner.set_data(None, test_ds)
        return runner.evaluate(is_train=True)

    p1_a, p2_a = run(1, None)
    mesh = make_mesh((8,), ("data",))
    p1_b, p2_b = run(4, mesh)
    np.testing.assert_allclose(p1_b, p1_a, rtol=1e-4)
    np.testing.assert_allclose(p2_b, p2_a, rtol=1e-4)
