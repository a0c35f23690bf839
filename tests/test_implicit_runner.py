import numpy as np

from diffpose_tpu.config import (
    Config, ImplicitConfig, ModelConfig, OptimConfig, TestingConfig, TrainingConfig,
)
from diffpose_tpu.data import make_synthetic_dataset
from diffpose_tpu.train.implicit_runner import ImplicitRunner


def _cfg():
    return Config(
        model=ModelConfig(hid_dim=32, num_layer=2, n_head=4),
        training=TrainingConfig(batch_size=32, n_epochs=1),
        testing=TestingConfig(test_times=1, test_timesteps=2, test_num_diffusion_timesteps=12),
        optim=OptimConfig(lr=1e-3),
        implicit=ImplicitConfig(max_iterations=8, min_iterations=3, tolerance=5e-2),
    )


def test_implicit_runner_train_and_direct_inference_eval():
    runner = ImplicitRunner(_cfg(), seed=5)
    runner.create_diffusion_model()
    runner.create_pose_model()
    runner.set_data(
        make_synthetic_dataset(num_frames=64, seed=0),
        make_synthetic_dataset(num_frames=32, seed=1),
    )
    history = runner.train()
    assert len(history["loss"]) == 1 and np.isfinite(history["loss"][0])
    assert len(history["p1"]) == 1 and np.isfinite(history["p1"][0])
    # Direct inference ran fixed-point solves and recorded iteration counts.
    assert runner.fp_iterations and all(i >= 3 for i in runner.fp_iterations)
    # BN running stats were threaded through training.
    assert runner.state.model_state is not None
    bn_mean = np.asarray(runner.state.model_state["bn_mean"])
    assert not np.allclose(bn_mean, 0.0)


def test_implicit_flag_off_uses_standard_diffusion():
    runner = ImplicitRunner(_cfg(), use_implicit=False, seed=6)
    runner.create_diffusion_model()
    runner.create_pose_model()
    runner.set_data(None, make_synthetic_dataset(num_frames=32, seed=2))
    p1, p2 = runner.evaluate()
    assert np.isfinite(p1) and np.isfinite(p2)
