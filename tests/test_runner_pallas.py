"""Runner eval with the fused Pallas denoiser (off-TPU the runner builds
the kernels in interpret mode, so the parity check runs everywhere)."""

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


def test_runner_pallas_eval_matches_module_eval():
    test_ds = make_synthetic_dataset(num_frames=32, seed=4)

    def run(impl):
        runner = DiffposeRunner(_cfg(), seed=33, denoiser_impl=impl)
        runner.create_diffusion_model()
        runner.create_pose_model()
        runner.set_data(None, test_ds)
        return runner.evaluate(is_train=True)

    p1_m, p2_m = run("module")
    p1_p, p2_p = run("pallas")
    np.testing.assert_allclose(p1_p, p1_m, rtol=2e-3)
    np.testing.assert_allclose(p2_p, p2_m, rtol=2e-3)
