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


def _cfg_warm():
    cfg = _cfg()
    cfg.implicit.use_warm_start = True
    cfg.implicit.warm_start_momentum = 0.5
    return cfg


def test_warm_start_eval_carries_fixed_point():
    """Eval with use_warm_start threads the previous batch's fixed point
    (reference last_fixed_point, igcn.py:309-313) and stays finite."""
    runner = ImplicitRunner(_cfg_warm(), seed=7)
    runner.create_diffusion_model()
    runner.create_pose_model()
    runner.set_data(None, make_synthetic_dataset(num_frames=96, seed=3))
    p1, p2 = runner.evaluate()
    assert np.isfinite(p1) and np.isfinite(p2)
    assert len(runner.fp_iterations) == 3  # 96 frames / batch 32


def test_warm_start_train_step_wraps_and_resets():
    """Training with warm start runs the wrapped step (fixed-point carry +
    per-epoch reset hook, reference reset_history implicit_pose.py:319)."""
    cfg = _cfg_warm()
    cfg.training.n_epochs = 2
    runner = ImplicitRunner(cfg, seed=8)
    runner.create_diffusion_model()
    runner.create_pose_model()
    runner.set_data(
        make_synthetic_dataset(num_frames=64, seed=4),
        make_synthetic_dataset(num_frames=32, seed=5),
    )
    history = runner.train()
    assert len(history["loss"]) == 2
    assert all(np.isfinite(l) for l in history["loss"])


def test_igcn_torch_checkpoint_loads_through_runner(tmp_path):
    """create_diffusion_model('...pth') ingests a reference-ABI IGCN
    checkpoint: params AND BatchNorm running stats (VERDICT r1 item 3)."""
    import pytest
    torch = pytest.importorskip("torch")
    from tests.oracle import load_reference_module
    from types import SimpleNamespace

    ref_igcn = load_reference_module("models.igcn")
    chebconv = load_reference_module("models.ChebConv")
    from diffpose_tpu.graph import H36M_EDGES

    torch.manual_seed(11)
    adj = chebconv.adj_mx_from_edges(
        17, torch.tensor(list(H36M_EDGES), dtype=torch.long), sparse=False
    )
    mcfg = SimpleNamespace(hid_dim=32, emd_dim=32, coords_dim=[5, 5],
                           num_layer=2, n_head=4, dropout=0.25, n_pts=17)
    ref = ref_igcn.IGCN(adj, SimpleNamespace(model=mcfg))
    with torch.no_grad():
        ref.batch_norm.running_mean.uniform_(-0.3, 0.3)
    # reference checkpoint ABI: [model_state, optim, epoch, step, ema]
    path = tmp_path / "ckpt.pth"
    torch.save([ref.state_dict(), None, 0, 0, None], str(path))

    runner = ImplicitRunner(_cfg(), seed=9)
    runner.create_diffusion_model(str(path))
    got_mean = np.asarray(runner._model_state_init["bn_mean"])
    np.testing.assert_allclose(got_mean, ref.batch_norm.running_mean.numpy(), atol=1e-7)
    got_w = np.asarray(runner._params_diff_init["gconv_input"]["w"])
    np.testing.assert_allclose(
        got_w, ref.gconv_input.weight.detach().numpy()[:, 0], atol=1e-7
    )
    # and the loaded model evaluates end-to-end
    runner.create_pose_model()
    runner.set_data(None, make_synthetic_dataset(num_frames=32, seed=6))
    p1, p2 = runner.evaluate()
    assert np.isfinite(p1) and np.isfinite(p2)


def test_implicit_runner_pallas_eval_matches_module_eval():
    # Off-TPU the runner builds the fused kernels in interpret mode, so
    # this parity check runs (and must pass) everywhere.
    test_ds = make_synthetic_dataset(num_frames=32, seed=3)

    def run(impl):
        runner = ImplicitRunner(_cfg(), seed=11, denoiser_impl=impl)
        runner.create_diffusion_model()
        runner.create_pose_model()
        runner.set_data(None, test_ds)
        return runner.evaluate(is_train=True)

    p1_m, p2_m = run("module")
    p1_p, p2_p = run("pallas")
    np.testing.assert_allclose(p1_p, p1_m, rtol=2e-3)
    np.testing.assert_allclose(p2_p, p2_m, rtol=2e-3)


def test_implicit_runner_pallas_train_wires_fused_step():
    """--train_impl pallas on the implicit family: the runner injects the
    fused backprop-through-the-solve step (ops/pallas_igcn_train.py) into
    both the per-batch and the device-resident-sweep paths (interpret
    mode off-TPU, so this runs everywhere)."""
    cfg = _cfg()

    def run(train_sweep):
        runner = ImplicitRunner(cfg, seed=12, train_impl="pallas",
                                train_sweep=train_sweep)
        runner.create_diffusion_model()
        runner.create_pose_model()
        runner.set_data(
            make_synthetic_dataset(num_frames=64, seed=7),
            make_synthetic_dataset(num_frames=32, seed=8),
        )
        history = runner.train()
        assert len(history["loss"]) == 1 and np.isfinite(history["loss"][0])
        # BN stats moved → the fused fn's train-mode BatchNorm ran
        assert not np.allclose(np.asarray(runner.state.model_state["bn_mean"]), 0.0)
        return history

    run(train_sweep=1)   # per-batch path
    run(train_sweep=2)   # sweep path (base_step inside the scan)
