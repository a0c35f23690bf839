"""Video-family orchestration: runner, CLI, mesh composition (VERDICT r1 item 5)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.config import (
    Config, ModelConfig, OptimConfig, TestingConfig, TrainingConfig, VideoConfig,
)
from diffpose_tpu.data.video import synthetic_video_dataset
from diffpose_tpu.train.video_runner import VideoRunner

FRAMES = 8


def _cfg(batch=4):
    return Config(
        model=ModelConfig(hid_dim=32, num_layer=2, n_head=4),
        video=VideoConfig(frames=FRAMES, num_layers=2),
        training=TrainingConfig(batch_size=batch, n_epochs=1),
        testing=TestingConfig(test_times=1, test_timesteps=2,
                              test_num_diffusion_timesteps=12),
        optim=OptimConfig(lr=1e-3),
    )


def _data(n_train=8, n_test=4, seed=0):
    return (
        synthetic_video_dataset(n_train, FRAMES, seed=seed),
        synthetic_video_dataset(n_test, FRAMES, seed=seed + 1),
    )


def test_video_runner_train_and_eval_unsharded():
    runner = VideoRunner(_cfg(), seed=3)
    runner.create_video_model()
    runner.set_data(*_data())
    history = runner.train()
    assert len(history["loss"]) == 1 and np.isfinite(history["loss"][0])
    assert len(history["p1"]) == 1 and np.isfinite(history["p1"][0])
    assert runner.eval_frames == 4 * FRAMES


def test_video_runner_2d_mesh_matches_unsharded_eval():
    """(data × context) mesh eval must match the unsharded eval — the
    per-(window, frame) seed ids make the GMM draws layout-invariant, so
    predictions agree to float tolerance.  (P2 aggregates get a loose
    bound only because Procrustes on RANDOM untrained predictions sits at
    near-degenerate SVDs where the reflection-fix sign amplifies f32
    reduction-order differences — pred equality is the strong check.)"""
    from diffpose_tpu.parallel import make_mesh
    from diffpose_tpu.train.video_steps import make_video_eval_step
    from diffpose_tpu.parallel.sharding import make_sharded_video_eval_step
    from diffpose_tpu.diffusion import get_beta_schedule

    _, test = _data()

    def run(mesh, cp):
        runner = VideoRunner(_cfg(), seed=9, mesh=mesh,
                             data_axis="data", cp_axis=cp)
        runner.create_video_model()
        runner.set_data(None, test)
        p1, p2 = runner.evaluate(is_train=True)
        return runner, p1, p2

    runner_a, p1_a, p2_a = run(None, None)
    mesh = make_mesh((4, 2), ("data", "context"))
    runner_b, p1_b, p2_b = run(mesh, "context")
    np.testing.assert_allclose(p1_b, p1_a, rtol=1e-4)
    np.testing.assert_allclose(p2_b, p2_a, rtol=0.1)

    # Strong check: identical per-frame predictions from both paths.
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    batch = next(iter(runner_a._make_loader(test, shuffle=False).epoch(0)))
    key = jax.random.PRNGKey(0)
    # One shared param set for both paths (the two runners' inits differ
    # in pos_embed key consumption).
    step_a = jax.jit(make_video_eval_step(runner_a.model, betas, (0, 6)))
    needed = {k: batch[k] for k in ("poses_2d_gmm", "poses_3d", "seeds")}
    _, _, pred_a = step_a(runner_b.state, needed, key)
    step_b = make_sharded_video_eval_step(
        runner_b.model, betas, (0, 6), mesh,
        frames_total=FRAMES, data_axis="data", cp_axis="context",
    )
    _, _, pred_b = step_b(runner_b.state, batch, key)
    np.testing.assert_allclose(np.asarray(pred_b), np.asarray(pred_a), atol=2e-5)


def test_video_runner_2d_mesh_train_step_runs():
    from diffpose_tpu.parallel import make_mesh

    mesh = make_mesh((4, 2), ("data", "context"))
    runner = VideoRunner(_cfg(), seed=5, mesh=mesh,
                         data_axis="data", cp_axis="context")
    runner.create_video_model()
    runner.set_data(*_data(seed=7))
    history = runner.train()
    assert np.isfinite(history["loss"][0])
    assert np.isfinite(history["p1"][0])


def test_video_runner_checkpoint_resume(tmp_path):
    cfg = _cfg()
    cfg.training.n_epochs = 2
    runner = VideoRunner(cfg, seed=11, log_dir=str(tmp_path))
    runner.create_video_model()
    runner.set_data(*_data(seed=13))
    runner.train()
    step_after = int(runner.state.step)

    runner2 = VideoRunner(cfg, seed=11, log_dir=str(tmp_path))
    runner2.create_video_model()
    runner2.set_data(*_data(seed=13))
    runner2.train(resume=True)  # already at n_epochs → no extra steps
    assert int(runner2.state.step) == step_after


def test_main_video_cli_smoke(tmp_path):
    from diffpose_tpu.cli import main_video

    rc = main_video.main([
        "--config", "configs/human36m_video.yml",
        "--doc", "vid", "--exp", str(tmp_path), "--ni",
        "--train", "--n_epochs", "1", "--frames", str(FRAMES),
        "--synthetic_windows", "8", "--batch_size", "4", "--lr", "0.001",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "vid" / "config.yml")


def test_main_video_cli_2d_mesh(tmp_path):
    from diffpose_tpu.cli import main_video

    rc = main_video.main([
        "--config", "configs/human36m_video.yml",
        "--doc", "vidmesh", "--exp", str(tmp_path), "--ni",
        "--train", "--n_epochs", "1", "--frames", str(FRAMES),
        "--synthetic_windows", "8", "--batch_size", "4", "--lr", "0.001",
        "--data_parallel", "--context_parallel", "2",
    ])
    assert rc == 0


def test_chunked_temporal_attention_matches_fused():
    """Above the attention_chunk threshold the chunked path engages and is
    numerically identical to the fused path (VERDICT r1 item 9)."""
    from diffpose_tpu.models.video import SpatioTemporalDiff
    from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges

    basis = cheb_basis_from_edges(17, H36M_EDGES)
    frames = 32
    kw = dict(basis=basis, frames=frames, hid_dim=32, num_layers=1,
              num_heads=4)
    fused = SpatioTemporalDiff(**kw, attention_chunk=0)
    chunked = SpatioTemporalDiff(**kw, attention_chunk=16)  # engages: 32 >= 16

    x = jax.random.normal(jax.random.PRNGKey(0), (2, frames, 17, 5))
    t = jnp.asarray([3.0, 11.0])
    params = fused.init({"params": jax.random.PRNGKey(1)}, x, t)["params"]
    want = fused.apply({"params": params}, x, t)
    got = chunked.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_video_runner_pallas_eval_matches_module_eval():
    """--denoiser_impl pallas: the spatial stack runs as fused kernels
    (interpret off-TPU) — eval parity with the module path."""
    _, test_ds = _data(seed=21)

    def run(impl):
        runner = VideoRunner(_cfg(), seed=13, denoiser_impl=impl)
        runner.create_video_model()
        runner.set_data(None, test_ds)
        return runner.evaluate(is_train=True)

    p1_m, p2_m = run("module")
    p1_p, p2_p = run("pallas")
    np.testing.assert_allclose(p1_p, p1_m, rtol=2e-3)
    np.testing.assert_allclose(p2_p, p2_m, rtol=2e-3)


def test_video_runner_pallas_eval_composes_with_2d_mesh():
    """Fused kernels per shard under the (data, context) mesh; temporal
    K/V all-gather stays an XLA collective inside the override.  One
    shared param set, module vs override under the SAME sharded step —
    per-frame predictions must agree to float tolerance."""
    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.ops.pallas_video import make_pallas_video_denoiser_fn
    from diffpose_tpu.parallel import make_mesh
    from diffpose_tpu.parallel.sharding import make_sharded_video_eval_step
    from diffpose_tpu.train.state import TrainState

    _, test_ds = _data(seed=22)
    mesh = make_mesh((4, 2), ("data", "context"))
    runner = VideoRunner(_cfg(), seed=14, mesh=mesh, cp_axis="context",
                         denoiser_impl="pallas")
    runner.create_video_model()
    runner.set_data(None, test_ds)
    state = TrainState.create(runner._params_init, opt_state=())
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    batch = next(iter(runner._make_loader(test_ds, shuffle=False).epoch(0)))
    key = jax.random.PRNGKey(0)
    kw = dict(frames_total=FRAMES, data_axis="data", cp_axis="context")
    step_m = make_sharded_video_eval_step(
        runner.model, betas, (0, 6), mesh, **kw)
    step_p = make_sharded_video_eval_step(
        runner.model, betas, (0, 6), mesh,
        denoise_override=runner._get_denoise_override(), **kw)
    _, _, pred_m = step_m(state, batch, key)
    _, _, pred_p = step_p(state, batch, key)
    np.testing.assert_allclose(
        np.asarray(pred_p), np.asarray(pred_m), atol=2e-5)


def test_video_runner_pallas_train_runs():
    """--train_impl pallas: the spatial blocks' fwd+bwd run through the
    fused kernel pair (interpret off-TPU); loss finite, params move."""
    runner = VideoRunner(_cfg(), seed=3, train_impl="pallas")
    runner.create_video_model()
    runner.set_data(*_data())
    p0 = jax.tree_util.tree_map(jnp.copy, runner._params_init)
    history = runner.train()
    assert np.isfinite(history["loss"][0])
    assert np.isfinite(history["p1"][0])
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, runner.state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_video_runner_pallas_train_composes_with_data_mesh():
    """Fused video train step injected as base_step of the sharded step:
    per-shard kernels, grads pmean'd over the data axis."""
    from diffpose_tpu.parallel import make_mesh

    mesh = make_mesh((8,), ("data",))
    runner = VideoRunner(_cfg(batch=8), seed=5, mesh=mesh,
                         data_axis="data", train_impl="pallas")
    runner.create_video_model()
    runner.set_data(*_data(seed=7))
    history = runner.train()
    assert np.isfinite(history["loss"][0])


def test_video_runner_pallas_train_cp_falls_back(caplog):
    """CP + pallas train: warn and use the module step (the temporal K/V
    all-gather lives in the module forward)."""
    import logging as _logging

    from diffpose_tpu.parallel import make_mesh

    mesh = make_mesh((4, 2), ("data", "context"))
    runner = VideoRunner(_cfg(), seed=5, mesh=mesh, data_axis="data",
                         cp_axis="context", train_impl="pallas")
    runner.create_video_model()
    runner.set_data(*_data(seed=7))
    with caplog.at_level(_logging.WARNING):
        history = runner.train()
    assert np.isfinite(history["loss"][0])
    assert any("does not compose with context" in r.message
               for r in caplog.records)


def test_main_video_cli_pallas_train(tmp_path):
    from diffpose_tpu.cli import main_video

    rc = main_video.main([
        "--config", "configs/human36m_video.yml",
        "--doc", "vidpal", "--exp", str(tmp_path), "--ni",
        "--train", "--n_epochs", "1", "--frames", str(FRAMES),
        "--synthetic_windows", "8", "--batch_size", "4", "--lr", "0.001",
        "--train_impl", "pallas",
    ])
    assert rc == 0


def test_video_runner_pallas_train_prng_fallback(caplog):
    """--dropout_impl prng off-TPU: warn + fall back to explicit masks
    (Mosaic interpret has no PRNG) — the step still runs."""
    import logging as _logging

    runner = VideoRunner(_cfg(), seed=3, train_impl="pallas",
                         dropout_impl="prng")
    runner.create_video_model()
    runner.set_data(*_data())
    with caplog.at_level(_logging.WARNING):
        history = runner.train()
    assert np.isfinite(history["loss"][0])
    assert any("prng needs TPU hardware" in r.message for r in caplog.records)


def test_video_runner_pallas_full_eval_matches_module():
    """`--denoiser_impl pallas_full` (whole spatio-temporal forward as ONE
    kernel, ops/pallas_video_full.py) reproduces the module eval."""
    def run(impl):
        runner = VideoRunner(_cfg(), seed=21, denoiser_impl=impl)
        runner.create_video_model()
        runner.set_data(*_data(seed=6))
        return runner.evaluate(is_train=True)

    p1_m, p2_m = run("module")
    p1_f, p2_f = run("pallas_full")
    np.testing.assert_allclose(p1_f, p1_m, rtol=2e-3)
    np.testing.assert_allclose(p2_f, p2_m, rtol=2e-3)
