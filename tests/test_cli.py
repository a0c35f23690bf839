"""CLI smoke tests: train + eval end-to-end through the real entry points."""

import os

import pytest

from diffpose_tpu.cli import main_frame, main_implicit


def test_main_frame_synthetic_train(tmp_path):
    rc = main_frame.main([
        "--config", "configs/human36m_diffpose_uvxyz_gt.yml",
        "--doc", "smoke", "--exp", str(tmp_path),
        "--train", "--ni", "--n_epochs", "2",
        "--synthetic_frames", "128", "--batch_size", "64",
        "--lr", "0.001",
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "smoke" / "config.yml")
    assert os.path.exists(tmp_path / "smoke" / "stdout.txt")


def test_main_frame_eval_only(tmp_path):
    rc = main_frame.main([
        "--config", "configs/human36m_diffpose_uvxyz_gt.yml",
        "--doc", "ev", "--exp", str(tmp_path), "--ni",
        "--synthetic_frames", "64", "--batch_size", "64",
        "--track_metrics",
    ])
    assert rc == 0


def test_main_implicit_synthetic(tmp_path):
    rc = main_implicit.main([
        "--config", "configs/human36m_ipose.yml",
        "--doc", "imp", "--exp", str(tmp_path), "--ni",
        "--use_implicit", "--implicit_iters", "6", "--min_iterations", "2",
        "--synthetic_frames", "64", "--batch_size", "64",
        "--track_metrics",
    ])
    assert rc == 0


def test_compare_driver(tmp_path):
    from diffpose_tpu.cli import compare

    rc = compare.main([
        "--config", "configs/human36m_ipose.yml",
        "--doc", "cmp", "--exp", str(tmp_path), "--ni",
        "--synthetic_frames", "48", "--batch_size", "48",
    ])
    assert rc == 0


def test_config_cli_override_rules(tmp_path):
    from diffpose_tpu.config import load_config

    cfg = load_config("configs/human36m_diffpose_uvxyz_cpn.yml")
    assert cfg.training.batch_size == 1024
    assert cfg.testing.test_num_diffusion_timesteps == 24
    cfg2 = load_config(
        "configs/human36m_diffpose_uvxyz_cpn.yml",
        cli_overrides={"batch_size": 256, "lr": 1e-3},
    )
    assert cfg2.training.batch_size == 256
    assert cfg2.optim.lr == 1e-3
    with pytest.raises(ValueError):
        load_config(
            "configs/human36m_diffpose_uvxyz_cpn.yml", cli_overrides={"bogus": 1}
        )


def test_config_ipose_has_implicit_section():
    from diffpose_tpu.config import load_config

    cfg = load_config("configs/human36m_ipose.yml")
    assert cfg.implicit is not None
    assert cfg.implicit.solver == "anderson"
    assert cfg.implicit.anderson_m == 5
    assert cfg.training.batch_size == 512


def test_main_implicit_detect_anomaly_flag(tmp_path):
    """--detect_anomaly maps to jax_debug_nans (the jax equivalent of
    torch.autograd.set_detect_anomaly, main_implicit_pose.py:232-234)."""
    import jax

    assert not jax.config.jax_debug_nans
    try:
        rc = main_implicit.main([
            "--config", "configs/human36m_ipose.yml",
            "--doc", "anom", "--exp", str(tmp_path), "--ni",
            "--use_implicit", "--implicit_iters", "4", "--min_iterations", "2",
            "--synthetic_frames", "32", "--batch_size", "32",
            "--detect_anomaly",
        ])
        assert rc == 0
        assert jax.config.jax_debug_nans  # flag actually engaged
    finally:
        jax.config.update("jax_debug_nans", False)


def test_debug_nans_catches_seeded_nan():
    """With the anomaly flag on, a NaN produced inside a jitted computation
    raises instead of propagating silently."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_debug_nans", True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    finally:
        jax.config.update("jax_debug_nans", False)
