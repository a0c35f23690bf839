"""Sharded IGCN training on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.data import BatchLoader, make_synthetic_dataset
from diffpose_tpu.diffusion import get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import ema_register
from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.parallel import make_mesh, shard_batch
from diffpose_tpu.parallel.sharding import make_sharded_implicit_train_step
from diffpose_tpu.train import TrainState, make_optimizer

BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51)
BASIS = cheb_basis_from_edges(17, H36M_EDGES)


def test_sharded_implicit_train_step():
    mesh = make_mesh()
    model = IGCN(
        basis=BASIS, hid_dim=32, num_layers=2, num_heads=4,
        max_iterations=4, min_iterations=4,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    state = TrainState.create(
        variables["params"], opt.init(variables["params"]),
        ema_params=ema_register(variables["params"]),
        model_state=variables["batch_stats"],
    )

    ds = make_synthetic_dataset(num_frames=64, seed=0)
    loader = BatchLoader(ds, batch_size=64, shuffle=False)
    batch = shard_batch(mesh, next(iter(loader.epoch(0))))

    step_fn = make_sharded_implicit_train_step(model, opt, BETAS, mesh)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["fp_iterations"]) == 4
    # Params and BN stats remain replicated after the collective update.
    assert jax.tree_util.tree_leaves(state.params)[0].sharding.is_fully_replicated
    assert jax.tree_util.tree_leaves(state.model_state)[0].sharding.is_fully_replicated
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def _pose_model():
    from diffpose_tpu.models import GCNPose

    return GCNPose(basis=BASIS, hid_dim=32, num_layers=2, num_heads=4)


def test_sharded_implicit_eval_matches_single_device_fixed_count():
    """With the per-sample damped solver at a FIXED iteration count there is
    no batch coupling (eval-mode BN uses running stats), so the sharded
    eval must reproduce the single-device result exactly."""
    from diffpose_tpu.parallel.sharding import make_sharded_implicit_eval_step
    from diffpose_tpu.train.implicit_steps import make_implicit_eval_step

    mesh = make_mesh()
    model = IGCN(
        basis=BASIS, hid_dim=32, num_layers=2, num_heads=4,
        solver="damped", max_iterations=4, min_iterations=4,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )
    pose = _pose_model()
    pose_params = pose.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((2, 17, 2))
    )["params"]
    state = TrainState.create(
        variables["params"], opt_state=(), model_state=variables["batch_stats"],
    )

    ds = make_synthetic_dataset(num_frames=64, seed=1)
    batch = next(iter(BatchLoader(ds, batch_size=64, shuffle=False).epoch(0)))
    key = jax.random.PRNGKey(2)

    single = jax.jit(make_implicit_eval_step(model, pose, t_infer=12))
    p1_s, p2_s, pred_s, iters_s = single(state, pose_params, batch, key)

    sharded = make_sharded_implicit_eval_step(model, pose, mesh, t_infer=12)
    p1_m, p2_m, pred_m, iters_m = sharded(
        state, pose_params, shard_batch(mesh, batch), key
    )
    assert iters_m.shape == (jax.device_count(),)
    assert np.all(np.asarray(iters_m) == int(iters_s))
    np.testing.assert_allclose(np.asarray(p1_m), np.asarray(p1_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2_m), np.asarray(p2_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_m), np.asarray(pred_s), atol=1e-6)


def test_sharded_implicit_eval_anderson_warm_start():
    """Anderson + warm start through the sharded step: per-shard solves,
    fp carried sharded, fewer-or-equal iterations on the warm pass."""
    from diffpose_tpu.parallel.sharding import (
        data_sharding,
        make_sharded_implicit_eval_step,
    )

    mesh = make_mesh()
    model = IGCN(
        basis=BASIS, hid_dim=32, num_layers=2, num_heads=4,
        solver="anderson", max_iterations=20, min_iterations=1, tolerance=1e-2,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(3)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )
    pose = _pose_model()
    pose_params = pose.init(
        {"params": jax.random.PRNGKey(4)}, jnp.zeros((2, 17, 2))
    )["params"]
    state = TrainState.create(
        variables["params"], opt_state=(), model_state=variables["batch_stats"],
    )

    ds = make_synthetic_dataset(num_frames=64, seed=2)
    batch = shard_batch(mesh, next(iter(BatchLoader(ds, batch_size=64, shuffle=False).epoch(0))))

    step = make_sharded_implicit_eval_step(
        model, pose, mesh, t_infer=12, use_warm_start=True
    )
    z0 = jax.device_put(jnp.zeros((64, 17, 32)), data_sharding(mesh))
    p1, p2, _, iters_cold, fp = step(
        state, pose_params, batch, jax.random.PRNGKey(5), z0, jnp.asarray(0.0)
    )
    assert np.isfinite(np.asarray(p1)).all()
    # same batch again, warm-started from its own fixed point
    _, _, _, iters_warm, _ = step(
        state, pose_params, batch, jax.random.PRNGKey(6), fp, jnp.asarray(1.0)
    )
    assert np.all(np.asarray(iters_warm) <= np.asarray(iters_cold))


def test_sharded_implicit_eval_with_pallas_solve_override():
    """The fused-kernel solve composes with the data mesh: each shard runs
    its own kernel-backed fixed-point solve (interpret mode here), matching
    the module path exactly at a fixed iteration count."""
    from diffpose_tpu.ops.pallas_denoiser import make_pallas_lifter_fn
    from diffpose_tpu.ops.pallas_igcn import make_pallas_igcn_fn
    from diffpose_tpu.parallel.sharding import make_sharded_implicit_eval_step

    mesh = make_mesh()
    model = IGCN(
        basis=BASIS, hid_dim=32, num_layers=2, num_heads=4,
        solver="damped", max_iterations=4, min_iterations=4,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )
    pose = _pose_model()
    pose_params = pose.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((2, 17, 2))
    )["params"]
    state = TrainState.create(
        variables["params"], opt_state=(), model_state=variables["batch_stats"],
    )

    ds = make_synthetic_dataset(num_frames=64, seed=1)
    batch = next(iter(BatchLoader(ds, batch_size=64, shuffle=False).epoch(0)))
    key = jax.random.PRNGKey(2)

    module = make_sharded_implicit_eval_step(model, pose, mesh, t_infer=12)
    p1_m, p2_m, pred_m, iters_m = module(
        state, pose_params, shard_batch(mesh, batch), key)

    fused = make_sharded_implicit_eval_step(
        model, pose, mesh, t_infer=12,
        solve_override=make_pallas_igcn_fn(
            model, block_b=4, interpret=True, precision=None),
        lift_override=make_pallas_lifter_fn(
            BASIS, num_layers=2, num_heads=4, hid_dim=32,
            block_b=4, interpret=True),
    )
    p1_p, p2_p, pred_p, iters_p = fused(
        state, pose_params, shard_batch(mesh, batch), key)

    assert np.all(np.asarray(iters_p) == np.asarray(iters_m))
    np.testing.assert_allclose(np.asarray(pred_p), np.asarray(pred_m), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1_p), np.asarray(p1_m), atol=1e-4)
