"""Device-resident train sweep for the implicit (IGCN) family.

The sweep must reproduce the per-batch path EXACTLY: batch_stats ride
``TrainState.model_state`` through the ``lax.scan`` carry, and with warm
start the previous step's fixed point flows through the scan the same way
the reference's ``last_fixed_point`` buffer flows across batches
(``models/igcn.py:309-313`` in the reference's numbering; see
``runners/implicit_pose.py:270-420`` for the loop this accelerates).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpose_tpu.data import BatchLoader, make_synthetic_dataset
from diffpose_tpu.diffusion import get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import ema_register
from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.train import TrainState, make_optimizer
from diffpose_tpu.train.implicit_steps import (
    make_implicit_train_step,
    make_implicit_train_sweep_step,
)

BETAS = get_beta_schedule(
    "linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51
)
BASIS = cheb_basis_from_edges(17, H36M_EDGES)
SWEEP = 3


def _setup(seed=0):
    model = IGCN(
        basis=BASIS, hid_dim=32, num_layers=2, num_heads=4,
        max_iterations=4, min_iterations=4,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(seed)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    state = TrainState.create(
        variables["params"], opt.init(variables["params"]),
        ema_params=ema_register(variables["params"]),
        model_state=variables["batch_stats"],
    )
    ds = make_synthetic_dataset(num_frames=48, seed=1)
    data = {
        "poses_3d": jnp.asarray(ds.poses_3d),
        "poses_2d_gmm": jnp.asarray(ds.poses_2d_gmm),
    }
    loader = BatchLoader(ds, batch_size=16, shuffle=False)
    idx = np.stack(list(loader.epoch_indices(0)))  # [3, 16]
    return model, opt, state, data, idx


def _assert_trees_close(a, b, atol=1e-6):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=1e-5)


def test_implicit_sweep_matches_sequential():
    """sweep=3 scan == 3 sequential make_implicit_train_step calls:
    params, opt_state, EMA and BatchNorm running stats all identical."""
    model, opt, state, data, idx = _setup()
    key = jax.random.PRNGKey(7)

    base = jax.jit(make_implicit_train_step(model, opt, BETAS, ema_mu=0.9))
    seq_state = state
    keys = jax.random.split(key, SWEEP)
    seq_losses = []
    for i in range(SWEEP):
        batch = {k: v[idx[i]] for k, v in data.items()}
        seq_state, m = base(seq_state, batch, keys[i])
        seq_losses.append(float(m["loss"]))

    sweep_fn = jax.jit(
        make_implicit_train_sweep_step(model, opt, BETAS, sweep=SWEEP, ema_mu=0.9)
    )
    sw_state, sw_metrics = sweep_fn(state, data, jnp.asarray(idx), key)

    np.testing.assert_allclose(
        np.asarray(sw_metrics["loss"]), np.asarray(seq_losses), rtol=1e-5
    )
    _assert_trees_close(sw_state.params, seq_state.params)
    _assert_trees_close(sw_state.model_state, seq_state.model_state)
    _assert_trees_close(sw_state.ema_params, seq_state.ema_params)
    assert int(sw_state.step) == int(seq_state.step) == SWEEP
    # BN stats actually moved (the sweep really threads batch_stats).
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(sw_state.model_state)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.model_state)[0]),
    )


def test_implicit_sweep_warm_start_matches_sequential():
    """Warm start through the scan: first scanned step uses the caller's
    (z0, z0_weight), later steps blend the previous fixed point with
    warm_start_momentum — exactly the per-batch carry semantics."""
    model, opt, state, data, idx = _setup(seed=2)
    key = jax.random.PRNGKey(11)
    mom = 0.5
    z0 = jnp.zeros((16, 17, 32))

    base = jax.jit(
        make_implicit_train_step(model, opt, BETAS, ema_mu=0.9, use_warm_start=True)
    )
    seq_state = state
    keys = jax.random.split(key, SWEEP)
    z, w = z0, jnp.asarray(0.0, jnp.float32)
    for i in range(SWEEP):
        batch = {k: v[idx[i]] for k, v in data.items()}
        seq_state, m = base(seq_state, batch, keys[i], z, w)
        z, w = m["fixed_point"], jnp.asarray(mom, jnp.float32)

    sweep_fn = jax.jit(
        make_implicit_train_sweep_step(
            model, opt, BETAS, sweep=SWEEP, ema_mu=0.9,
            use_warm_start=True, warm_start_momentum=mom,
        )
    )
    sw_state, sw_metrics = sweep_fn(
        state, data, jnp.asarray(idx), key, z0, jnp.asarray(0.0, jnp.float32)
    )

    _assert_trees_close(sw_state.params, seq_state.params)
    _assert_trees_close(sw_state.model_state, seq_state.model_state)
    # The carried fixed point is the LAST step's solution.
    np.testing.assert_allclose(
        np.asarray(sw_metrics["fixed_point"]), np.asarray(z), atol=1e-6, rtol=1e-5
    )


def test_sharded_implicit_sweep_matches_sequential_sharded():
    """On the virtual mesh the sweep must equal sequential SHARDED per-batch
    steps (same shard slices, same pmean points)."""
    from diffpose_tpu.parallel import make_mesh, shard_batch
    from diffpose_tpu.parallel.sharding import (
        make_sharded_implicit_train_step,
        make_sharded_implicit_train_sweep_step,
    )

    mesh = make_mesh()
    if np.prod(mesh.devices.shape) < 2:
        pytest.skip("needs a multi-device mesh")
    model, opt, state, data, idx = _setup(seed=3)
    key = jax.random.PRNGKey(13)
    # Both step factories donate their state argument — keep a live copy.
    state0 = jax.tree_util.tree_map(jnp.array, state)

    base = make_sharded_implicit_train_step(model, opt, BETAS, mesh, ema_mu=0.9)
    seq_state = state
    keys = jax.random.split(key, SWEEP)
    for i in range(SWEEP):
        batch = shard_batch(mesh, {k: np.asarray(v)[idx[i]] for k, v in data.items()})
        seq_state, _ = base(seq_state, batch, keys[i])

    sweep_fn = make_sharded_implicit_train_sweep_step(
        model, opt, BETAS, mesh, sweep=SWEEP, ema_mu=0.9
    )
    sw_state, sw_metrics = sweep_fn(state0, data, jnp.asarray(idx), key)

    _assert_trees_close(sw_state.params, seq_state.params, atol=1e-5)
    _assert_trees_close(sw_state.model_state, seq_state.model_state, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(sw_metrics["loss"])))
    assert jax.tree_util.tree_leaves(sw_state.params)[0].sharding.is_fully_replicated


def test_implicit_runner_train_sweep_with_warm_start():
    """Runner-level: --train_sweep now works for the implicit family
    (VERDICT r2 item 3; train/implicit_runner.py overrides _build_sweep_fn),
    incl. the tail dispatch and the per-epoch warm-start reset."""
    from diffpose_tpu.config import (
        Config, ImplicitConfig, ModelConfig, OptimConfig, TestingConfig,
        TrainingConfig,
    )
    from diffpose_tpu.train.implicit_runner import ImplicitRunner

    cfg = Config(
        model=ModelConfig(hid_dim=32, num_layer=2, n_head=4),
        training=TrainingConfig(batch_size=16, n_epochs=2),
        testing=TestingConfig(test_times=1, test_timesteps=2,
                              test_num_diffusion_timesteps=12),
        optim=OptimConfig(lr=1e-3),
        implicit=ImplicitConfig(
            max_iterations=4, min_iterations=4,
            use_warm_start=True, warm_start_momentum=0.5,
        ),
    )
    runner = ImplicitRunner(cfg, seed=21, train_sweep=3)
    runner.create_diffusion_model()
    runner.create_pose_model()
    # 7 batches/epoch → two sweeps of 3 + a tail of 1 (exercises tail_fn
    # sharing the warm-start carry with the main sweep fn).
    runner.set_data(
        make_synthetic_dataset(num_frames=112, seed=0),
        make_synthetic_dataset(num_frames=32, seed=1),
    )
    history = runner.train()
    assert len(history["loss"]) == 2
    assert all(np.isfinite(l) for l in history["loss"])
    assert int(runner.state.step) == 2 * 7
    # BN stats moved through the sweep.
    bn = np.asarray(runner.state.model_state["bn_mean"])
    assert not np.allclose(bn, 0.0)
