"""Multi-chip logic on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.data import BatchLoader, make_synthetic_dataset
from diffpose_tpu.diffusion import get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose, ema_register
from diffpose_tpu.parallel import (
    make_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
)
from diffpose_tpu.train import TrainState, make_eval_step, make_optimizer

BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51)
BASIS = cheb_basis_from_edges(17, H36M_EDGES)


def _models():
    diff = GCNDiff(basis=BASIS, hid_dim=32, num_layers=2, num_heads=4)
    pose = GCNPose(basis=BASIS, hid_dim=32, num_layers=2, num_heads=4)
    return diff, pose


def _state(model, optimizer, key):
    params = model.init({"params": key}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    return TrainState.create(params, optimizer.init(params), ema_params=ema_register(params))


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count()
    mesh2 = make_mesh((4, 2), ("data", "hypothesis"))
    assert mesh2.axis_names == ("data", "hypothesis")


def test_sharded_train_step_runs_and_keeps_params_replicated():
    mesh = make_mesh()
    ds = make_synthetic_dataset(num_frames=256, seed=0)
    loader = BatchLoader(ds, batch_size=64, shuffle=True)
    diff, _ = _models()
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    state = _state(diff, opt, jax.random.PRNGKey(0))

    step_fn = make_sharded_train_step(diff, opt, BETAS, mesh)
    key = jax.random.PRNGKey(1)
    losses = []
    for i, batch in enumerate(loader.epoch(0)):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, shard_batch(mesh, batch), sub)
        losses.append(float(metrics["loss"]))
    assert len(losses) == 4 and np.isfinite(losses).all()
    # Parameters must remain fully replicated after the update.
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_training_converges():
    mesh = make_mesh()
    ds = make_synthetic_dataset(num_frames=256, seed=4)
    loader = BatchLoader(ds, batch_size=128, shuffle=True)
    diff, _ = _models()
    opt = make_optimizer(lr=1e-3, steps_per_epoch=2)
    state = _state(diff, opt, jax.random.PRNGKey(0))
    step_fn = make_sharded_train_step(diff, opt, BETAS, mesh)

    key = jax.random.PRNGKey(2)
    losses = []
    for epoch in range(12):
        for batch in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            state, m = step_fn(state, shard_batch(mesh, batch), sub)
            losses.append(float(m["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) - 5.0


def test_sharded_eval_exactly_matches_single_device():
    """Per-sample keyed randomness makes eval sharding-layout invariant."""
    mesh = make_mesh()
    ds = make_synthetic_dataset(num_frames=64, seed=1)
    loader = BatchLoader(ds, batch_size=64, shuffle=False)
    diff, pose = _models()
    opt = make_optimizer()
    state = _state(diff, opt, jax.random.PRNGKey(3))
    pose_params = pose.init({"params": jax.random.PRNGKey(4)}, jnp.zeros((2, 17, 2)))["params"]

    batch = next(iter(loader.epoch(0)))
    key = jax.random.PRNGKey(5)

    single = jax.jit(make_eval_step(diff, pose, BETAS, (0, 12), test_times=2))
    p1_s, p2_s, pred_s = single(state, pose_params, batch, key)

    sharded = make_sharded_eval_step(diff, pose, BETAS, (0, 12), mesh, test_times=2)
    p1_m, p2_m, pred_m = sharded(state, pose_params, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(np.asarray(p1_s), np.asarray(p1_m), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2_s), np.asarray(p2_m), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_s), np.asarray(pred_m), atol=1e-6)


def test_shard_batch_layout():
    mesh = make_mesh()
    ds = make_synthetic_dataset(num_frames=64, seed=2)
    loader = BatchLoader(ds, batch_size=64, shuffle=False)
    batch = shard_batch(mesh, next(iter(loader.epoch(0))))
    for v in batch.values():
        assert not v.sharding.is_fully_replicated
        assert v.sharding.spec[0] == "data"


def test_hypothesis_parallel_eval_matches_single_device():
    """2-D (data × hypothesis) mesh: each hypothesis shard solves
    test_times/H hypotheses; the psum'd mean matches the on-chip result
    (deterministic protocol — the reference eval)."""
    mesh = make_mesh((4, 2), ("data", "hypothesis"))
    ds = make_synthetic_dataset(num_frames=64, seed=6)
    loader = BatchLoader(ds, batch_size=64, shuffle=False)
    diff, pose = _models()
    opt = make_optimizer()
    state = _state(diff, opt, jax.random.PRNGKey(7))
    pose_params = pose.init({"params": jax.random.PRNGKey(8)}, jnp.zeros((2, 17, 2)))["params"]

    batch = next(iter(loader.epoch(0)))
    key = jax.random.PRNGKey(9)

    single = jax.jit(make_eval_step(diff, pose, BETAS, (0, 12), test_times=4))
    p1_s, p2_s, pred_s = single(state, pose_params, batch, key)

    sharded = make_sharded_eval_step(
        diff, pose, BETAS, (0, 12), mesh, test_times=4, hyp_axis="hypothesis"
    )
    p1_m, p2_m, pred_m = sharded(state, pose_params, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(np.asarray(pred_s), np.asarray(pred_m), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1_s), np.asarray(p1_m), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2_s), np.asarray(p2_m), atol=1e-5)


def test_sharded_train_sweep_matches_sequential_sharded_steps():
    """make_sharded_train_sweep_step(sweep=S) must equal S sequential
    make_sharded_train_step calls on the gathered batches with the same
    split keys — device-resident-data training composed with the mesh."""
    from diffpose_tpu.parallel.sharding import (
        make_sharded_train_sweep_step,
        replicated,
    )

    mesh = make_mesh()
    ds = make_synthetic_dataset(num_frames=512, seed=3)
    diff, _ = _models()
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)

    sweep, b = 3, 64
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, len(ds), size=(sweep, b)).astype(np.int32))
    key = jax.random.PRNGKey(7)

    data_host = {
        "poses_3d": jnp.asarray(ds.poses_3d),
        "poses_2d_gmm": jnp.asarray(ds.poses_2d_gmm),
    }

    # reference trajectory: sequential sharded steps
    state_ref = _state(diff, opt, jax.random.PRNGKey(4))
    step_fn = make_sharded_train_step(diff, opt, BETAS, mesh, donate=False)
    losses_ref = []
    for s, k in enumerate(jax.random.split(key, sweep)):
        batch = {name: data_host[name][idx[s]] for name in data_host}
        state_ref, metrics = step_fn(state_ref, shard_batch(mesh, batch), k)
        losses_ref.append(float(metrics["loss"]))

    # sweep trajectory: one dispatch
    state_sw = _state(diff, opt, jax.random.PRNGKey(4))
    rep = replicated(mesh)
    data_dev = {k: jax.device_put(v, rep) for k, v in data_host.items()}
    sweep_fn = make_sharded_train_sweep_step(
        diff, opt, BETAS, mesh, sweep=sweep, donate=False
    )
    state_sw, metrics = sweep_fn(state_sw, data_dev, idx, key)

    np.testing.assert_allclose(
        np.asarray(metrics["loss"]), np.asarray(losses_ref), rtol=1e-6
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state_ref.params),
        jax.tree_util.tree_leaves(state_sw.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
    assert int(state_sw.step) == sweep


def test_sharded_eval_with_pallas_overrides_matches_module():
    """Fused-kernel eval composes with the data mesh: the overrides run
    per-device on the local shard inside shard_map (interpret mode here)."""
    from diffpose_tpu.ops.pallas_denoiser import (
        make_pallas_denoiser_fn,
        make_pallas_lifter_fn,
    )

    mesh = make_mesh()
    ds = make_synthetic_dataset(num_frames=32, seed=6)
    loader = BatchLoader(ds, batch_size=32, shuffle=False)
    diff, pose = _models()
    opt = make_optimizer()
    state = _state(diff, opt, jax.random.PRNGKey(7))
    pose_params = pose.init({"params": jax.random.PRNGKey(8)}, jnp.zeros((2, 17, 2)))["params"]

    batch = shard_batch(mesh, next(iter(loader.epoch(0))))
    key = jax.random.PRNGKey(9)

    module = make_sharded_eval_step(diff, pose, BETAS, (0, 12), mesh, test_times=1)
    p1_m, p2_m, pred_m = module(state, pose_params, batch, key)

    kw = dict(num_layers=2, num_heads=4, hid_dim=32, block_b=4, interpret=True)
    fused = make_sharded_eval_step(
        diff, pose, BETAS, (0, 12), mesh, test_times=1,
        denoise_override=make_pallas_denoiser_fn(BASIS, **kw),
        lift_override=make_pallas_lifter_fn(BASIS, **kw),
    )
    p1_p, p2_p, pred_p = fused(state, pose_params, batch, key)

    np.testing.assert_allclose(np.asarray(pred_p), np.asarray(pred_m), atol=5e-5)
    np.testing.assert_allclose(np.asarray(p1_p), np.asarray(p1_m), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p2_p), np.asarray(p2_m), atol=1e-4)
