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
