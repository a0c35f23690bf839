"""Fused Pallas train-step kernels vs jax.grad of the pure-JAX oracle
(interpret mode).  See ``ops/pallas_train.py``; reference semantics
``runners/diffpose_frame.py:203-236``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff
from diffpose_tpu.ops import train_ref as tr
from diffpose_tpu.ops.pallas_train import (
    build_pallas_train_stack,
    fused_train_forward,
    kernel_masks,
    make_pallas_train_step,
)

B = 64


@pytest.fixture(scope="module")
def setup():
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = GCNDiff(basis=basis)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(B,)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:2], t[:2])["params"]
    masks = tr.make_dropout_masks(
        jax.random.PRNGKey(5), num_layers=5, n_pts=17, batch=B,
        num_heads=4, hid_dim=96)
    stack_fn = build_pallas_train_stack(
        basis, block_b_fwd=32, block_b_bwd=32, group=17,
        precision=None, interpret=True)
    return basis, params, x, t, masks, stack_fn


def test_forward_matches_oracle(setup):
    basis, params, x, t, masks, stack_fn = setup
    want = tr.train_forward(params, basis, x, t, masks)
    got = fused_train_forward(params, basis, x, t, masks, stack_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_grads_match_oracle(setup):
    basis, params, x, t, masks, stack_fn = setup
    e = jnp.asarray(np.random.default_rng(1).normal(size=(B, 17, 5)),
                    jnp.float32)

    def loss_ref(p):
        out = tr.train_forward(p, basis, x, t, masks)
        return jnp.mean(jnp.sum((e - out) ** 2, axis=(1, 2)))

    def loss_ker(p):
        out = fused_train_forward(p, basis, x, t, masks, stack_fn)
        return jnp.mean(jnp.sum((e - out) ** 2, axis=(1, 2)))

    g_ref = jax.grad(loss_ref)(params)
    g_ker = jax.grad(loss_ker)(params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(g_ker)
    for (pr, vr), (_, vk) in zip(flat_r, flat_k):
        absd = float(jnp.abs(vr - vk).max())
        # k.bias grads are mathematically 0 (softmax is invariant to a
        # per-query constant score shift) — combined abs+rel criterion
        if absd < 1e-5:
            continue
        rel = absd / (float(jnp.abs(vr).max()) + 1e-8)
        assert rel < 1e-3, (jax.tree_util.keystr(pr), rel)


def test_kernel_mask_expansion(setup):
    basis, params, x, t, masks, stack_fn = setup
    km = kernel_masks(masks, dk=24)
    assert km["probs_exp"].shape == (5, 17, 17, B, 96)
    # head h of query/key pair expands to dk consecutive dims, key-major
    m = np.asarray(masks.probs)          # [L, Nq, Nk, B, heads]
    me = np.asarray(km["probs_exp"])     # [L, Nk, Nq, B, H]
    assert (me[2, 3, 1, 5, 24:48] == m[2, 1, 3, 5, 1]).all()
    assert me.dtype == jnp.bfloat16


def test_fused_train_step_runs(setup):
    basis, params, x, t, masks, stack_fn = setup
    import optax

    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.models import ema_register
    from diffpose_tpu.train.optim import make_optimizer
    from diffpose_tpu.train.state import TrainState

    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    opt = make_optimizer(lr=2e-4, steps_per_epoch=1)
    state = TrainState.create(params, opt.init(params),
                              ema_params=ema_register(params))
    step = make_pallas_train_step(
        opt, betas, basis, block_b_fwd=32, block_b_bwd=32,
        precision=None, interpret=True)
    rng = np.random.default_rng(3)
    batch = {
        "poses_3d": jnp.asarray(rng.normal(size=(B, 17, 3)).astype(np.float32)),
        "poses_2d_gmm": jnp.asarray(
            np.abs(rng.normal(size=(B, 17, 5, 5))).astype(np.float32) + 0.1),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(9))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(new_state.step) == 1
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_sharded_fused_step_matches_structure(setup):
    """Fused step composes with the data mesh: per-shard kernels, grads
    pmean'd over ICI — loss finite, params replicated-consistent."""
    basis, params, x, t, masks, stack_fn = setup
    import numpy as np2

    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.models import ema_register
    from diffpose_tpu.parallel import make_mesh
    from diffpose_tpu.parallel.sharding import make_sharded_train_step
    from diffpose_tpu.train.optim import make_optimizer
    from diffpose_tpu.train.state import TrainState

    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    opt = make_optimizer(lr=2e-4, steps_per_epoch=1)
    state = TrainState.create(params, opt.init(params),
                              ema_params=ema_register(params))
    base = make_pallas_train_step(
        opt, betas, basis, block_b_fwd=8, block_b_bwd=8, group=4,
        precision=None, interpret=True, axis_name="data")
    mesh = make_mesh()
    step = make_sharded_train_step(
        None, opt, betas, mesh, base_step=base, donate=False)
    rng = np2.random.default_rng(3)
    n = 64  # 8 per shard
    batch = {
        "poses_3d": jnp.asarray(rng.normal(size=(n, 17, 3)).astype(np2.float32)),
        "poses_2d_gmm": jnp.asarray(
            np2.abs(rng.normal(size=(n, 17, 5, 5))).astype(np2.float32) + 0.1),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(9))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(new_state.step) == 1
