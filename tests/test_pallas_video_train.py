"""Fused Pallas video TRAIN path vs the flax module / pure-JAX twin
(interpret mode).  See ``ops/pallas_video_train.py``; family per SURVEY
§7.9 (spatial-block math ≡ ``models/video.py:179-190``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.ops import train_ref as tr
from diffpose_tpu.ops.pallas_video_train import (
    make_pallas_video_train_fn,
    make_pallas_video_train_step,
    video_dropout_rates,
)

B, F, L, HEADS, HID = 2, 4, 2, 4, 96


def _make(frames=F, dropout_rate=0.1):
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = SpatioTemporalDiff(
        basis=basis, frames=frames, hid_dim=HID, num_layers=L,
        num_heads=HEADS, dropout_rate=dropout_rate)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, frames, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(B,)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    return basis, model, params, x, t


def _masks(model, rows, rates, seed=5):
    return tr.make_dropout_masks(
        jax.random.PRNGKey(seed), num_layers=model.num_layers, n_pts=17,
        batch=rows, num_heads=model.num_heads, hid_dim=model.hid_dim,
        rates=rates)


def _twin_stack(basis, model, rates):
    """Pure-JAX twin of the 1-layer kernel stack (oracle isolation)."""
    basis_j = jnp.asarray(basis, jnp.float32)

    def stack(w, h0, tp, masks):
        return tr.layers_forward(
            w, h0, tp, masks, basis=basis_j, num_layers=1,
            num_heads=model.num_heads, hid_dim=model.hid_dim, rates=rates)

    return stack


@pytest.mark.parametrize("frames", [F, 5])  # 5 → B·F=10: exercises padding
def test_forward_matches_module_no_dropout(frames):
    """With every rate zero the train forward IS the eval forward — the
    assembled fused path (incl. row padding) must match ``model.apply``."""
    basis, model, params, x, t = _make(frames=frames, dropout_rate=0.0)
    rates = (0.0, 0.0, 0.0)
    fn = make_pallas_video_train_fn(
        model, block_b_fwd=8, block_b_bwd=8, precision=None,
        interpret=True, rates=rates)
    masks = _masks(model, B * frames, rates)
    got = fn(params, x, t, masks, jax.random.PRNGKey(7))
    want = model.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_grads_match_twin():
    """Kernel-pair grads vs jax.grad of the pure-JAX twin — same masks,
    same temporal key, video rates (sublayer 0.1 ≠ the frame 0.25)."""
    basis, model, params, x, t = _make()
    rates = video_dropout_rates(model)
    assert rates[1] == 0.1  # the video-specific sublayer rate
    masks = _masks(model, B * F, rates)
    tkey = jax.random.PRNGKey(11)
    e = jnp.asarray(np.random.default_rng(1).normal(size=x.shape), jnp.float32)

    fn_k = make_pallas_video_train_fn(
        model, block_b_fwd=8, block_b_bwd=8, precision=None,
        interpret=True, rates=rates)
    fn_t = make_pallas_video_train_fn(
        model, rates=rates, stack_override=_twin_stack(basis, model, rates))

    def loss(fn):
        return lambda p: jnp.mean(jnp.sum(
            (e - fn(p, x, t, masks, tkey)) ** 2, axis=(1, 2, 3)))

    g_ref = jax.grad(loss(fn_t))(params)
    g_ker = jax.grad(loss(fn_k))(params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(g_ker)
    for (pr, vr), (_, vk) in zip(flat_r, flat_k):
        absd = float(jnp.abs(vr - vk).max())
        if absd < 1e-5:  # k.bias grads are mathematically 0
            continue
        rel = absd / (float(jnp.abs(vr).max()) + 1e-8)
        assert rel < 1e-3, (jax.tree_util.keystr(pr), rel)


def test_fused_video_train_step_runs():
    import optax

    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.models import ema_register
    from diffpose_tpu.train.optim import make_optimizer
    from diffpose_tpu.train.state import TrainState

    basis, model, params, x, t = _make()
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    opt = make_optimizer(lr=2e-4, steps_per_epoch=1)
    state = TrainState.create(params, opt.init(params),
                              ema_params=ema_register(params))
    step = make_pallas_video_train_step(
        model, opt, betas, block_b_fwd=8, block_b_bwd=8,
        precision=None, interpret=True)
    rng = np.random.default_rng(3)
    batch = {
        "poses_3d": jnp.asarray(
            rng.normal(size=(B, F, 17, 3)).astype(np.float32)),
        "poses_2d_gmm": jnp.asarray(
            np.abs(rng.normal(size=(B, F, 17, 5, 5))).astype(np.float32) + 0.1),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(9))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert int(new_state.step) == 1
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # EMA tracked the update
    assert max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.ema_params, new_state.ema_params))) > 0
