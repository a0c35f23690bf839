"""Spatio-temporal (video) denoiser + context parallelism tests."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.data.video import make_video_windows, synthetic_video_dataset
from diffpose_tpu.diffusion import ddim_sample, get_beta_schedule, q_sample
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.parallel import make_mesh
from diffpose_tpu.parallel.context import make_cp_video_forward

BASIS = cheb_basis_from_edges(17, H36M_EDGES)
FRAMES = 8


def _model(cp_axis=None):
    return SpatioTemporalDiff(
        basis=BASIS, frames=FRAMES, hid_dim=32, num_layers=2, num_heads=4,
        cp_axis=cp_axis,
    )


def test_video_dataset_windows():
    ds = synthetic_video_dataset(num_windows=4, frames=FRAMES, seed=0)
    assert ds.poses_3d.shape == (4, FRAMES, 17, 3)
    assert ds.poses_2d_gmm.shape[:2] == (4, FRAMES)
    np.testing.assert_allclose(ds.poses_3d[:, :, 0], 0.0, atol=1e-7)

    # Windows never cross sequence boundaries.
    seqs_3d = [np.zeros((10, 17, 3), np.float32), np.ones((9, 17, 3), np.float32)]
    seqs_2d = [np.zeros((10, 17, 2, 5), np.float32), np.zeros((9, 17, 2, 5), np.float32)]
    acts = [["A"] * 10, ["B"] * 9]
    vd = make_video_windows(seqs_3d, seqs_2d, acts, frames=8, stride=8)
    assert len(vd) == 2  # one window per sequence (10//8=1, 9//8=1)


def test_video_forward_shapes_and_train_mode():
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, FRAMES, 17, 5))
    t = jnp.zeros((2,))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (2, FRAMES, 17, 5)
    out_t = model.apply(
        variables, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert out_t.shape == out.shape


def test_context_parallel_forward_matches_single_device():
    mesh = make_mesh((4,), ("context",), devices=jax.devices()[:4])
    single = _model(cp_axis=None)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, FRAMES, 17, 5))
    t = jnp.asarray([3.0, 11.0])
    params = single.init({"params": jax.random.PRNGKey(4)}, x, t)["params"]

    want = single.apply({"params": params}, x, t)

    cp = _model(cp_axis="context")
    fn = make_cp_video_forward(cp, mesh)
    got = fn(params, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_video_ddim_sampling_runs():
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(5), (2, FRAMES, 17, 5))
    t = jnp.zeros((2,))
    variables = model.init({"params": jax.random.PRNGKey(6)}, x, t)

    def denoise(z, tv):
        return model.apply(variables, z, tv)

    out = ddim_sample(denoise, x, (0, 6), betas)
    assert out.shape == x.shape

    # q_sample is rank-agnostic (video tensors).
    noise = jax.random.normal(jax.random.PRNGKey(7), x.shape)
    xt = q_sample(x, jnp.asarray([0, 50]), noise, betas)
    assert xt.shape == x.shape


def test_video_train_step_loop_reduces_loss():
    import jax
    from diffpose_tpu.models import ema_register
    from diffpose_tpu.train import TrainState, make_optimizer
    from diffpose_tpu.train.video_steps import make_video_train_step

    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    ds = synthetic_video_dataset(num_windows=8, frames=FRAMES, seed=2)
    model = _model()
    x0 = jnp.zeros((8, FRAMES, 17, 5))
    params = model.init({"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((8,)))["params"]
    opt = make_optimizer(lr=1e-3, steps_per_epoch=10)
    state = TrainState.create(params, opt.init(params), ema_params=ema_register(params))

    batch = {
        "poses_3d": jnp.asarray(ds.poses_3d),
        "poses_2d_gmm": jnp.asarray(ds.poses_2d_gmm),
    }
    step_fn = jax.jit(make_video_train_step(model, opt, betas))
    losses = []
    for i in range(12):
        state, m = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert int(state.step) == 12


def test_video_eval_step():
    import jax
    from diffpose_tpu.train import TrainState
    from diffpose_tpu.train.video_steps import make_video_eval_step

    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    ds = synthetic_video_dataset(num_windows=4, frames=FRAMES, seed=5)
    model = _model()
    x0 = jnp.zeros((4, FRAMES, 17, 5))
    params = model.init({"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((4,)))["params"]
    state = TrainState.create(params, opt_state=())
    batch = {
        "poses_3d": jnp.asarray(ds.poses_3d),
        "poses_2d_gmm": jnp.asarray(ds.poses_2d_gmm),
        "seeds": jnp.arange(4, dtype=jnp.int32),
    }
    step = jax.jit(make_video_eval_step(model, betas, (0, 6), test_times=2))
    p1, p2, pred = step(state, batch, jax.random.PRNGKey(1))
    assert p1.shape == (4, FRAMES) and p2.shape == (4, FRAMES)
    assert pred.shape == (4, FRAMES, 17, 3)
    assert np.isfinite(np.asarray(p1)).all() and np.isfinite(np.asarray(p2)).all()


def test_video_training_step_gradients():
    import optax

    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    ds = synthetic_video_dataset(num_windows=4, frames=FRAMES, seed=1)
    model = _model()
    x0 = jnp.asarray(
        np.concatenate(
            [ds.poses_2d_gmm[:, :, :, 0, 1:3], ds.poses_3d], axis=-1
        )
    )  # crude uvxyz for the smoke test
    t = jnp.asarray([1.0, 20.0, 35.0, 50.0])
    variables = model.init({"params": jax.random.PRNGKey(8)}, x0, t)

    noise = jax.random.normal(jax.random.PRNGKey(9), x0.shape)
    xt = q_sample(x0, t.astype(jnp.int32), noise, betas)

    def loss_fn(params):
        eps = model.apply(
            {"params": params}, xt, t, train=True,
            rngs={"dropout": jax.random.PRNGKey(10)},
        )
        return jnp.mean(jnp.sum((noise - eps) ** 2, axis=(1, 2, 3)))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert float(optax.global_norm(grads)) > 0
