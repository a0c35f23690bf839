import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.igcn import IGCN

BASIS = cheb_basis_from_edges(17, H36M_EDGES)


def _model(**kw):
    defaults = dict(basis=BASIS, hid_dim=32, num_layers=2, num_heads=4,
                    max_iterations=12, min_iterations=4, tolerance=1e-2)
    defaults.update(kw)
    return IGCN(**defaults)


def _init(model, key=0):
    return model.init(
        {"params": jax.random.PRNGKey(key)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )


def test_forward_shapes_and_aux():
    model = _model()
    variables = _init(model)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 17, 5))
    t = jnp.zeros((4,))
    (out, aux) = model.apply(variables, x, t)
    assert out.shape == (4, 17, 5)
    assert int(aux["iterations"]) >= 4
    assert np.isfinite(float(aux["residual"]))
    assert aux["fixed_point"].shape == (4, 17, 32)


def test_anderson_converges_toward_fixed_point():
    model = _model(max_iterations=20, tolerance=1e-3, min_iterations=2)
    variables = _init(model)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 17, 5))
    t = jnp.zeros((4,))
    out, aux = model.apply(variables, x, t)
    # Residual after convergence (or max iters) should be small-ish and the
    # solver must have iterated more than the minimum when tolerance is tight.
    assert float(aux["residual"]) < 0.5


def test_anderson_beats_damped_iteration_count():
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 17, 5))
    t = jnp.zeros((4,))
    anderson = _model(solver="anderson", max_iterations=30, min_iterations=2, tolerance=5e-3)
    damped = _model(solver="damped", max_iterations=30, min_iterations=2, tolerance=5e-3)
    va = _init(anderson)
    # Same params for both (identical tree structure).
    _, aux_a = anderson.apply(va, x, t)
    _, aux_d = damped.apply(va, x, t)
    assert int(aux_a["iterations"]) <= int(aux_d["iterations"])


def test_scan_and_while_paths_agree():
    model = _model()
    variables = _init(model)
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 17, 5))
    t = jnp.full((3,), 7.0)
    out_w, aux_w = model.apply(variables, x, t, differentiable=False)
    out_s, aux_s = model.apply(variables, x, t, differentiable=True)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_s), atol=1e-5)
    assert int(aux_w["iterations"]) == int(aux_s["iterations"])


def test_training_gradients_flow_and_bn_stats_update():
    model = _model(max_iterations=6, min_iterations=6)
    variables = _init(model)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 17, 5))
    t = jnp.zeros((4,))

    def loss_fn(params):
        (out, _), updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, t, train=True, rngs={"dropout": jax.random.PRNGKey(6)},
            mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2), updates

    (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = np.sqrt(sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads)))
    assert gnorm > 0
    # Running stats moved away from init.
    assert not np.allclose(np.asarray(updates["batch_stats"]["bn_mean"]), 0.0)


def test_warm_start_reduces_iterations():
    model = _model(max_iterations=30, min_iterations=1, tolerance=1e-2)
    variables = _init(model)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 17, 5))
    t = jnp.zeros((4,))
    out1, aux1 = model.apply(variables, x, t)
    out2, aux2 = model.apply(variables, x, t, z0=aux1["fixed_point"])
    assert int(aux2["iterations"]) <= int(aux1["iterations"])
