"""Fused Pallas IGCN fixed-point solve vs IGCN.apply (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.ops.pallas_igcn import make_pallas_igcn

BASIS = cheb_basis_from_edges(17, H36M_EDGES)


def _build(solver, **kw):
    model = IGCN(
        basis=BASIS, hid_dim=32, num_layers=2, num_heads=4,
        solver=solver, max_iterations=5, min_iterations=2, tolerance=0.05,
        **kw,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )
    return model, variables


@pytest.mark.parametrize("solver", ["anderson", "damped"])
def test_pallas_igcn_matches_module(rng, solver):
    model, variables = _build(solver)
    x = jnp.asarray(rng.normal(size=(8, 17, 5)).astype(np.float32))
    t = jnp.full((8,), 12.0)

    want, want_aux = model.apply(
        variables, x, t, train=False, differentiable=False)
    fn = make_pallas_igcn(
        model, variables["params"], variables["batch_stats"],
        block_b=8, interpret=True, precision=None)
    got, aux = fn(x, t)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    assert int(aux["iterations"]) == int(want_aux["iterations"])
    np.testing.assert_allclose(
        np.asarray(aux["fixed_point"]), np.asarray(want_aux["fixed_point"]),
        atol=1e-4)


def test_pallas_igcn_warm_start_blend(rng):
    model, variables = _build("anderson")
    x = jnp.asarray(rng.normal(size=(8, 17, 5)).astype(np.float32))
    t = jnp.full((8,), 12.0)
    z0 = jnp.asarray(rng.normal(size=(8, 17, 32)).astype(np.float32))
    w = jnp.asarray(0.3, jnp.float32)

    want, _ = model.apply(
        variables, x, t, train=False, differentiable=False,
        z0=z0, z0_weight=w)
    fn = make_pallas_igcn(
        model, variables["params"], variables["batch_stats"],
        block_b=8, interpret=True, precision=None)
    got, _ = fn(x, t, z0=z0, z0_weight=w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
