"""Whole-network fused Pallas denoiser vs GCNDiff (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff
from diffpose_tpu.ops.pallas_denoiser import make_pallas_denoiser

BASIS = cheb_basis_from_edges(17, H36M_EDGES)


def test_pallas_denoiser_matches_module(rng):
    model = GCNDiff(basis=BASIS)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )["params"]

    x = jnp.asarray(rng.normal(size=(16, 17, 5)).astype(np.float32))
    t = jnp.asarray(np.linspace(0, 50, 16).astype(np.float32))

    want = model.apply({"params": params}, x, t, jnp.ones((1, 1, 17)))
    fn = make_pallas_denoiser(params, BASIS, block_b=8, interpret=True)
    got = fn(x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_pallas_denoiser_grouped_attention(rng):
    """Query-grouped attention (group>1, incl. non-divisor) is exact."""
    model = GCNDiff(basis=BASIS)
    params = model.init(
        {"params": jax.random.PRNGKey(2)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )["params"]
    x = jnp.asarray(rng.normal(size=(8, 17, 5)).astype(np.float32))
    t = jnp.asarray(np.linspace(0, 50, 8).astype(np.float32))
    want = model.apply({"params": params}, x, t, jnp.ones((1, 1, 17)))
    for group in (4, 17):
        fn = make_pallas_denoiser(
            params, BASIS, block_b=8, interpret=True, group=group)
        np.testing.assert_allclose(
            np.asarray(fn(x, t)), np.asarray(want), atol=5e-5)


def test_pallas_denoiser_small_config(rng):
    model = GCNDiff(basis=BASIS, hid_dim=32, num_layers=2, num_heads=4)
    params = model.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )["params"]
    x = jnp.asarray(rng.normal(size=(8, 17, 5)).astype(np.float32))
    t = jnp.zeros((8,))
    want = model.apply({"params": params}, x, t)
    fn = make_pallas_denoiser(
        params, BASIS, num_layers=2, num_heads=4, hid_dim=32, block_b=8, interpret=True
    )
    got = fn(x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_pallas_denoiser_bf16_fast_path(rng):
    """precision="bf16": bf16-resident activations, f32 accumulation.

    Non-parity speed tier — tolerance is bf16-grade (~1e-2 relative on
    unit-scale activations), far looser than the 5e-5 parity paths above,
    but the result must still track the f32 module forward closely.
    """
    model = GCNDiff(basis=BASIS)
    params = model.init(
        {"params": jax.random.PRNGKey(3)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )["params"]
    x = jnp.asarray(rng.normal(size=(16, 17, 5)).astype(np.float32))
    t = jnp.asarray(np.linspace(0, 50, 16).astype(np.float32))
    want = np.asarray(model.apply({"params": params}, x, t, jnp.ones((1, 1, 17))))
    fn = make_pallas_denoiser(params, BASIS, block_b=8, interpret=True,
                              precision="bf16")
    got = np.asarray(fn(x, t))
    assert got.dtype == np.float32
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    assert err < 3e-2, f"relative error {err:.3g} out of bf16 grade"
