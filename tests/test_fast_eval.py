import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff
from diffpose_tpu.ops import make_fast_denoiser, make_fast_lifter

BASIS = cheb_basis_from_edges(17, H36M_EDGES)


def test_fast_denoiser_matches_module_forward(rng):
    model = GCNDiff(basis=BASIS)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )["params"]

    x = jnp.asarray(rng.normal(size=(8, 17, 5)).astype(np.float32))
    t = jnp.asarray(np.array([0, 6, 12, 24, 30, 40, 50, 3], np.float32))

    want = model.apply({"params": params}, x, t, jnp.ones((1, 1, 17)))
    fast = make_fast_denoiser(params, BASIS)
    got = fast(x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fast_denoiser_small_config(rng):
    model = GCNDiff(basis=BASIS, hid_dim=32, num_layers=2, num_heads=4)
    params = model.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )["params"]
    x = jnp.asarray(rng.normal(size=(4, 17, 5)).astype(np.float32))
    t = jnp.zeros((4,))
    want = model.apply({"params": params}, x, t)
    fast = make_fast_denoiser(params, BASIS, num_layers=2, num_heads=4, hid_dim=32)
    got = fast(x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fast_lifter_matches_module_forward(rng):
    from diffpose_tpu.models import GCNPose

    model = GCNPose(basis=BASIS)
    params = model.init({"params": jax.random.PRNGKey(3)}, jnp.zeros((2, 17, 2)))["params"]
    x = jnp.asarray(rng.normal(size=(6, 17, 2)).astype(np.float32))
    want = model.apply({"params": params}, x, jnp.ones((1, 1, 17)))
    fast = make_fast_lifter(params, BASIS)
    got = fast(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fast_denoiser_bf16_close(rng):
    model = GCNDiff(basis=BASIS, hid_dim=32, num_layers=2, num_heads=4)
    params = model.init(
        {"params": jax.random.PRNGKey(2)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )["params"]
    x = jnp.asarray(rng.normal(size=(4, 17, 5)).astype(np.float32))
    t = jnp.zeros((4,))
    want = np.asarray(model.apply({"params": params}, x, t))
    fast = make_fast_denoiser(
        params, BASIS, num_layers=2, num_heads=4, hid_dim=32, dtype=jnp.bfloat16
    )
    got = np.asarray(fast(x, t))
    assert got.dtype == np.float32
    # bf16 has ~3 decimal digits; the 2-layer residual net stays close.
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.1)
