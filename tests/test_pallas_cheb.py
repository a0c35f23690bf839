"""Fused Pallas ChebConv vs the reference-parity Flax layer (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.layers import ChebGraphConv
from diffpose_tpu.ops.pallas_cheb import fused_cheb_conv

BASIS = cheb_basis_from_edges(17, H36M_EDGES)


def test_fused_cheb_matches_layer(rng):
    layer = ChebGraphConv(96, BASIS)
    x = jnp.asarray(rng.normal(size=(64, 17, 5)).astype(np.float32))
    params = layer.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    want = layer.apply({"params": params}, x)
    got = fused_cheb_conv(
        x, jnp.asarray(params["w"]), jnp.asarray(params["b"]), BASIS,
        block_b=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_cheb_square_features(rng):
    layer = ChebGraphConv(96, BASIS)
    x = jnp.asarray(rng.normal(size=(32, 17, 96)).astype(np.float32))
    params = layer.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    want = layer.apply({"params": params}, x)
    got = fused_cheb_conv(
        x, jnp.asarray(params["w"]), jnp.asarray(params["b"]), BASIS,
        block_b=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
