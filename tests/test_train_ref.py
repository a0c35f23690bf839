"""Oracle checks for the pure-JAX explicit-mask training forward
(the ground truth the fused Pallas train kernels are verified against)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff
from diffpose_tpu.ops import train_ref as tr

L, N, B, H, HD = 5, 17, 6, 4, 96


@pytest.fixture(scope="module")
def setup():
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = GCNDiff(basis=basis)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(B,)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    return basis, model, params, x, t


def _identity_masks():
    """Masks filled with keep_prob: dropout scaling cancels exactly."""
    return tr.DropoutMasks(
        probs=jnp.full((L, N, N, B, H), 1 - tr.RATE_ATTN_PROBS),
        attn_out=jnp.full((L, N, B, HD), 1 - tr.RATE_SUBLAYER),
        gnet_out=jnp.full((L, N, B, HD), 1 - tr.RATE_SUBLAYER),
        cheb1=jnp.full((L, N, B, HD), 1 - tr.RATE_CHEB),
        cheb2=jnp.full((L, N, B, HD), 1 - tr.RATE_CHEB),
    )


def test_matches_module_with_identity_masks(setup):
    basis, model, params, x, t = setup
    want = model.apply({"params": params}, x, t)  # eval mode == no dropout
    got = tr.train_forward(params, basis, x, t, _identity_masks())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-6)


def test_stochastic_masks_finite_and_unbiased(setup):
    basis, model, params, x, t = setup
    outs = []
    for s in range(16):
        m = tr.make_dropout_masks(jax.random.PRNGKey(s), num_layers=L,
                                  n_pts=N, batch=B, num_heads=H, hid_dim=HD)
        out = tr.train_forward(params, basis, x, t, m)
        assert bool(jnp.isfinite(out).all())
        outs.append(out)
    # dropout is mean-preserving per site; the network is nonlinear so the
    # seed-average only loosely tracks the deterministic forward — sanity
    # band, not an exactness claim
    avg = jnp.stack(outs).mean(0)
    det = model.apply({"params": params}, x, t)
    corr = jnp.corrcoef(avg.ravel(), det.ravel())[0, 1]
    assert corr > 0.5


def test_mask_semantics_match_flax_dropout(setup):
    """flax nn.Dropout == where(bernoulli(keep), x/keep, 0): every output
    element is exactly 0 or x/keep, zeros appear at ~rate.  (flax folds the
    rng internally, so key-for-key equality is not testable; the SEMANTICS
    — scale and distribution — are.)"""
    from flax import linen as nn

    x = jnp.asarray(np.random.default_rng(1).normal(size=(64, 17, 96)) + 5.0,
                    jnp.float32)  # +5 keeps x away from 0
    rate = 0.25
    out = nn.Dropout(rate, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(7)})
    zeros = np.asarray(out == 0)
    scaled = np.asarray(jnp.abs(out - x / (1 - rate)) < 1e-5)
    assert bool((zeros | scaled).all())
    assert abs(zeros.mean() - rate) < 0.01


def test_grads_finite(setup):
    basis, model, params, x, t = setup
    m = tr.make_dropout_masks(jax.random.PRNGKey(3), num_layers=L, n_pts=N,
                              batch=B, num_heads=H, hid_dim=HD)

    def loss(p):
        return jnp.sum(tr.train_forward(p, basis, x, t, m) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
