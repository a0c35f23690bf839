"""Golden-value parity of the Flax models against the reference torch oracle.

Builds the reference modules (imported read-only, CPU) with random torch
init, converts their state dicts with
:mod:`diffpose_tpu.models.convert`, and asserts the forwards agree to
float32 tolerance.  This is the strongest check that our from-scratch math
matches the reference semantics exactly.
"""

import numpy as np
import pytest
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose
from diffpose_tpu.models.convert import torch_state_to_params
from tests.oracle import load_reference_module


def _ref_cfg(coords=(5, 5)):
    model = SimpleNamespace(
        hid_dim=96, emd_dim=96, coords_dim=list(coords), num_layer=5,
        n_head=4, dropout=0.25, n_pts=17,
    )
    return SimpleNamespace(model=model)


@pytest.fixture(scope="module")
def torch_mod():
    import torch

    torch.manual_seed(19960903)
    return torch


@pytest.fixture(scope="module")
def ref_adj(torch_mod):
    chebconv = load_reference_module("models.ChebConv")
    edges = torch_mod.tensor(list(H36M_EDGES), dtype=torch_mod.long)
    return chebconv.adj_mx_from_edges(17, edges, sparse=False)


@pytest.fixture(scope="module")
def basis():
    return cheb_basis_from_edges(17, H36M_EDGES, order=2)


def _mask(torch_mod, batch=1):
    return torch_mod.ones(batch, 1, 17, dtype=torch_mod.bool)


def test_chebconv_layer_parity(torch_mod, ref_adj, basis, rng):
    chebconv = load_reference_module("models.ChebConv")
    ref = chebconv.ChebConv(5, 96, K=2)
    x = rng.normal(size=(3, 17, 5)).astype(np.float32)
    with torch_mod.no_grad():
        want = ref(torch_mod.from_numpy(x), ref_adj).numpy()

    from diffpose_tpu.models.layers import ChebGraphConv

    params = {
        "w": ref.weight.detach().numpy()[:, 0],
        "b": ref.bias.detach().numpy().reshape(-1),
    }
    got = ChebGraphConv(96, basis).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_layernorm_std_semantics(torch_mod, rng):
    graformer = load_reference_module("models.GraFormer")
    ref = graformer.LayerNorm(96)
    with torch_mod.no_grad():
        ref.a_2.uniform_(0.5, 1.5)
        ref.b_2.uniform_(-0.5, 0.5)
    x = rng.normal(size=(2, 17, 96)).astype(np.float32)
    with torch_mod.no_grad():
        want = ref(torch_mod.from_numpy(x)).numpy()

    from diffpose_tpu.models.layers import TorchStyleLayerNorm

    params = {"scale": ref.a_2.detach().numpy(), "bias": ref.b_2.detach().numpy()}
    got = TorchStyleLayerNorm().apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gcndiff_forward_parity(torch_mod, ref_adj, basis, rng):
    gcndiff = load_reference_module("models.gcndiff")
    ref = gcndiff.GCNdiff(ref_adj, _ref_cfg((5, 5)))
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_state_to_params(sd, num_layers=5, with_temb=True)

    x = rng.normal(size=(4, 17, 5)).astype(np.float32)
    t = np.array([0.0, 12.0, 24.0, 50.0], dtype=np.float32)
    with torch_mod.no_grad():
        want = ref(
            torch_mod.from_numpy(x), _mask(torch_mod), torch_mod.from_numpy(t), 0
        ).numpy()

    model = GCNDiff(basis=basis)
    got = model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.ones((1, 1, 17))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def test_gcnpose_forward_parity(torch_mod, ref_adj, basis, rng):
    gcnpose = load_reference_module("models.gcnpose")
    ref = gcnpose.GCNpose(ref_adj, _ref_cfg((2, 3)))
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_state_to_params(sd, num_layers=5, with_temb=False)

    x = rng.normal(size=(4, 17, 2)).astype(np.float32)
    with torch_mod.no_grad():
        want = ref(torch_mod.from_numpy(x), _mask(torch_mod)).numpy()

    model = GCNPose(basis=basis)
    got = model.apply({"params": params}, jnp.asarray(x), jnp.ones((1, 1, 17)))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


def test_gcndiff_init_and_train_mode_runs(basis):
    model = GCNDiff(basis=basis)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 17, 5))
    t = jnp.zeros((2,))
    variables = model.init({"params": key}, x, t)
    out = model.apply(
        variables, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out.shape == (2, 17, 5)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables))
    assert 1_000_000 < n_params < 2_000_000  # same order as the reference (~1.4M)
