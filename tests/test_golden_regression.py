"""Golden-value regression: fixed-seed forwards vs committed outputs.

Protects the model semantics against accidental drift during refactors
(kernel work, layout changes) without requiring the reference torch
oracle.  Regenerate only deliberately (see tests/golden/)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "model_forward_golden.npz")


def test_fixed_seed_forwards_match_golden():
    data = np.load(GOLDEN)
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    diff = GCNDiff(basis=basis)
    pose = GCNPose(basis=basis)
    pd = diff.init({"params": jax.random.PRNGKey(42)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    pp = pose.init({"params": jax.random.PRNGKey(43)}, jnp.zeros((2, 17, 2)))["params"]

    out_d = diff.apply({"params": pd}, jnp.asarray(data["x5"]), jnp.asarray(data["t"]))
    out_p = pose.apply({"params": pp}, jnp.asarray(data["x2"]))
    np.testing.assert_allclose(np.asarray(out_d), data["out_diff"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p), data["out_pose"], atol=1e-5)
