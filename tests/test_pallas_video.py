"""Fused Pallas spatial stack for the video denoiser vs the flax module
(interpret mode).  See ``ops/pallas_video.py``; family per SURVEY §7.9."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.ops.pallas_video import make_pallas_video_denoiser_fn

B, F, L, HEADS, HID = 2, 4, 2, 4, 96


@pytest.fixture(scope="module")
def setup():
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = SpatioTemporalDiff(
        basis=basis, frames=F, hid_dim=HID, num_layers=L, num_heads=HEADS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, F, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(B,)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    return basis, model, params, x, t


def test_fused_video_matches_module(setup):
    basis, model, params, x, t = setup
    fn = make_pallas_video_denoiser_fn(
        model, block_b=8, precision=None, interpret=True)
    got = fn(params, x, t)
    want = model.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_video_weights_are_runtime_operands(setup):
    """Same compiled program serves fresh weights — no re-trace."""
    basis, model, params, x, t = setup
    fn = make_pallas_video_denoiser_fn(
        model, block_b=8, precision=None, interpret=True)
    traces = 0

    def counted(p, x, t):
        nonlocal traces
        traces += 1
        return fn(p, x, t)

    jfn = jax.jit(counted)
    out1 = jfn(params, x, t)
    p2 = jax.tree_util.tree_map(lambda v: v * 1.01, params)
    out2 = jfn(p2, x, t)
    assert traces == 1
    assert float(jnp.abs(out1 - out2).max()) > 0  # weights actually matter


def test_fused_video_chunked_long_window(setup):
    """Long-window path: the temporal attention switches to the chunked
    (query-chunked) implementation above the threshold — parity holds."""
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    frames = 8
    model = SpatioTemporalDiff(
        basis=basis, frames=frames, hid_dim=HID, num_layers=1,
        num_heads=HEADS, attention_chunk=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, frames, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(1,)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(1)}, x, t)["params"]
    fn = make_pallas_video_denoiser_fn(
        model, block_b=8, precision=None, interpret=True)
    got = fn(params, x, t)
    want = model.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
