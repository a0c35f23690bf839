"""Whole-network video kernel ≡ the SpatioTemporalDiff module (eval mode).

The fused kernel (``ops/pallas_video_full.py``) runs input conv, pos
embedding, all spatial AND temporal blocks, and the output conv in one
pallas_call; interpret mode checks it against ``model.apply`` exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.ops.pallas_video_full import make_pallas_video_full_fn


def _setup(frames=9, hid=32, layers=2):
    basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
    model = SpatioTemporalDiff(
        basis=basis, frames=frames, hid_dim=hid, num_layers=layers,
        num_heads=4)
    b = 3
    x = jax.random.normal(jax.random.PRNGKey(0), (b, frames, 17, 5))
    t = jnp.asarray([3.0, 17.0, 42.0])
    params = model.init({"params": jax.random.PRNGKey(1)}, x, t)["params"]
    return model, params, x, t


def test_full_kernel_matches_module():
    model, params, x, t = _setup()
    ref = model.apply({"params": params}, x, t)

    fn = make_pallas_video_full_fn(
        model, block_b=1, tgroup=3, precision=None, interpret=True)
    out = fn(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_full_kernel_pads_partial_blocks():
    model, params, x, t = _setup()
    ref = model.apply({"params": params}, x, t)

    # b=3 with block_b=2 exercises the zero-padded final block
    fn = make_pallas_video_full_fn(
        model, block_b=2, tgroup=9, precision=None, interpret=True)
    out = fn(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_full_kernel_monolith_matches_module():
    """layers_per_call = num_layers: the whole layer stack VMEM-resident
    in one pallas_call (the compile-pathology-gated monolith)."""
    model, params, x, t = _setup()
    ref = model.apply({"params": params}, x, t)

    fn = make_pallas_video_full_fn(
        model, block_b=1, tgroup=3, layers_per_call=model.num_layers,
        precision=None, interpret=True)
    out = fn(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_full_kernel_tloop_matches_module():
    """tloop: the temporal query sweep as an in-kernel lax.fori_loop
    (the compile-feasible form at real frame counts — 81 unrolled query
    iterations per layer OOM the remote-compile helper)."""
    model, params, x, t = _setup()
    ref = model.apply({"params": params}, x, t)

    fn = make_pallas_video_full_fn(
        model, block_b=1, tgroup=1, tloop=True, precision=None,
        interpret=True)
    out = fn(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_temporal_layer_kernel_path_matches_module():
    """temporal_impl='pallas': spatial kernels + per-layer temporal
    kernels (the compile-feasible all-kernel eval path)."""
    from diffpose_tpu.ops.pallas_video import make_pallas_video_denoiser_fn

    model, params, x, t = _setup()
    ref = model.apply({"params": params}, x, t)

    fn = make_pallas_video_denoiser_fn(
        model, block_b=32, precision=None, interpret=True,
        temporal_impl="pallas")
    out = fn(params, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
