"""Fused Pallas eval pipeline vs the XLA module pipeline (interpret mode).

Small config (hid 32, 2 layers) keeps interpret-mode runtime down; the
full-size kernels are covered by ``test_pallas_denoiser.py`` and timed on
hardware by ``scripts/probe_kernels.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.diffusion import ddim_sample, get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose
from diffpose_tpu.ops.pallas_denoiser import make_pallas_lifter
from diffpose_tpu.ops.pallas_pipeline import make_pallas_eval

BASIS = cheb_basis_from_edges(17, H36M_EDGES)
CFG = dict(hid_dim=32, num_layers=2, num_heads=4)
BETAS = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                          num_diffusion_timesteps=51)
SEQ = (0, 12)


def _models():
    diff = GCNDiff(basis=BASIS, **CFG)
    pose = GCNPose(basis=BASIS, **CFG)
    pd = diff.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    pp = pose.init({"params": jax.random.PRNGKey(1)},
                   jnp.zeros((2, 17, 2)))["params"]
    return diff, pose, pd, pp


def _xla_eval(diff, pose, pd, pp, x2d, test_times=1):
    mask = jnp.ones((1, 1, 17))
    xyz = pose.apply({"params": pp}, x2d, mask)
    xyz = xyz - xyz[:, :1, :]
    uvxyz = jnp.concatenate([x2d, xyz], axis=-1)
    uvxyz = jnp.tile(uvxyz, (test_times, 1, 1))
    out = ddim_sample(lambda x, t: diff.apply({"params": pd}, x, t, mask),
                      uvxyz, SEQ, BETAS)
    return out.reshape(test_times, -1, 17, 5).mean(axis=0)[..., 2:]


def test_pallas_pipeline_matches_xla(rng):
    diff, pose, pd, pp = _models()
    x2d = jnp.asarray(rng.normal(size=(8, 17, 2)).astype(np.float32))
    want = _xla_eval(diff, pose, pd, pp, x2d)
    fn = make_pallas_eval(pp, pd, BASIS, seq=SEQ, betas=BETAS,
                          block_b=8, interpret=True, **CFG)
    got = fn(x2d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_pallas_pipeline_test_times(rng):
    """Hypothesis tiling: B·test_times rows flow through the kernels."""
    diff, pose, pd, pp = _models()
    x2d = jnp.asarray(rng.normal(size=(4, 17, 2)).astype(np.float32))
    want = _xla_eval(diff, pose, pd, pp, x2d, test_times=2)
    fn = make_pallas_eval(pp, pd, BASIS, seq=SEQ, betas=BETAS,
                          test_times=2, block_b=8, interpret=True, **CFG)
    got = fn(x2d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_pallas_lifter_matches_module(rng):
    _, pose, _, pp = _models()
    x2d = jnp.asarray(rng.normal(size=(8, 17, 2)).astype(np.float32))
    want = pose.apply({"params": pp}, x2d, jnp.ones((1, 1, 17)))
    fn = make_pallas_lifter(pp, BASIS, block_b=8, interpret=True, **CFG)
    np.testing.assert_allclose(np.asarray(fn(x2d)), np.asarray(want), atol=5e-5)


def test_bf16x3_parity_grade(rng):
    """bf16x3 emulation stays within f32-ish tolerance of the exact dot."""
    _, pose, _, pp = _models()
    x2d = jnp.asarray(rng.normal(size=(8, 17, 2)).astype(np.float32))
    want = pose.apply({"params": pp}, x2d, jnp.ones((1, 1, 17)))
    fn = make_pallas_lifter(pp, BASIS, block_b=8, interpret=True,
                            precision="bf16x3", **CFG)
    err = float(jnp.abs(fn(x2d) - want).max())
    assert err < 5e-3, err  # ~2^-16 relative per dot, accumulated over layers
