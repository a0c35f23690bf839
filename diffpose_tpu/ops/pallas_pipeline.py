"""Fused Pallas eval pipeline: lift + DDIM denoise in one device program.

The reference evaluation protocol (``runners/diffpose_frame.py:300-340`` +
``common/utils_diff.py:46-67``) lifts 2D keypoints with GCNpose, then runs
the accelerated DDIM reverse loop (2 steps in the shipped configs) over
the uvxyz batch from host Python.  Here the whole thing is a single jitted
program whose three network forwards (1 lift + 2 denoise) each run as one
whole-network Pallas kernel (weights VMEM-resident, zero intermediate HBM
round-trips inside a forward); the tiny DDIM mixing math between kernels
stays in XLA and fuses with the kernels' outputs.

Parity grade: ``precision="bf16x3"`` (default) emulates f32 matmuls as
three single-pass bf16 MXU products — same decomposition XLA uses for
``jax.default_matmul_precision("float32")``, but compiled via Mosaic in
seconds instead of the pathologically slow ``Precision.HIGHEST`` path
(docs/PERF.md).  Verified against the CPU f32 module pipeline by the test
suite (``tests/test_pallas_pipeline.py``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np

import functools

from diffpose_tpu.diffusion import ddim_sample
from diffpose_tpu.ops.pallas_denoiser import (
    make_pallas_denoiser_fn,
    make_pallas_lifter_fn,
)

__all__ = ["make_pallas_eval", "make_pallas_eval_fn"]


def make_pallas_eval_fn(
    basis: np.ndarray,
    *,
    seq: Sequence[int],
    betas,
    test_times: int = 1,
    block_b: int = 128,
    precision="bf16x3",
    num_layers: int = 5,
    num_heads: int = 4,
    hid_dim: int = 96,
    interpret: bool = False,
    vmem_limit_bytes=None,
    group: int = 1,
):
    """Build ``eval_one(params_pose, params_diff, x2d [B,17,2]) → xyz
    [B,17,3]`` (root-relative mean over ``test_times`` hypotheses) with the
    weights as RUNTIME operands: one compiled program serves every weight
    set (per-epoch eval, EMA vs live, trained checkpoints), and — because
    nothing is baked in as constants — the lowered program is small enough
    to hash/serialize in seconds (``utils/aot_cache.py``).
    """
    kw = dict(
        num_layers=num_layers, num_heads=num_heads, hid_dim=hid_dim,
        block_b=block_b, precision=precision, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes, group=group,
    )
    lift = make_pallas_lifter_fn(basis, **kw)
    denoise = make_pallas_denoiser_fn(basis, **kw)

    def eval_one(params_pose, params_diff, x2d):
        xyz = lift(params_pose, x2d)
        xyz = xyz - xyz[:, :1, :]
        uvxyz = jnp.concatenate([x2d, xyz], axis=-1)
        uvxyz = jnp.tile(uvxyz, (test_times, 1, 1))
        out = ddim_sample(functools.partial(denoise, params_diff),
                          uvxyz, seq, betas)
        out = out.reshape(test_times, -1, x2d.shape[1], 5).mean(axis=0)
        return out[..., 2:]

    return eval_one


def make_pallas_eval(
    params_pose: Dict[str, Any],
    params_diff: Dict[str, Any],
    basis: np.ndarray,
    **kw,
):
    """Build ``eval_one(x2d [B,17,2]) → xyz [B,17,3]`` with the weights
    baked in at build time (tests/probes); prefer
    :func:`make_pallas_eval_fn` anywhere the program is reused.  Any
    ``B·test_times`` works: the kernels pad the batch up to a ``block_b``
    multiple and slice the result (exact — rows are independent), so odd
    sizes keep full-width MXU tiles.
    """
    return functools.partial(make_pallas_eval_fn(basis, **kw),
                             params_pose, params_diff)
