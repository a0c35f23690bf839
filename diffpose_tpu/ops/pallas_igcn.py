"""Fused Pallas implicit (IGCN) inference: fixed-point solve with the
5-layer backbone running as ONE whole-network kernel per iteration.

The implicit model's eval forward is a fixed-point solve ``z* = f(z*)``
where ``f(z) = BatchNorm(stack(z))`` and ``stack`` is the same 5-layer
GraAttenLayer+ResChebGCDiff body the diffusion denoiser uses (reference
``models/igcn.py:_stack``; direct-inference eval per
``runners/implicit_pose.py:523-526``).  The solve runs 10–20 iterations of
the stack — by far the hottest loop in the implicit family — so the stack
rides the same VMEM-resident whole-network kernel as the eval pipeline
(``make_pallas_backbone``), with parity-grade bf16x3 matmuls.  Everything
around it (input/output ChebConvs, timestep MLP, BatchNorm affine,
Anderson mixing / damped relaxation, convergence predicate) is cheap
elementwise or tiny-matrix math and stays in XLA, fusing around the kernel
launches inside one jitted ``lax.while_loop``.

Semantics match ``IGCN.__call__(train=False, differentiable=False)``
exactly (same masked Anderson history, same global-relative-norm
convergence after ``min_iterations``, same warm-start blend) — verified by
``tests/test_pallas_igcn.py`` in interpret mode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.models.layers import timestep_embedding
from diffpose_tpu.models.solvers import solve_anderson, solve_damped
from diffpose_tpu.ops.pallas_denoiser import make_pallas_backbone_fn

Array = jax.Array

__all__ = ["make_pallas_igcn", "make_pallas_igcn_fn"]


def make_pallas_igcn_fn(
    model: IGCN,
    *,
    block_b: int = 128,
    precision="bf16x3",
    interpret: bool = False,
    vmem_limit_bytes=None,
    group: int = 1,
):
    """Build ``fn(params, batch_stats, x, t, z0=None, z0_weight=None) →
    (out, aux)`` — the fused-kernel equivalent of ``model.apply({"params",
    "batch_stats"}, x, t, train=False, differentiable=False)``, with the
    weights as RUNTIME operands (one compiled program serves every weight
    set; see ``make_pallas_denoiser_fn``).

    ``aux`` carries ``iterations``, ``residual`` and ``fixed_point`` (the
    warm-start carry), plus ``alpha`` for the damped solver — the same
    surface :class:`~diffpose_tpu.models.igcn.IGCN` returns.
    """
    hid = model.hid_dim
    num_layers = model.num_layers
    f32 = jnp.float32

    backbone = make_pallas_backbone_fn(
        model.basis,
        num_layers=num_layers, num_heads=model.num_heads, hid_dim=hid,
        block_b=block_b, precision=precision, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes, group=group,
    )

    basis_j = jnp.asarray(model.basis, f32)

    def cheb(x, w, b):
        xk = jnp.einsum("knm,bmc->bnkc", basis_j, x)
        return jnp.einsum("bnkc,kcd->bnd", xk, w) + b

    def make_f(params, batch_stats):
        """The fixed-point function: kernel stack + eval-mode BatchNorm."""
        asf = lambda p: jnp.asarray(p, f32)
        bn_scale, bn_bias = asf(params["bn_scale"]), asf(params["bn_bias"])
        bn_mean, bn_var = asf(batch_stats["bn_mean"]), asf(batch_stats["bn_var"])

        def f(z, tp):
            out = backbone(params, z, tp)
            flat = out.reshape(-1, hid)
            y = (flat - bn_mean) * jax.lax.rsqrt(bn_var + 1e-5)
            y = y * bn_scale + bn_bias
            return y.reshape(out.shape)

        return f

    max_it, min_it = model.max_iterations, model.min_iterations

    # ----- solvers: the shared while_loop eval twins of IGCN._solve_* -----
    # (models/solvers.py; f returns no batch stats in eval mode → None
    # rides the carry as an empty pytree)

    def solve(f, z, tp, tol):
        f1 = lambda zz: (f(zz, tp), None)
        if model.solver == "anderson":
            z_star, aux, _ = solve_anderson(
                f1, z, tol,
                m=model.anderson_m, beta=model.anderson_beta,
                lam=model.anderson_lambda,
                max_iterations=max_it, min_iterations=min_it,
            )
        else:
            z_star, aux, _ = solve_damped(
                f1, z, tol,
                max_iterations=max_it, min_iterations=min_it,
                relaxation_alpha=model.relaxation_alpha,
                use_adaptive_alpha=model.use_adaptive_alpha,
                min_alpha=model.min_alpha, max_alpha=model.max_alpha,
            )
        return z_star, aux

    def fn(
        params: Dict[str, Any],
        batch_stats: Dict[str, Any],
        x: Array,
        t: Array,
        z0: Optional[Array] = None,
        z0_weight: Optional[Array] = None,
        tolerance_override: Optional[Array] = None,
    ):
        asf = lambda p: jnp.asarray(p, f32)
        win, bin_ = asf(params["gconv_input"]["w"]), asf(params["gconv_input"]["b"])
        wout, bout = asf(params["gconv_output"]["w"]), asf(params["gconv_output"]["b"])
        t0k, t0b = asf(params["temb_dense_0"]["kernel"]), asf(params["temb_dense_0"]["bias"])
        t1k, t1b = asf(params["temb_dense_1"]["kernel"]), asf(params["temb_dense_1"]["bias"])
        wtp = jnp.stack([asf(params[f"res_{i}"]["temb_proj"]["kernel"])
                         for i in range(num_layers)])
        btp = jnp.stack([asf(params[f"res_{i}"]["temb_proj"]["bias"])
                         for i in range(num_layers)])
        f = make_f(params, batch_stats)

        temb = timestep_embedding(t.astype(f32), hid)
        temb = nn.swish(temb @ t0k + t0b) @ t1k + t1b
        st = nn.swish(temb)
        tp = jnp.stack([st @ wtp[l] + btp[l] for l in range(num_layers)])

        out = cheb(x.astype(f32), win, bin_)
        if z0 is None:
            z = out
        elif z0_weight is None:
            z = z0
        else:
            w = jnp.asarray(z0_weight, out.dtype)
            z = w * jax.lax.stop_gradient(z0) + (1 - w) * out

        tol = jnp.asarray(
            model.tolerance if tolerance_override is None else tolerance_override,
            f32,
        )
        z_star, aux = solve(f, z, tp, tol)
        y = cheb(z_star, wout, bout)
        return y, {**aux, "fixed_point": z_star}

    return fn


def make_pallas_igcn(
    model: IGCN,
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    **kw,
):
    """Baked-weights wrapper over :func:`make_pallas_igcn_fn` —
    ``fn(x, t, z0=None, z0_weight=None) → (out, aux)`` with the weights
    fixed at build time (probes/tests; runners use the ``_fn`` variant)."""
    import functools

    return functools.partial(make_pallas_igcn_fn(model, **kw), params, batch_stats)
