"""Fused Pallas implicit (IGCN) TRAINING: backprop-through-the-solve with
the 5-layer stack running as the fused train kernel pair per iteration.

The implicit family's training forward is a fixed-point solve
``z* = f(z*)`` with ``f(z) = BatchNorm(stack(z))`` run in TRAIN mode
(dropout on, BN batch statistics), differentiated straight through the
fixed iteration count — the reference backprops through the loop
(``runners/implicit_pose.py:270-420``, ``models/igcn.py``), so every
solver iteration pays a stack forward AND its backward.  That makes the
stack fwd+bwd ~``2·max_iterations``× the cost of the standard family's
train step — by far the framework's hottest workload — so it rides the
same whole-network VMEM-resident kernel pair the standard family uses
(``ops/pallas_train.py``): the custom-VJP ``stack_apply`` sits inside the
solver's ``lax.scan``; JAX's reverse pass replays the scan and calls the
fused backward kernel per iteration.

Everything around the kernels stays in XLA and is autodiffed: weight prep
(q-scale folding, learned-adjacency Laplacian), timestep MLP, the
input/output ChebConvs, the BatchNorm affine (train-mode batch stats —
tiny reductions XLA fuses into the kernel's output read), and the
Anderson/damped mixing (shared solvers, ``models/solvers.py``).

Dropout semantics: the flax module draws each site's mask from
``make_rng`` ONCE per traced call, so inside the solver scan every
iteration reuses the same mask — the fused path matches by drawing one
``DropoutMasks`` (or one PRNG seed) per step and reusing it across
iterations.

``remat=True`` wraps the fixed-point function in ``jax.checkpoint``: the
per-iteration kernel stashes (7 × [L,N,B,H] f32) are not saved across the
scan but recomputed by replaying the forward kernel during the backward
sweep — trading one extra forward kernel launch per iteration for
~``max_iterations × 230 MB`` (B=1024) of HBM.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.models.layers import timestep_embedding
from diffpose_tpu.models.solvers import solve_anderson, solve_damped
from diffpose_tpu.ops.pallas_denoiser import _prep_weights
from diffpose_tpu.ops.pallas_train import (
    STACK_KEYS,
    build_pallas_train_stack,
    kernel_masks,
)
from diffpose_tpu.ops.train_ref import DropoutMasks
from diffpose_tpu.ops.train_ref import _cheb as _cheb_xla

Array = jax.Array

__all__ = ["make_pallas_igcn_train_fn", "make_pallas_implicit_train_step"]


def make_pallas_igcn_train_fn(
    model: IGCN,
    *,
    block_b_fwd: int = 16,
    block_b_bwd: int = 16,
    group: int = 4,
    precision="bf16x3",
    dropout: str = "masks",
    interpret: bool = False,
    vmem_limit_bytes=None,
    remat: bool = False,
    stack_override=None,
):
    """Build ``fn(params, batch_stats, x, t, masks_or_seed, z0=None,
    z0_weight=None, tolerance_override=None) → (out, aux, new_batch_stats)``
    — the fused-kernel, params-differentiable equivalent of
    ``model.apply({"params", "batch_stats"}, x, t, train=True,
    mutable=["batch_stats"])``.

    ``aux`` carries ``iterations``, ``residual`` and ``fixed_point``
    (batch-major, the warm-start carry), plus ``alpha`` for the damped
    solver; ``new_batch_stats`` is the momentum-updated BN running-stats
    dict (stop-gradient, as flax variables are).

    ``stack_override(w_stack, h0, tp, masks_or_seed) → d5`` swaps the
    Pallas stack for a pure-JAX twin (parity tests isolate the kernels).
    """
    hid = model.hid_dim
    num_layers, num_heads = model.num_layers, model.num_heads
    basis = np.asarray(model.basis)
    f32 = jnp.float32

    convert_masks = stack_override is None
    stack_fn = stack_override
    if stack_fn is None:
        stack_fn = build_pallas_train_stack(
            basis, num_layers=num_layers, num_heads=num_heads, hid_dim=hid,
            block_b_fwd=block_b_fwd, block_b_bwd=block_b_bwd, group=group,
            precision=precision, dropout=dropout, interpret=interpret,
            vmem_limit_bytes=vmem_limit_bytes,
        )

    basis_j = jnp.asarray(basis, f32)
    max_it, min_it = model.max_iterations, model.min_iterations

    def fn(
        params: Dict[str, Any],
        batch_stats: Dict[str, Any],
        x: Array,
        t: Array,
        masks_or_seed,
        z0: Optional[Array] = None,
        z0_weight: Optional[Array] = None,
        tolerance_override: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array], Dict[str, Array]]:
        weights, _, _, _ = _prep_weights(params, basis, num_layers, num_heads, hid)
        w_stack = {k: weights[k] for k in STACK_KEYS}
        if convert_masks and isinstance(masks_or_seed, DropoutMasks):
            masks_or_seed = kernel_masks(masks_or_seed, hid // num_heads)

        temb = timestep_embedding(t.astype(f32), hid)
        temb = nn.swish(
            temb @ jnp.asarray(params["temb_dense_0"]["kernel"], f32)
            + jnp.asarray(params["temb_dense_0"]["bias"], f32))
        temb = (temb @ jnp.asarray(params["temb_dense_1"]["kernel"], f32)
                + jnp.asarray(params["temb_dense_1"]["bias"], f32))
        st = nn.swish(temb)
        tp = jnp.stack([
            st @ jnp.asarray(params[f"res_{i}"]["temb_proj"]["kernel"], f32)
            + jnp.asarray(params[f"res_{i}"]["temb_proj"]["bias"], f32)
            for i in range(num_layers)
        ])

        # joint-major [N, B, H] — the kernels' layout
        xj = jnp.transpose(x.astype(f32), (1, 0, 2))
        out = _cheb_xla(xj, weights["win"], weights["bin_"], basis_j)
        if z0 is None:
            z = out
        else:
            z0j = jnp.transpose(jnp.asarray(z0, f32), (1, 0, 2))
            if z0_weight is None:
                z = z0j
            else:
                w = jnp.asarray(z0_weight, out.dtype)
                z = w * jax.lax.stop_gradient(z0j) + (1 - w) * out

        bn_scale = jnp.asarray(params["bn_scale"], f32)
        bn_bias = jnp.asarray(params["bn_bias"], f32)

        def f(zz):
            d5 = stack_fn(w_stack, zz, tp, masks_or_seed)
            # train-mode BatchNorm over the flattened [N·B, H] features —
            # the module's _bn on [B, J, H] normalizes the same element set
            mean = jnp.mean(d5, axis=(0, 1))
            var = jnp.var(d5, axis=(0, 1))
            y = (d5 - mean) * jax.lax.rsqrt(var + 1e-5)
            y = y * bn_scale + bn_bias
            return y, (mean, var)

        if remat:
            f = jax.checkpoint(f)

        tol = jnp.asarray(
            model.tolerance if tolerance_override is None else tolerance_override,
            f32,
        )
        if model.solver == "anderson":
            z_star, aux, stats = solve_anderson(
                f, z, tol,
                m=model.anderson_m, beta=model.anderson_beta,
                lam=model.anderson_lambda,
                max_iterations=max_it, min_iterations=min_it,
                differentiable=True,
            )
        else:
            z_star, aux, stats = solve_damped(
                f, z, tol,
                max_iterations=max_it, min_iterations=min_it,
                relaxation_alpha=model.relaxation_alpha,
                use_adaptive_alpha=model.use_adaptive_alpha,
                min_alpha=model.min_alpha, max_alpha=model.max_alpha,
                differentiable=True,
                stats_init=(jnp.zeros((hid,), f32), jnp.ones((hid,), f32)),
            )

        m = model.bn_momentum
        new_batch_stats = jax.lax.stop_gradient({
            "bn_mean": (1 - m) * jnp.asarray(batch_stats["bn_mean"], f32)
            + m * stats[0],
            "bn_var": (1 - m) * jnp.asarray(batch_stats["bn_var"], f32)
            + m * stats[1],
        })

        y = _cheb_xla(z_star, weights["wout"], weights["bout"], basis_j)
        out_bm = jnp.transpose(y, (1, 0, 2))
        aux = {**aux, "fixed_point": jnp.transpose(z_star, (1, 0, 2))}
        return out_bm, aux, new_batch_stats

    return fn


def make_pallas_implicit_train_step(
    model: IGCN,
    optimizer,
    betas: np.ndarray,
    *,
    ema_mu: Optional[float] = 0.999,
    axis_name: Optional[str] = None,
    use_warm_start: bool = False,
    tol_schedule: Optional[Tuple[float, float, int]] = None,
    dropout: str = "masks",
    block_b_fwd: int = 16,
    block_b_bwd: int = 16,
    group: int = 4,
    precision="bf16x3",
    interpret: bool = False,
    vmem_limit_bytes=None,
    remat: bool = False,
):
    """Fused-kernel drop-in for
    :func:`diffpose_tpu.train.implicit_steps.make_implicit_train_step` —
    same signature, same metric surface (loss, grad_norm, fp_iterations,
    fp_residual[, fp_tolerance, fixed_point]), with the solve's stack
    fwd+bwd running through the Pallas kernel pair.  Dropout is
    statistically identical to the module path (see module docstring);
    the RNG stream differs, as it may.
    """
    import optax

    from diffpose_tpu.data.gmm import sample_gmm_batch
    from diffpose_tpu.diffusion.ddim import antithetic_timesteps, q_sample
    from diffpose_tpu.models.ema import ema_update
    from diffpose_tpu.ops.train_ref import make_dropout_masks

    num_timesteps = len(betas)
    prng = dropout == "prng"
    n_pts = model.n_pts
    fwd = make_pallas_igcn_train_fn(
        model, block_b_fwd=block_b_fwd, block_b_bwd=block_b_bwd, group=group,
        precision=precision, dropout=dropout, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes, remat=remat,
    )

    def train_step(state, batch: dict, key: Array, z0=None, z0_weight=None):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_gmm, k_t, k_e, k_drop = jax.random.split(key, 4)

        tol = None
        if tol_schedule is not None:
            init_tol, final_tol, decay_steps = tol_schedule
            frac = jnp.clip(
                state.step.astype(jnp.float32) / max(decay_steps, 1), 0.0, 1.0
            )
            tol = init_tol + (final_tol - init_tol) * frac

        uvxyz, noise_scale, _ = sample_gmm_batch(
            k_gmm, batch["poses_2d_gmm"], batch["poses_3d"]
        )
        n = uvxyz.shape[0]
        t = antithetic_timesteps(k_t, n, num_timesteps)
        e = jax.random.normal(k_e, uvxyz.shape, uvxyz.dtype) * noise_scale
        x_t = q_sample(uvxyz, t, e, betas)
        if prng:
            masks_or_seed = jax.random.randint(
                k_drop, (1,), jnp.iinfo(jnp.int32).min,
                jnp.iinfo(jnp.int32).max, jnp.int32)
        else:
            masks_or_seed = make_dropout_masks(
                k_drop, num_layers=model.num_layers, n_pts=n_pts, batch=n,
                num_heads=model.num_heads, hid_dim=model.hid_dim,
            )

        def loss_fn(params):
            eps, aux, new_stats = fwd(
                params, state.model_state, x_t, t.astype(jnp.float32),
                masks_or_seed, z0, z0_weight, tol,
            )
            loss = jnp.mean(jnp.sum((e - eps) ** 2, axis=(1, 2)))
            return loss, (aux, new_stats)

        (loss, (aux, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        fp_iterations = aux["iterations"].astype(jnp.float32)
        fp_residual = aux["residual"]
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            new_model_state = jax.lax.pmean(new_model_state, axis_name)
            fp_iterations = jax.lax.pmean(fp_iterations, axis_name)
            fp_residual = jax.lax.pmax(fp_residual, axis_name)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None and ema_mu is not None:
            ema_params = ema_update(ema_params, params, ema_mu)

        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            model_state=new_model_state,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "fp_iterations": fp_iterations,
            "fp_residual": fp_residual,
        }
        if tol is not None:
            metrics["fp_tolerance"] = tol
        if use_warm_start:
            metrics["fixed_point"] = jax.lax.stop_gradient(aux["fixed_point"])
        return new_state, metrics

    return train_step
