"""Train/eval steps for the spatio-temporal (video) denoiser.

Same GMM-diffusion objective as the frame model, applied per frame of an
``[B, F, J, …]`` window: per-joint GMM kernel draws for every frame, one
diffusion timestep per *window* (the whole window is noised coherently,
the standard choice for temporal diffusion), ε-MSE summed over frames,
joints and coords.

Mesh composition: the steps run standalone, under data parallelism
(``data_axis`` — windows shard, grads ``pmean``), under context
parallelism (``cp_axis`` — frames shard, the model all-gathers K/V, the
frame-summed loss/grads ``psum``), or both at once on a 2-D
``('data', 'context')`` mesh.  The diffusion timestep is drawn per window
from a key folded with the *data* index only, so every frame shard of a
window sees the same ``t`` (the noising must be coherent across the
window); per-frame randomness (GMM draw, noise, dropout) additionally
folds the context index.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffpose_tpu.data.gmm import sample_gmm_batch
from diffpose_tpu.diffusion.ddim import antithetic_timesteps, q_sample
from diffpose_tpu.models.ema import ema_update
from diffpose_tpu.train.state import TrainState

Array = jax.Array


def make_video_eval_step(
    model,
    betas: np.ndarray,
    seq,
    *,
    test_times: int = 1,
    eta: float = 0.0,
    mask: Optional[Array] = None,
    use_ema: bool = False,
    gmm_base_seed: int = 0,
    cp_axis: Optional[str] = None,
    data_axis: Optional[str] = None,
    frames_total: Optional[int] = None,
    denoise_override=None,
):
    """Window eval: per-frame GMM 2D + zero-init xyz → DDIM over the window
    → hypothesis mean → per-frame P1/P2 ``[B, F_local]`` (root-centered).

    ``denoise_override(params, z, tv) → ε̂`` swaps the module forward for
    the fused-kernel one (``ops/pallas_video.py``): the spatial blocks run
    as Pallas kernels, weights as runtime operands, semantics identical.

    The video variant starts from the observed uv with a zero xyz guess
    (no per-frame lifter is required — the temporal context supplies the
    prior); per-sample keyed GMM draws keep results layout-invariant:
    under ``cp_axis`` each frame shard derives the SAME per-(window, frame)
    seed ids the unsharded step uses (global frame index offset), so
    sharded and unsharded eval agree exactly at ``eta=0`` (deterministic
    DDIM, key unused).  With ``eta>0`` the DDIM noise key is folded with
    the shard indices so every shard draws INDEPENDENT noise — without the
    fold the replicated key would repeat the same noise block on every
    frame/window shard; the stochastic path is therefore decorrelated but
    not bitwise layout-invariant.
    """
    from diffpose_tpu.data.gmm import sample_gmm_batch_per_sample
    from diffpose_tpu.diffusion.ddim import ddim_sample
    from diffpose_tpu.metrics import mpjpe_per_sample, p_mpjpe_per_sample

    seq = tuple(int(s) for s in seq)

    def eval_step(state: TrainState, batch: dict, key: Array):
        if eta != 0.0:
            for ax in (data_axis, cp_axis):
                if ax is not None:
                    key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        p3 = batch["poses_3d"]       # [B, F_local, J, 3]
        gmm = batch["poses_2d_gmm"]  # [B, F_local, J, K, 5]
        b, f, j = p3.shape[:3]
        f_tot = frames_total if frames_total is not None else f
        frame0 = (
            jax.lax.axis_index(cp_axis) * f if cp_axis is not None else 0
        )

        k_gmm = jax.random.fold_in(jax.random.PRNGKey(gmm_base_seed), 1)
        frame_ids = frame0 + jnp.arange(f)
        _, _, input_2d = sample_gmm_batch_per_sample(
            k_gmm,
            jnp.repeat(batch["seeds"], f) * f_tot + jnp.tile(frame_ids, b),
            gmm.reshape(b * f, j, gmm.shape[3], 5),
            p3.reshape(b * f, j, 3),
        )
        input_2d = input_2d.reshape(b, f, j, 2)
        uvxyz = jnp.concatenate([input_2d, jnp.zeros((b, f, j, 3), p3.dtype)], axis=-1)
        uvxyz = jnp.tile(uvxyz, (test_times, 1, 1, 1))

        if denoise_override is not None:
            def denoise(z, tv):
                return denoise_override(params, z, tv)
        else:
            def denoise(z, tv):
                return model.apply({"params": params}, z, tv, mask)

        out = ddim_sample(denoise, uvxyz, seq, betas, eta=eta, key=key)
        out = out.reshape(test_times, b, f, j, 5).mean(axis=0)

        pred = out[..., 2:]
        pred = pred - pred[..., :1, :]
        tgt = p3 - p3[..., :1, :]
        # per-window, per-frame errors [B, F_local]
        p1 = mpjpe_per_sample(pred.reshape(b * f, j, 3), tgt.reshape(b * f, j, 3))
        p2 = p_mpjpe_per_sample(pred.reshape(b * f, j, 3), tgt.reshape(b * f, j, 3))
        return p1.reshape(b, f), p2.reshape(b, f), pred

    return eval_step


def make_video_train_step(
    model,
    optimizer: optax.GradientTransformation,
    betas: np.ndarray,
    *,
    ema_mu: Optional[float] = 0.999,
    mask: Optional[Array] = None,
    data_axis: Optional[str] = None,
    cp_axis: Optional[str] = None,
):
    num_timesteps = len(betas)

    def train_step(state: TrainState, batch: dict, key: Array):
        if data_axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        k_gmm, k_t, k_e, k_drop = jax.random.split(key, 4)
        if cp_axis is not None:
            # Per-frame randomness decorrelates across frame shards; k_t is
            # NOT folded — the window's timestep must be shard-invariant.
            ci = jax.lax.axis_index(cp_axis)
            k_gmm = jax.random.fold_in(k_gmm, ci)
            k_e = jax.random.fold_in(k_e, ci)
            k_drop = jax.random.fold_in(k_drop, ci)

        p3 = batch["poses_3d"]        # [B, F_local, J, 3]
        gmm = batch["poses_2d_gmm"]   # [B, F_local, J, K, 5]
        b, f, j = p3.shape[:3]

        uvxyz, noise_scale, _ = sample_gmm_batch(
            k_gmm, gmm.reshape(b * f, j, gmm.shape[3], 5), p3.reshape(b * f, j, 3)
        )
        uvxyz = uvxyz.reshape(b, f, j, 5)
        noise_scale = noise_scale.reshape(b, f, j, 5)

        t = antithetic_timesteps(k_t, b, num_timesteps)
        e = jax.random.normal(k_e, uvxyz.shape, uvxyz.dtype) * noise_scale
        x_t = q_sample(uvxyz, t, e, betas)

        def loss_fn(params):
            eps = model.apply(
                {"params": params}, x_t, t.astype(jnp.float32), mask,
                train=True, rngs={"dropout": k_drop},
            )
            return jnp.mean(jnp.sum((e - eps) ** 2, axis=(1, 2, 3)))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if cp_axis is not None:
            # the loss sums over frames → frame shards ADD
            grads = jax.lax.psum(grads, cp_axis)
            loss = jax.lax.psum(loss, cp_axis)
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None and ema_mu is not None:
            ema_params = ema_update(ema_params, params, ema_mu)

        new_state = state.replace(
            params=params, opt_state=opt_state, ema_params=ema_params,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step
