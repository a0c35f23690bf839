"""Fused Pallas TRAIN path for the video (spatio-temporal) denoiser.

The video model's spatial blocks — GraAttenLayer + timestep-injected
residual ChebConv per frame (``models/video.py:179-190``) — are the same
math as the frame family's training stack at batch ``B·F``, so each runs
as a single-layer instance of the fused train kernel *pair*
(``ops/pallas_train.build_pallas_train_stack``, custom VJP: one forward
kernel + one backward kernel per block per step), weights as RUNTIME
operands.  Everything between stays XLA and is autodiffed: the timestep
MLP, positional embedding, I/O ChebConvs, and the temporal blocks
(frame-axis attention — [F, F] GEMMs XLA shapes well for the MXU).

Dropout semantics match the flax module sites exactly
(``models/video.py``): the spatial blocks take explicit 0/1 masks (the
kernels' contract, ``ops/train_ref.py``) at the video family's rates —
attention-probs 0.1, sublayer ``model.dropout_rate``, cheb 0.1 — and the
temporal blocks draw flax-semantics Bernoulli masks in XLA from a step
key (three sites per block: attention probs, post-attention residual,
post-FF residual).

Batch handling: the kernels tile the fused ``B·F`` row axis; when
``B·F`` is not a multiple of the tile, rows are zero-padded up to it and
the output sliced back — padded rows receive zero upstream gradient, so
gradients are exact.

Reference scope: the video family is delegated by the reference to an
external repo (``README.md:92-93``); this accelerates the first-class
family built per SURVEY §7.9 / BASELINE configs[4].
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffpose_tpu.models.layers import timestep_embedding
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.ops.pallas_denoiser import _prep_weights
from diffpose_tpu.ops.pallas_train import (
    STACK_KEYS,
    build_pallas_train_stack,
    kernel_masks,
)
from diffpose_tpu.ops.train_ref import RATE_ATTN_PROBS, RATE_CHEB, DropoutMasks
from diffpose_tpu.ops.train_ref import _cheb as _cheb_xla

Array = jax.Array

__all__ = [
    "make_pallas_video_train_fn",
    "make_pallas_video_train_step",
    "video_dropout_rates",
]


def video_dropout_rates(model: SpatioTemporalDiff) -> Tuple[float, float, float]:
    """(p_attn_probs, p_sublayer, p_cheb) for the model's spatial blocks.

    ``models/video.py``: GraAttenLayer keeps its 0.1 attention-prob
    default, the sublayer rate is the model's ``dropout_rate``, and
    ResChebGCDiff is constructed with ``dropout_rate=0.1``.
    """
    return (RATE_ATTN_PROBS, float(model.dropout_rate), RATE_CHEB)


def _ln(p: Dict[str, Array], x: Array) -> Array:
    dim = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (dim - 1)
    return p["scale"] * centered / (jnp.sqrt(var) + 1e-6) + p["bias"]


def _dense(p: Dict[str, Array], x: Array) -> Array:
    return x @ p["kernel"] + p["bias"]


def _drop(key: Array, x: Array, rate: float) -> Array:
    """flax ``nn.Dropout`` semantics: ``bernoulli(keep); x·mask/keep``."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _temporal_block_train(p: Dict[str, Array], x: Array, num_heads: int,
                          rate: float, key: Array) -> Array:
    """TRAIN-mode TemporalBlock (``models/video.py:99-120``): pre-LN MHA
    over the frame axis + pre-LN 2-layer FF, with the module's three
    dropout sites.  Training always uses the fused (materialized-scores)
    attention — the module only chunks at inference."""
    n, f, d = x.shape
    h = num_heads
    dk = d // h
    k_probs, k_attn, k_ff = jax.random.split(key, 3)

    y = _ln(p["norm1"], x)
    a = p["attn"]

    def split(z):
        return z.reshape(n, f, h, dk).transpose(0, 2, 1, 3)

    q = split(_dense(a["q"], y))
    k = split(_dense(a["k"], y))
    v = split(_dense(a["v"], y))
    scores = jnp.einsum("nhfd,nhgd->nhfg", q, k) / math.sqrt(dk)
    probs = _drop(k_probs, jax.nn.softmax(scores, -1), rate)
    out = jnp.einsum("nhfg,nhgd->nhfd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(n, f, d)
    x = x + _drop(k_attn, _dense(a["out"], out), rate)

    y = _ln(p["norm2"], x)
    y = nn.relu(_dense(p["ff1"], y))
    y = _dense(p["ff2"], y)
    return x + _drop(k_ff, y, rate)


def _cheb_bm(basis: Array, x: Array, w: Array, b: Array) -> Array:
    """Batch-major ChebGraphConv forward (``models/layers.py:97-127``)."""
    xk = jnp.einsum("knm,bmc->bnkc", basis, x)
    return jnp.einsum("bnkc,kcd->bnd", xk, w) + b


def _slice_masks(masks: DropoutMasks, i: int) -> DropoutMasks:
    return DropoutMasks(*[m[i:i + 1] for m in masks])


def make_pallas_video_train_fn(
    model: SpatioTemporalDiff,
    *,
    block_b_fwd: int = 16,
    block_b_bwd: int = 16,
    group: int = 4,
    precision="bf16x3",
    dropout: str = "masks",
    interpret: bool = False,
    vmem_limit_bytes=None,
    rates: Optional[Tuple[float, float, float]] = None,
    stack_override=None,
):
    """Build ``fn(params, x [B,F,J,C], t [B], masks_or_seed, tkey) → ε̂``
    — the fused-kernel, params-differentiable equivalent of
    ``model.apply({"params": params}, x, t, train=True, rngs=...)``.

    ``dropout="masks"``: ``masks_or_seed`` is a ``train_ref.DropoutMasks``
    drawn at batch ``B·F`` with ``num_layers = model.num_layers`` and the
    video rates (:func:`video_dropout_rates`).  ``dropout="prng"``
    (TPU-hardware only): ``masks_or_seed`` is a [1] int32 step seed and
    the spatial masks are drawn inside the kernels — at video sizes the
    explicit ``probs_exp`` mask alone is ~68 MB/layer of HBM traffic
    (written once, read by both kernels), which prng removes; each
    spatial layer folds its index into the seed so layers draw
    independent streams.  ``tkey`` seeds the temporal blocks' dropout
    (always XLA).  Statistically identical to the module path; the RNG
    stream differs, as it may.

    ``stack_override(w_stack, h0, tp, masks_1layer) → d5`` swaps the
    Pallas stack for a pure-JAX twin (parity tests isolate the kernels).
    Context parallelism is not supported on this path (``cp_axis`` must
    be None) — the sharded video step keeps the module forward.
    """
    assert model.cp_axis is None, (
        "fused video train runs per-shard batches only; build the model "
        "with cp_axis=None (temporal CP stays on the XLA module path)")
    assert dropout in ("masks", "prng"), dropout
    assert not (dropout == "prng" and interpret), (
        "prng dropout needs TPU PRNG hardware (no interpret path)")
    hid = model.hid_dim
    heads = model.num_heads
    basis = np.asarray(model.basis)
    basis_j = jnp.asarray(basis, jnp.float32)
    f32 = jnp.float32
    prng = dropout == "prng"
    if rates is None:
        rates = video_dropout_rates(model)
    t_rate = float(model.dropout_rate)
    tile = max(block_b_fwd, block_b_bwd)

    convert_masks = stack_override is None and not prng
    stack_fn = stack_override
    if stack_fn is None:
        stack_fn = build_pallas_train_stack(
            basis, num_layers=1, num_heads=heads, hid_dim=hid,
            block_b_fwd=block_b_fwd, block_b_bwd=block_b_bwd, group=group,
            precision=precision, dropout=dropout, interpret=interpret,
            vmem_limit_bytes=vmem_limit_bytes, rates=rates,
        )

    def fn(params: Dict[str, Any], x: Array, t: Array,
           masks: DropoutMasks, tkey: Array) -> Array:
        p = jax.tree_util.tree_map(lambda v: jnp.asarray(v, f32), params)
        b, f, j, _ = x.shape
        rows = b * f
        pad = (-rows) % tile

        temb = timestep_embedding(t.astype(f32), hid)
        temb = nn.swish(_dense(p["temb_dense_0"], temb))
        temb = _dense(p["temb_dense_1"], temb)
        st = nn.swish(temb)

        h = _cheb_bm(basis_j, x.reshape(rows, j, -1).astype(f32),
                     p["gconv_input"]["w"], p["gconv_input"]["b"])
        h = h.reshape(b, f, j, hid)
        assert f == model.frames, (f, model.frames)
        h = h + p["pos_embed"][None, :, None, :]

        for i in range(model.num_layers):
            res = p[f"spatial_res_{i}"]
            pseudo = {
                "gconv_input": p["gconv_input"],
                "gconv_output": p["gconv_output"],
                "atten_0": p[f"spatial_atten_{i}"],
                "res_0": res,
            }
            weights, _, _, _ = _prep_weights(pseudo, basis, 1, heads, hid)
            w_stack = {k: weights[k] for k in STACK_KEYS}

            tp = _dense(res["temb_proj"], st)                 # [B, hid]
            tp = jnp.repeat(tp, f, axis=0)[None]              # [1, B·F, hid]

            # joint-major [J, B·F, hid] — the kernels' layout
            hj = jnp.transpose(h.reshape(rows, j, hid), (1, 0, 2))
            if pad:
                hj = jnp.pad(hj, ((0, 0), (0, pad), (0, 0)))
                tp = jnp.pad(tp, ((0, 0), (0, pad), (0, 0)))
            if prng:
                # layer-distinct stream: the 1-layer stacks all run at
                # kernel layer index 0, so the layer identity rides the
                # seed value instead (int32 wrap-around is fine)
                mk = masks + jnp.int32(i) * jnp.int32(1000003)
            else:
                mi = _slice_masks(masks, i)
                if pad:
                    mi = DropoutMasks(*[
                        jnp.pad(m, [(0, 0)] * (m.ndim - 2)
                                + [(0, pad), (0, 0)], constant_values=1)
                        for m in mi])
                mk = kernel_masks(mi, hid // heads) if convert_masks else mi
            d5 = stack_fn(w_stack, hj, tp, mk)
            if pad:
                d5 = d5[:, :rows]
            h = jnp.transpose(d5, (1, 0, 2)).reshape(b, f, j, hid)

            ht = h.transpose(0, 2, 1, 3).reshape(b * j, f, hid)
            ht = _temporal_block_train(
                p[f"temporal_{i}"], ht, heads, t_rate,
                jax.random.fold_in(tkey, i))
            h = ht.reshape(b, j, f, hid).transpose(0, 2, 1, 3)

        out = _cheb_bm(basis_j, h.reshape(rows, j, hid),
                       p["gconv_output"]["w"], p["gconv_output"]["b"])
        return out.reshape(b, f, j, model.coords_out)

    return fn


def make_pallas_video_train_step(
    model: SpatioTemporalDiff,
    optimizer,
    betas: np.ndarray,
    *,
    ema_mu: Optional[float] = 0.999,
    data_axis: Optional[str] = None,
    block_b_fwd: int = 16,
    block_b_bwd: int = 16,
    group: int = 4,
    precision="bf16x3",
    dropout: str = "masks",
    interpret: bool = False,
    vmem_limit_bytes=None,
):
    """Fused-kernel drop-in for
    :func:`diffpose_tpu.train.video_steps.make_video_train_step` — same
    signature ``(state, batch, key) → (state, metrics)``, same GMM
    diffusion objective, with every spatial block's fwd+bwd running
    through the Pallas kernel pair.  Supports data parallelism
    (``data_axis`` pmean); context parallelism stays on the module path.
    ``dropout="prng"`` draws the spatial masks in-kernel (TPU only; see
    :func:`make_pallas_video_train_fn`).
    """
    import optax

    from diffpose_tpu.data.gmm import sample_gmm_batch
    from diffpose_tpu.diffusion.ddim import antithetic_timesteps, q_sample
    from diffpose_tpu.models.ema import ema_update
    from diffpose_tpu.ops.train_ref import make_dropout_masks

    num_timesteps = len(betas)
    rates = video_dropout_rates(model)
    prng = dropout == "prng"
    fwd = make_pallas_video_train_fn(
        model, block_b_fwd=block_b_fwd, block_b_bwd=block_b_bwd, group=group,
        precision=precision, dropout=dropout, interpret=interpret,
        vmem_limit_bytes=vmem_limit_bytes, rates=rates,
    )

    def train_step(state, batch: dict, key: Array):
        if data_axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        k_gmm, k_t, k_e, k_sp, k_tp = jax.random.split(key, 5)

        p3 = batch["poses_3d"]        # [B, F, J, 3]
        gmm = batch["poses_2d_gmm"]   # [B, F, J, K, 5]
        b, f, j = p3.shape[:3]

        uvxyz, noise_scale, _ = sample_gmm_batch(
            k_gmm, gmm.reshape(b * f, j, gmm.shape[3], 5),
            p3.reshape(b * f, j, 3))
        uvxyz = uvxyz.reshape(b, f, j, 5)
        noise_scale = noise_scale.reshape(b, f, j, 5)

        t = antithetic_timesteps(k_t, b, num_timesteps)
        e = jax.random.normal(k_e, uvxyz.shape, uvxyz.dtype) * noise_scale
        x_t = q_sample(uvxyz, t, e, betas)

        if prng:
            masks = jax.random.randint(
                k_sp, (1,), jnp.iinfo(jnp.int32).min,
                jnp.iinfo(jnp.int32).max, jnp.int32)
        else:
            masks = make_dropout_masks(
                k_sp, num_layers=model.num_layers, n_pts=j, batch=b * f,
                num_heads=model.num_heads, hid_dim=model.hid_dim, rates=rates)

        def loss_fn(params):
            eps = fwd(params, x_t, t.astype(jnp.float32), masks, k_tp)
            return jnp.mean(jnp.sum((e - eps) ** 2, axis=(1, 2, 3)))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
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
