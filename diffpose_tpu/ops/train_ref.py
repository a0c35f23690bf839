"""Pure-JAX reference for the fused TRAIN forward (explicit dropout masks).

The fused Pallas train step (``ops/pallas_train.py``) computes the GCNDiff
training forward+backward as two whole-network kernels.  Dropout makes the
training forward stochastic; to keep the kernels testable (and the
fwd/bwd mask agreement trivial) the masks are **explicit kernel inputs**,
generated once per step in XLA with the exact flax semantics
(``mask ~ Bernoulli(keep); y = where(mask, x/keep, 0)`` — flax
``nn.Dropout``).  This module is the *oracle*: the same math as the
kernels, written in plain JAX so that

* the forward can be checked against ``GCNDiff.apply(train=True)`` with
  all dropout rates at zero (exact), and against the kernels with any
  masks (exact up to float reassociation);
* ``jax.grad`` of this reference provides the ground-truth gradients the
  hand-written backward kernel is tested against.

Weight layout = ``ops.pallas_denoiser._prep_weights`` (stacked per-layer
tensors, attention score scale folded into the q projection).  Activations
are joint-major ``[N=17, B, C]`` exactly as in the kernels.

Reference semantics being replicated (dropout sites, reference file:line):

* attention-prob dropout, rate 0.1   — ``models/GraFormer.py:99-140``
* post-sublayer dropout,   rate 0.25 — ``models/GraFormer.py:73-96``
* cheb-block dropout,      rate 0.1  — ``models/ChebConv.py:145-151`` via
  ``models/gcndiff.py:84`` (relu → dropout → relu; the second relu is a
  mathematical no-op since dropout preserves sign — exploited here).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# dropout rates (reference values; see module docstring)
RATE_ATTN_PROBS = 0.1
RATE_SUBLAYER = 0.25
RATE_CHEB = 0.1


class DropoutMasks(NamedTuple):
    """0/1 masks for every dropout site, joint-major, stacked over layers."""

    probs: Array      # [L, N, N, B, heads]  (query, key)
    attn_out: Array   # [L, N, B, H]
    gnet_out: Array   # [L, N, B, H]
    cheb1: Array      # [L, N, B, H]
    cheb2: Array      # [L, N, B, H]


def make_dropout_masks(
    key: Array, *, num_layers: int, n_pts: int, batch: int,
    num_heads: int, hid_dim: int, dtype=jnp.float32, rates=None,
) -> DropoutMasks:
    """Draw all masks for one step (flax ``nn.Dropout`` semantics:
    ``bernoulli(keep_prob)``).  ``rates``: optional
    ``(p_attn_probs, p_sublayer, p_cheb)`` override (the video family's
    spatial blocks use a non-reference sublayer rate)."""
    p_probs, p_sub, p_cheb = rates or (RATE_ATTN_PROBS, RATE_SUBLAYER, RATE_CHEB)
    kp, k1, k2, k3, k4 = jax.random.split(key, 5)
    l, n, b, h, hd = num_layers, n_pts, batch, num_heads, hid_dim
    bern = lambda k, rate, shape: jax.random.bernoulli(
        k, 1.0 - rate, shape).astype(dtype)
    return DropoutMasks(
        probs=bern(kp, p_probs, (l, n, n, b, h)),
        attn_out=bern(k1, p_sub, (l, n, b, hd)),
        gnet_out=bern(k2, p_sub, (l, n, b, hd)),
        cheb1=bern(k3, p_cheb, (l, n, b, hd)),
        cheb2=bern(k4, p_cheb, (l, n, b, hd)),
    )


def _ln(z: Array, scale: Array, bias: Array, h_dim: int) -> Array:
    """Torch-style LayerNorm: Bessel std, eps OUTSIDE the sqrt
    (``models/GraFormer.py:58-70``)."""
    mean = jnp.mean(z, axis=-1, keepdims=True)
    c = z - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / (h_dim - 1)
    return scale * c / (jnp.sqrt(var) + 1e-6) + bias


def _cheb(z: Array, w3: Array, bias: Array, basis: Array) -> Array:
    """``Σ_k T_k · (z @ W_k) + b`` over the leading joint axis."""
    u = jnp.einsum("nbc,kcd->knbd", z, w3)
    return jnp.einsum("knm,kmbd->nbd", basis, u) + bias


def layers_forward(
    weights: Dict[str, Array],
    h: Array,                 # [N, B, H] — cheb_input output, joint-major
    tp: Array,                # [L, B, H] — per-layer swish(temb) projections
    masks: DropoutMasks,
    *,
    basis: Array,             # [K+1, N, N]
    num_layers: int,
    num_heads: int,
    hid_dim: int,
    rates=None,               # (p_attn_probs, p_sublayer, p_cheb) override
) -> Array:
    """The L-layer GraAttenLayer+ResChebGCDiff stack, training mode."""
    p_probs, p_sub, p_cheb = rates or (RATE_ATTN_PROBS, RATE_SUBLAYER, RATE_CHEB)
    n_pts = h.shape[0]
    dk = hid_dim // num_heads
    kp_p = 1.0 - p_probs
    kp_s = 1.0 - p_sub
    kp_c = 1.0 - p_cheb
    w = weights
    basis = jnp.asarray(basis, h.dtype)

    for l in range(num_layers):
        # ---- attention sublayer (scores scale pre-folded into Wq) ----
        y1 = _ln(h, w["ln1s"][l], w["ln1b"][l], hid_dim)
        qkv = jnp.einsum("nbc,cd->nbd", y1, w["wqkv"][l]) + w["bqkv"][l]
        q = qkv[..., :hid_dim].reshape(n_pts, -1, num_heads, dk)
        k = qkv[..., hid_dim:2 * hid_dim].reshape(n_pts, -1, num_heads, dk)
        v = qkv[..., 2 * hid_dim:].reshape(n_pts, -1, num_heads, dk)
        s = jnp.einsum("nbhd,mbhd->nmbh", q, k)
        p = jax.nn.softmax(s, axis=1)
        pd = p * masks.probs[l] / kp_p
        att = jnp.einsum("nmbh,mbhd->nbhd", pd, v).reshape(n_pts, -1, hid_dim)
        o1 = jnp.einsum("nbc,cd->nbd", att, w["wao"][l]) + w["bao"][l]
        h = h + o1 * masks.attn_out[l] / kp_s

        # ---- GraphNet sublayer ----
        y2 = _ln(h, w["ln2s"][l], w["ln2b"][l], hid_dim)
        g1 = jnp.einsum("nm,mbc->nbc", w["lap"][l], y2)
        r1 = jax.nn.relu(jnp.einsum("nbc,cd->nbd", g1, w["wfc1"][l]) + w["bfc1"][l])
        g2 = jnp.einsum("nm,mbc->nbc", w["lap"][l], r1)
        f2 = jnp.einsum("nbc,cd->nbd", g2, w["wfc2"][l]) + w["bfc2"][l]
        h = h + f2 * masks.gnet_out[l] / kp_s

        # ---- residual Chebyshev block with timestep injection ----
        rc1 = jax.nn.relu(_cheb(h, w["wg1"][l], w["bg1"][l], basis))
        u = rc1 * masks.cheb1[l] / kp_c + tp[l][None]
        rd1 = jax.nn.relu(_cheb(u, w["wg2"][l], w["bg2"][l], basis))
        h = h + rd1 * masks.cheb2[l] / kp_c
    return h


def train_forward(
    params: Dict[str, Any],
    basis: np.ndarray,
    x: Array,                 # [B, N, C_in]
    t: Array,                 # [B]
    masks: DropoutMasks,
    *,
    num_layers: int = 5,
    num_heads: int = 4,
    hid_dim: int = 96,
) -> Array:
    """Full GCNDiff training forward from raw params (oracle only — the
    production path uses the prepped weight stack + kernels)."""
    from flax import linen as nn

    from diffpose_tpu.models.layers import timestep_embedding
    from diffpose_tpu.ops.pallas_denoiser import _prep_weights

    weights, _, _, _ = _prep_weights(params, basis, num_layers, num_heads, hid_dim)
    f32 = jnp.float32
    temb = timestep_embedding(t, hid_dim)
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

    bas = jnp.asarray(basis, f32)
    xj = jnp.transpose(x.astype(f32), (1, 0, 2))
    h = _cheb(xj, weights["win"], weights["bin_"], bas)
    h = layers_forward(
        weights, h, tp, masks, basis=bas,
        num_layers=num_layers, num_heads=num_heads, hid_dim=hid_dim,
    )
    out = _cheb(h, weights["wout"], weights["bout"], bas)
    return jnp.transpose(out, (1, 0, 2))
