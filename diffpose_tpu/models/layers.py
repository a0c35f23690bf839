"""Building blocks of the GraFormer-style denoiser, as Flax modules.

Numerics match the reference layer semantics exactly (verified by oracle
tests against the torch implementation on CPU):

* :class:`ChebGraphConv` — Chebyshev spectral graph convolution with the
  polynomial basis precomputed once (the reference rebuilds Laplacian +
  basis every forward: ``models/ChebConv.py:80-81``).
* :class:`TorchStyleLayerNorm` — the reference's custom LayerNorm divides
  by ``std + eps`` with *Bessel-corrected* std (``models/GraFormer.py:58-70``),
  which is not standard LN; replicated here for checkpoint parity.
* :class:`MultiHeadAttention` — classic scaled-dot-product MHA over the 17
  joints (``models/GraFormer.py:99-140``).
* :class:`GraphNet` — two learned-adjacency graph convolutions used as the
  "feed-forward" of each attention layer (``models/GraFormer.py:162-201``).
* :class:`GraAttenLayer` — pre-LN residual attention + GraphNet FFN
  (``models/GraFormer.py:73-96``).
* :class:`ResChebGCDiff` — two-conv residual block with timestep-embedding
  injection between the convs (``models/gcndiff.py:39-53``).

All matmul-bearing ops are expressed so XLA maps them onto the MXU as a
small number of large GEMMs per call: per-joint linears fold ``(B, N)``
into a single row dimension, and the Chebyshev contraction folds
``(K+1, C)`` into a single reduction dimension.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# Initializers replicating torch defaults (for training-parity statistics)
# ---------------------------------------------------------------------------


def cheb_kernel_init(num_terms: int) -> Callable:
    """Xavier-normal matched to the reference's ``[K+1, 1, in, out]`` layout.

    torch's ``xavier_normal_`` on that shape gives
    ``std = sqrt(2 / ((K+2) · in · out))`` (fan_in = in·out, fan_out =
    (K+1)·in·out) — replicated so training starts from the same
    distribution (reference ``models/ChebConv.py:63-64``).
    """

    def init(key, shape, dtype=jnp.float32):
        k1, in_c, out_c = shape
        assert k1 == num_terms
        std = math.sqrt(2.0 / ((num_terms + 1) * in_c * out_c))
        return jax.random.normal(key, shape, dtype) * std

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch ``nn.Linear`` default: U(−1/√fan_in, 1/√fan_in) on a [in, out] kernel."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with torch's default initialization (kernel is [in, out])."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init, (in_dim, self.features))
        bias = self.param("bias", torch_linear_bias_init(in_dim), (self.features,))
        return x @ kernel + bias


# ---------------------------------------------------------------------------
# Graph convolutions
# ---------------------------------------------------------------------------


class ChebGraphConv(nn.Module):
    """Chebyshev graph convolution ``Σ_k T_k(L) · X · W_k + b``.

    ``basis`` is the precomputed ``[K+1, N, N]`` Chebyshev stack from
    :func:`diffpose_tpu.graph.cheb_basis_from_edges` — a compile-time
    constant.  The contraction is laid out as two GEMMs:
    ``[K1·N, N] @ [N, B·C]`` (graph mixing, small K) followed by
    ``[B·N, K1·C] @ [K1·C, D]`` (channel mixing, MXU-sized for real
    batches).
    """

    features: int
    basis: Any  # np.ndarray [K+1, N, N]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        basis = jnp.asarray(self.basis, x.dtype)
        k1, n, _ = basis.shape
        c = x.shape[-1]
        w = self.param("w", cheb_kernel_init(k1), (k1, c, self.features))
        # Graph mixing: bnkc[b, n, k, c] = Σ_m basis[k, n, m] x[b, m, c]
        xk = jnp.einsum("knm,bmc->bnkc", basis, x)
        y = jnp.einsum(
            "bnkc,kcd->bnd", xk, jnp.asarray(w, x.dtype),
            preferred_element_type=x.dtype,
        )
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.features,))
            y = y + jnp.asarray(b, x.dtype)
        return y


class GraphConvBlock(nn.Module):
    """ChebConv + ReLU (+ dropout) wrapper, reference ``_GraphConv``.

    The reference applies ``relu`` before dropout and then ``relu`` again
    (``models/ChebConv.py:145-151``); replicated verbatim (second relu is a
    no-op in eval but changes the dropout statistics in training).
    """

    features: int
    basis: Any
    dropout_rate: Optional[float] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = ChebGraphConv(self.features, self.basis, name="gconv")(x)
        if self.dropout_rate is not None:
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.relu(x)


class ResChebGC(nn.Module):
    """Two-conv residual block (reference ``_ResChebGC``, ChebConv.py:154-165)."""

    features: int
    hid_dim: int
    basis: Any
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        out = GraphConvBlock(self.hid_dim, self.basis, self.dropout_rate, name="gconv1")(
            x, train=train
        )
        out = GraphConvBlock(self.features, self.basis, self.dropout_rate, name="gconv2")(
            out, train=train
        )
        return x + out


class ChebNet(nn.Module):
    """Plain two-conv graph net (reference ``ChebNet``, ChebConv.py:168-178)."""

    features: int
    hid_dim: int
    basis: Any
    dropout_rate: Optional[float] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        x = GraphConvBlock(self.hid_dim, self.basis, self.dropout_rate, name="gconv1")(
            x, train=train
        )
        return GraphConvBlock(self.features, self.basis, self.dropout_rate, name="gconv2")(
            x, train=train
        )


class ResChebGCDiff(nn.Module):
    """Residual block with timestep embedding injected between the convs.

    ``out = gconv2(gconv1(x) + W_t · swish(temb)); return x + out``
    (reference ``models/gcndiff.py:39-53``).
    """

    features: int
    hid_dim: int
    basis: Any
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, temb: Array, *, train: bool = False) -> Array:
        out = GraphConvBlock(self.hid_dim, self.basis, self.dropout_rate, name="gconv1")(
            x, train=train
        )
        out = out + TorchDense(self.hid_dim, name="temb_proj")(nn.swish(temb))[:, None, :]
        out = GraphConvBlock(self.features, self.basis, self.dropout_rate, name="gconv2")(
            out, train=train
        )
        return x + out


# ---------------------------------------------------------------------------
# Attention stack
# ---------------------------------------------------------------------------


class TorchStyleLayerNorm(nn.Module):
    """LayerNorm variant: ``a·(x−μ)/(σ+eps)+b`` with Bessel-corrected σ.

    Matches the reference's custom LayerNorm (``models/GraFormer.py:58-70``),
    which uses ``x.std()`` (unbiased, n−1) and adds eps *outside* the sqrt.
    """

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        centered = x - mean
        var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (dim - 1)
        std = jnp.sqrt(var)
        return scale * centered / (std + self.eps) + bias


class MultiHeadAttention(nn.Module):
    """Scaled-dot-product MHA over the joint axis.

    Reference ``attention`` + ``MultiHeadedAttention``
    (``models/GraFormer.py:99-140``): mask==0 positions are filled with
    −1e9 before softmax; dropout is applied to the attention probabilities.
    The 17-joint sequence makes each head's score matrix tiny — XLA batches
    the per-head GEMMs; the Pallas fused-block kernel handles the
    production path.
    """

    num_heads: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None, *, train: bool = False) -> Array:
        b, n, d = x.shape
        h = self.num_heads
        assert d % h == 0, "d_model must divide num_heads"
        dk = d // h

        def split(y):
            return y.reshape(b, n, h, dk).transpose(0, 2, 1, 3)

        q = split(TorchDense(d, name="q")(x))
        k = split(TorchDense(d, name="k")(x))
        v = split(TorchDense(d, name="v")(x))

        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(dk)
        if mask is not None:
            scores = jnp.where(mask[:, None] == 0, jnp.asarray(-1e9, scores.dtype), scores)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return TorchDense(d, name="out")(out)


class PositionwiseFeedForward(nn.Module):
    """Classic transformer FFN (reference ``models/GraFormer.py:143-155``).

    Defined-but-unused in the reference's GraAttenLayer (the FFN slot is a
    GraphNet); kept for API parity and used by the temporal blocks of the
    video model family.
    """

    d_ff: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        d_model = x.shape[-1]
        y = nn.relu(TorchDense(self.d_ff, name="w1")(x))
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return TorchDense(d_model, name="w2")(y)


class GraphNet(nn.Module):
    """Learned-adjacency two-layer GCN used as the attention FFN.

    ``Â`` is a trainable ``n_pts×n_pts`` parameter initialized to identity;
    each call sym-normalizes it (column-sum degrees + 1e-5) and applies
    ``relu(fc1(L X))`` then ``fc2(L X)`` with hidden width 2× input
    (reference ``models/GraFormer.py:162-201``).
    """

    features: int
    n_pts: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        a_hat = self.param(
            "a_hat", lambda key, shape: jnp.eye(shape[0]), (self.n_pts, self.n_pts)
        )
        d = (jnp.sum(a_hat, axis=0) + 1e-5) ** -0.5
        lap = (d[:, None] * a_hat * d[None, :]).astype(x.dtype)
        in_dim = x.shape[-1]
        x = nn.relu(TorchDense(in_dim * 2, name="fc1")(jnp.einsum("nm,bmc->bnc", lap, x)))
        x = TorchDense(self.features, name="fc2")(jnp.einsum("nm,bmc->bnc", lap, x))
        return x


class GraAttenLayer(nn.Module):
    """Pre-LN residual: attention sublayer then GraphNet "FFN" sublayer.

    ``x = x + drop(attn(LN(x)));  x = x + drop(gnet(LN(x)))``
    (reference ``SublayerConnection``/``GraAttenLayer``,
    ``models/GraFormer.py:73-96``).
    """

    dim_model: int
    num_heads: int
    n_pts: int
    dropout_rate: float = 0.25
    attn_dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None, *, train: bool = False) -> Array:
        attn = MultiHeadAttention(self.num_heads, self.attn_dropout_rate, name="attn")
        gnet = GraphNet(self.dim_model, self.n_pts, name="gnet")
        y = attn(TorchStyleLayerNorm(name="norm1")(x), mask, train=train)
        x = x + nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = gnet(TorchStyleLayerNorm(name="norm2")(x))
        x = x + nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return x


def chunked_attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array] = None,
    chunk_size: int = 128,
) -> Array:
    """Query-chunked scaled-dot-product attention.

    Memory-bounded equivalent of the reference's fallback in
    ``models/eatten.py:33-75``: processes query chunks against the full
    K/V so the full scores matrix is never materialized.  The 17-joint
    graph never needs this (it fits VMEM outright — see the fused kernel);
    it exists for very long temporal windows in the video family.

    ``q, k, v``: [B, H, S, D]; ``mask`` broadcastable to [B, H, S, S].
    Implemented as a ``lax.map`` over query chunks (static shapes).  A query
    length that is not a multiple of ``chunk_size`` is zero-padded up to one
    (exact: every query row attends independently, and the padded rows are
    sliced off before returning).
    """
    b, h, s, d = q.shape
    sk = k.shape[2]
    scale = 1.0 / math.sqrt(d)
    if s <= chunk_size:
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        if mask is not None:
            scores = jnp.where(mask == 0, jnp.asarray(-1e9, scores.dtype), scores)
        return jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(scores, -1), v)

    pad = (-s) % chunk_size
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    s_pad = s + pad
    qc = q.reshape(b, h, s_pad // chunk_size, chunk_size, d).transpose(2, 0, 1, 3, 4)
    if mask is not None:
        # Pad query rows with 1s (unmasked): their outputs are discarded, but
        # an all-masked row would produce NaNs that could poison XLA fusions.
        mask_full = jnp.broadcast_to(mask, (b, h, s, sk))
        if pad:
            mask_full = jnp.pad(mask_full, ((0, 0), (0, 0), (0, pad), (0, 0)),
                                constant_values=1)

    def one(args):
        q_chunk, idx = args
        scores = jnp.einsum("bhnd,bhmd->bhnm", q_chunk, k) * scale
        if mask is not None:
            m = jax.lax.dynamic_slice_in_dim(
                mask_full, idx * chunk_size, chunk_size, axis=2
            )
            scores = jnp.where(m == 0, jnp.asarray(-1e9, scores.dtype), scores)
        return jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(scores, -1), v)

    out = jax.lax.map(one, (qc, jnp.arange(s_pad // chunk_size)))
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, h, s_pad, d)
    return out[:, :, :s] if pad else out


# ---------------------------------------------------------------------------
# Timestep embedding
# ---------------------------------------------------------------------------


def timestep_embedding(t: Array, dim: int) -> Array:
    """Sinusoidal diffusion-timestep embedding (DDPM/tensor2tensor form).

    ``freqs = exp(−log(10000) · i/(half−1))``, concat(sin, cos), zero-pad if
    odd — matches reference ``get_timestep_embedding``
    (``models/gcndiff.py:15-33``).
    """
    assert t.ndim == 1
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
