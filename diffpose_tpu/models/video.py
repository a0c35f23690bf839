"""Video-based spatio-temporal diffusion denoiser with context parallelism.

The reference delegates its video-based variant (81/243-frame temporal
windows, MixSTE/PoseFormer-style) to an external repo (``README.md:92-93``);
it is a first-class model family here (BASELINE configs[4]).

Architecture: per-frame ChebConv embedding + learned temporal positional
embedding, then alternating

* **spatial blocks** — the same GraAttenLayer + timestep-injected residual
  ChebConv stack as the frame model, applied per frame over the 17-joint
  graph, and
* **temporal blocks** — pre-LN multi-head attention over the frame axis
  (per joint) with a 2-layer feed-forward.

Context parallelism (SURVEY §5): the *frame* axis is the long axis, so a
``cp_axis`` mesh dimension shards frames across chips.  Temporal attention
keeps queries local and ``all_gather``s keys/values over the axis (exact
attention, queries sharded) — the idiomatic CP scheme at these window
lengths (81/243 ≪ VMEM limits; ring attention is unnecessary).  With
``cp_axis=None`` the same module runs unsharded.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffpose_tpu.models.layers import (
    ChebGraphConv,
    GraAttenLayer,
    ResChebGCDiff,
    TorchDense,
    TorchStyleLayerNorm,
    timestep_embedding,
)

Array = jax.Array


class TemporalAttention(nn.Module):
    """MHA over the frame axis; queries stay local, K/V gathered over CP.

    ``attention_chunk > 0``: at/above that many KEY frames the inference
    path switches to :func:`diffpose_tpu.models.layers.chunked_attention`
    (query-chunked, never materializes the full [F, F] score matrix) — the
    beyond-VMEM regime the reference's ``eatten.py`` fallback targets.
    Training keeps the fused path (attention-prob dropout needs the
    materialized scores); at 81/243 frames the fused path is in-VMEM
    anyway, so the chunked path only ever engages for long-window
    inference.
    """

    num_heads: int
    dropout_rate: float = 0.1
    cp_axis: Optional[str] = None
    attention_chunk: int = 256

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        n, f_local, d = x.shape
        h = self.num_heads
        dk = d // h

        def split(y):
            return y.reshape(n, f_local, h, dk).transpose(0, 2, 1, 3)

        q = split(TorchDense(d, name="q")(x))
        k = split(TorchDense(d, name="k")(x))
        v = split(TorchDense(d, name="v")(x))

        if self.cp_axis is not None:
            # [n, h, F_total, dk] — contiguous frame blocks in axis order.
            k = jax.lax.all_gather(k, self.cp_axis, axis=2, tiled=True)
            v = jax.lax.all_gather(v, self.cp_axis, axis=2, tiled=True)

        use_chunked = (
            self.attention_chunk > 0
            and k.shape[2] >= self.attention_chunk
            and not train
        )
        if use_chunked:
            from diffpose_tpu.models.layers import chunked_attention

            out = chunked_attention(q, k, v, chunk_size=self.attention_chunk)
        else:
            scores = jnp.einsum("nhfd,nhgd->nhfg", q, k) / math.sqrt(dk)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
            out = jnp.einsum("nhfg,nhgd->nhfd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, f_local, d)
        return TorchDense(d, name="out")(out)


class TemporalBlock(nn.Module):
    """Pre-LN residual temporal attention + feed-forward (per joint)."""

    dim_model: int
    num_heads: int
    dropout_rate: float = 0.1
    cp_axis: Optional[str] = None
    attention_chunk: int = 256

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        y = TemporalAttention(
            self.num_heads, self.dropout_rate, self.cp_axis,
            self.attention_chunk, name="attn"
        )(TorchStyleLayerNorm(name="norm1")(x), train=train)
        x = x + nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = TorchStyleLayerNorm(name="norm2")(x)
        y = TorchDense(self.dim_model * 2, name="ff1")(y)
        y = nn.relu(y)
        y = TorchDense(self.dim_model, name="ff2")(y)
        x = x + nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return x


class SpatioTemporalDiff(nn.Module):
    """Spatio-temporal ε-prediction denoiser over [B, F, J, C] windows."""

    basis: Any
    frames: int                      # total window length (81 / 243)
    hid_dim: int = 96
    coords_in: int = 5
    coords_out: int = 5
    num_layers: int = 4
    num_heads: int = 4
    dropout_rate: float = 0.1
    n_pts: int = 17
    cp_axis: Optional[str] = None    # mesh axis name sharding the frame dim
    attention_chunk: int = 256       # chunked temporal attention threshold

    @property
    def emd_dim(self) -> int:
        return self.hid_dim * 4

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: Array,
        mask: Optional[Array] = None,
        *,
        train: bool = False,
    ) -> Array:
        """``x``: [B, F_local, J, C]; ``t``: [B].  Returns ε̂ same shape."""
        b, f_local, j, _ = x.shape

        temb = timestep_embedding(t, self.hid_dim)
        temb = TorchDense(self.emd_dim, name="temb_dense_0")(temb)
        temb = nn.swish(temb)
        temb = TorchDense(self.emd_dim, name="temb_dense_1")(temb)
        # Per-frame conditioning: repeat over the local frame count.
        temb_f = jnp.repeat(temb, f_local, axis=0)  # [B*F_local, emd]

        h = ChebGraphConv(self.hid_dim, self.basis, name="gconv_input")(
            x.reshape(b * f_local, j, -1)
        )
        h = h.reshape(b, f_local, j, self.hid_dim)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (self.frames, self.hid_dim),
        )
        if self.cp_axis is not None:
            start = jax.lax.axis_index(self.cp_axis) * f_local
            pos_local = jax.lax.dynamic_slice(pos, (start, 0), (f_local, self.hid_dim))
        else:
            assert f_local == self.frames, (f_local, self.frames)
            pos_local = pos
        h = h + pos_local[None, :, None, :]

        for i in range(self.num_layers):
            # spatial (per frame, over joints)
            hs = h.reshape(b * f_local, j, self.hid_dim)
            hs = GraAttenLayer(
                self.hid_dim, self.num_heads, self.n_pts, self.dropout_rate,
                name=f"spatial_atten_{i}",
            )(hs, mask, train=train)
            hs = ResChebGCDiff(
                self.hid_dim, self.hid_dim, self.basis, dropout_rate=0.1,
                name=f"spatial_res_{i}",
            )(hs, temb_f, train=train)
            h = hs.reshape(b, f_local, j, self.hid_dim)

            # temporal (per joint, over frames)
            ht = h.transpose(0, 2, 1, 3).reshape(b * j, f_local, self.hid_dim)
            ht = TemporalBlock(
                self.hid_dim, self.num_heads, self.dropout_rate, self.cp_axis,
                self.attention_chunk, name=f"temporal_{i}",
            )(ht, train=train)
            h = ht.reshape(b, j, f_local, self.hid_dim).transpose(0, 2, 1, 3)

        out = ChebGraphConv(self.coords_out, self.basis, name="gconv_output")(
            h.reshape(b * f_local, j, self.hid_dim)
        )
        return out.reshape(b, f_local, j, self.coords_out)
