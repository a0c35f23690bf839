"""Fused Pallas spatial stack for the video (spatio-temporal) denoiser.

The video model's spatial blocks — GraAttenLayer + timestep-injected
residual ChebConv per frame (``models/video.py:179-190``) — are exactly
the whole-network eval kernel's layer math at batch ``B·F``, so each one
runs as a single-layer instance of the VMEM-resident backbone kernel
(``ops/pallas_denoiser.make_pallas_backbone_fn``), weights as RUNTIME
operands.  Everything between stays XLA: timestep MLP, positional
embedding, the I/O ChebConvs (two small einsums), and the temporal
blocks (frame-axis attention — [F, F] GEMMs XLA already shapes well for
the MXU, and the K/V all-gather under context parallelism is an XLA
collective the kernel must not swallow).

Reference scope: the video family itself is delegated by the reference to
an external repo (``README.md:92-93``); this accelerates the first-class
family built per SURVEY §7.9 / BASELINE configs[4].
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffpose_tpu.models.layers import chunked_attention, timestep_embedding
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.ops.pallas_denoiser import make_pallas_backbone_fn

Array = jax.Array

__all__ = ["make_pallas_video_denoiser_fn"]


def _ln(p: Dict[str, Array], x: Array) -> Array:
    """TorchStyleLayerNorm: Bessel-corrected σ, eps OUTSIDE the sqrt
    (reference GraFormer.py:58-70; models/layers.py:217)."""
    dim = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.sum(centered * centered, axis=-1, keepdims=True) / (dim - 1)
    return p["scale"] * centered / (jnp.sqrt(var) + 1e-6) + p["bias"]


def _dense(p: Dict[str, Array], x: Array) -> Array:
    return x @ p["kernel"] + p["bias"]


def _temporal_block(p: Dict[str, Array], x: Array, num_heads: int,
                    cp_axis: Optional[str], attention_chunk: int) -> Array:
    """Eval-mode TemporalBlock (models/video.py:99-120): pre-LN MHA over
    the frame axis (K/V all-gathered over ``cp_axis``) + pre-LN 2-layer FF."""
    n, f_local, d = x.shape
    h = num_heads
    dk = d // h

    y = _ln(p["norm1"], x)
    a = p["attn"]

    def split(z):
        return z.reshape(n, f_local, h, dk).transpose(0, 2, 1, 3)

    q = split(_dense(a["q"], y))
    k = split(_dense(a["k"], y))
    v = split(_dense(a["v"], y))
    if cp_axis is not None:
        k = jax.lax.all_gather(k, cp_axis, axis=2, tiled=True)
        v = jax.lax.all_gather(v, cp_axis, axis=2, tiled=True)

    if attention_chunk > 0 and k.shape[2] >= attention_chunk:
        out = chunked_attention(q, k, v, chunk_size=attention_chunk)
    else:
        scores = jnp.einsum("nhfd,nhgd->nhfg", q, k) / math.sqrt(dk)
        out = jnp.einsum("nhfg,nhgd->nhfd", jax.nn.softmax(scores, -1), v)
    out = out.transpose(0, 2, 1, 3).reshape(n, f_local, d)
    x = x + _dense(a["out"], out)

    y = _ln(p["norm2"], x)
    y = nn.relu(_dense(p["ff1"], y))
    return x + _dense(p["ff2"], y)


def _cheb(basis: Array, x: Array, w: Array, b: Array) -> Array:
    """ChebGraphConv forward (models/layers.py:97-127)."""
    xk = jnp.einsum("knm,bmc->bnkc", basis, x)
    return jnp.einsum("bnkc,kcd->bnd", xk, w) + b


def make_pallas_video_denoiser_fn(
    model: SpatioTemporalDiff,
    *,
    block_b: int = 128,
    precision="bf16x3",
    interpret: bool = False,
    vmem_limit_bytes=None,
    group: int = 1,
    temporal_impl: str = "xla",
    tloop: bool = False,
):
    """Build ``fn(params, x [B,F,J,C], t [B]) → ε̂`` — the fused-kernel,
    eval-mode equivalent of ``model.apply({"params": params}, x, t)``.

    Weights enter as runtime operands (one compiled program serves every
    epoch's weights).  Composes with the video mesh: under context
    parallelism the temporal K/V all-gather stays an XLA collective; the
    spatial kernels see only the local ``B·F_local`` rows.

    ``temporal_impl="pallas"`` replaces the XLA temporal blocks with
    per-layer Pallas kernels (``pallas_video_full.make_pallas_temporal_
    layer_fn``) — every block kernel-resident without the co-resident
    monolith's compile pathology.  Owns whole frame windows, so it
    requires ``cp_axis=None``.
    """
    hid = model.hid_dim
    heads = model.num_heads
    basis = np.asarray(model.basis)
    basis_j = jnp.asarray(basis, jnp.float32)
    cp_axis = model.cp_axis
    f32 = jnp.float32

    spatial = make_pallas_backbone_fn(
        basis, num_layers=1, num_heads=heads, hid_dim=hid,
        block_b=block_b, interpret=interpret, precision=precision,
        vmem_limit_bytes=vmem_limit_bytes, group=group,
    )
    temporal_pallas = None
    if temporal_impl == "pallas":
        assert cp_axis is None, (
            "temporal_impl='pallas' kernels own complete frame windows; "
            "context parallelism keeps the XLA temporal path")
        # Lazy import: pallas_video_full imports _cheb from this module.
        from diffpose_tpu.ops.pallas_video_full import (
            _temporal_weight_stacks,
            make_pallas_temporal_layer_fn,
        )

        temporal_pallas = make_pallas_temporal_layer_fn(
            frames=model.frames, num_heads=heads, hid_dim=hid,
            precision=precision, interpret=interpret, tloop=tloop)
        temporal_stacks = functools.partial(
            _temporal_weight_stacks, num_layers=model.num_layers,
            num_heads=heads, hid_dim=hid)

    def fn(params: Dict[str, Any], x: Array, t: Array) -> Array:
        p = jax.tree_util.tree_map(lambda v: jnp.asarray(v, f32), params)
        b, f_local, j, _ = x.shape
        tstacks = temporal_stacks(p) if temporal_pallas is not None else None

        temb = timestep_embedding(t.astype(f32), hid)
        temb = nn.swish(_dense(p["temb_dense_0"], temb))
        temb = _dense(p["temb_dense_1"], temb)
        st = nn.swish(temb)

        h = _cheb(basis_j, x.reshape(b * f_local, j, -1).astype(f32),
                  p["gconv_input"]["w"], p["gconv_input"]["b"])
        h = h.reshape(b, f_local, j, hid)

        pos = p["pos_embed"]
        if cp_axis is not None:
            start = jax.lax.axis_index(cp_axis) * f_local
            pos = jax.lax.dynamic_slice(pos, (start, 0), (f_local, hid))
        else:
            assert f_local == model.frames, (f_local, model.frames)
        h = h + pos[None, :, None, :]

        for i in range(model.num_layers):
            res = p[f"spatial_res_{i}"]
            tp = _dense(res["temb_proj"], st)                 # [B, hid]
            tp = jnp.repeat(tp, f_local, axis=0)[None]        # [1, B·F, hid]
            sub = {
                "atten_0": p[f"spatial_atten_{i}"],
                "res_0": res,
                "gconv_input": p["gconv_input"],
                "gconv_output": p["gconv_output"],
            }
            hs = spatial(sub, h.reshape(b * f_local, j, hid), tp)
            h = hs.reshape(b, f_local, j, hid)

            ht = h.transpose(0, 2, 1, 3).reshape(b * j, f_local, hid)
            if temporal_pallas is not None:
                ht = temporal_pallas(tstacks, ht, i)
            else:
                ht = _temporal_block(p[f"temporal_{i}"], ht, heads,
                                     cp_axis, model.attention_chunk)
            h = ht.reshape(b, j, f_local, hid).transpose(0, 2, 1, 3)

        out = _cheb(basis_j, h.reshape(b * f_local, j, hid),
                    p["gconv_output"]["w"], p["gconv_output"]["b"])
        return out.reshape(b, f_local, j, model.coords_out)

    return fn
