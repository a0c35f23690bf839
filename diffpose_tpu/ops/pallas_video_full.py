"""Fused spatio-temporal Pallas kernels for the video denoiser.

Round 4 fused only the video model's spatial blocks
(``ops/pallas_video.py``); the temporal blocks stayed XLA, so every layer
alternated between a kernel and an XLA attention stack.  Here each layer's
spatial AND temporal block run inside ONE kernel:

* spatial phase  — ``[J, BB·F, H]`` (joint-major; rows = (window, frame)),
  the shared GraAttenLayer+ResChebGCDiff body
  (``pallas_denoiser._gra_layer_eval``) exactly as the frame family runs
  it at batch ``BB·F``;
* temporal phase — ``[F, BB·J, H]`` (frame-major; rows = (window, joint)),
  pre-LN MHA over frames + the 2-layer FF through the same segment-matrix
  attention (``pallas_denoiser._seg_attention``) with the FRAME axis as
  the attention axis — the batched [F,F] attention becomes elementwise
  products + thin exact-0/1 GEMMs, the MXU-friendly form of the
  reference's ``eatten.py:33-75`` semantics.

The 4-D transposes between phases are VMEM-internal relayouts (the
minor-most lane dim H never moves).

``layers_per_call`` controls fusion granularity: the default 1 compiles a
single 1-layer program that is REUSED for every layer with sliced weight
stacks (weights are runtime operands) — the activation round-trips
[J,BB·F,H] through HBM between layers (~0.15 ms/forward at b=16/f=81,
measured negligible) but the program stays small enough for this
environment's remote-compile service.  ``layers_per_call=num_layers`` is
the true monolith (whole forward VMEM-resident); it compiles to the same
numerics but sits in the >25 min compile-pathology class documented in
docs/PERF.md, so it is opt-in.  The input/output ChebConvs, positional
embedding, and timestep MLP stay XLA (two small einsums + elementwise).

Reference scope: the video family is delegated by the reference to an
external repo (``README.md:92-93``); this completes the TPU-first
treatment of the first-class family built per SURVEY §7.9.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffpose_tpu.models.layers import timestep_embedding
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.ops.pallas_denoiser import (
    _W_ORDER_BACKBONE,
    _dot,
    _full_spec,
    _gra_layer_eval,
    _layer_norm,
    _seg_attention,
    _segment_matrices,
    _sparse_terms,
    _weight_stacks,
)
from diffpose_tpu.ops.pallas_video import _cheb as _cheb_bm

Array = jax.Array

__all__ = ["make_pallas_video_full_fn", "make_pallas_temporal_layer_fn"]

# Temporal weight-ref order — must match the unpacking in `_temporal_layer`.
_T_ORDER = (
    "tln1s", "tln1b", "tln2s", "tln2b",
    "twqkv", "tbqkv", "twao", "tbao",
    "tff1", "tbff1", "tff2", "tbff2",
)


def _temporal_weight_stacks(params: Dict[str, Any], num_layers: int,
                            num_heads: int, hid_dim: int) -> Dict[str, Array]:
    """Stack the temporal blocks' weights ([L, ...] leading layer axis).

    Traceable (pure jnp), so the stacks build INSIDE the jitted step from
    runtime params.  The attention score scale 1/√dk is folded into the q
    projection (weights and bias), mirroring ``_weight_stacks``.
    """
    f32 = jnp.float32

    def stack(fn):
        return jnp.stack([fn(i) for i in range(num_layers)]).astype(f32)

    t = lambda i: params[f"temporal_{i}"]
    w = dict(
        tln1s=stack(lambda i: t(i)["norm1"]["scale"]),
        tln1b=stack(lambda i: t(i)["norm1"]["bias"]),
        tln2s=stack(lambda i: t(i)["norm2"]["scale"]),
        tln2b=stack(lambda i: t(i)["norm2"]["bias"]),
        twqkv=stack(lambda i: jnp.concatenate(
            [t(i)["attn"][x]["kernel"] for x in ("q", "k", "v")], axis=1)),
        tbqkv=stack(lambda i: jnp.concatenate(
            [t(i)["attn"][x]["bias"] for x in ("q", "k", "v")])),
        twao=stack(lambda i: t(i)["attn"]["out"]["kernel"]),
        tbao=stack(lambda i: t(i)["attn"]["out"]["bias"]),
        tff1=stack(lambda i: t(i)["ff1"]["kernel"]),
        tbff1=stack(lambda i: t(i)["ff1"]["bias"]),
        tff2=stack(lambda i: t(i)["ff2"]["kernel"]),
        tbff2=stack(lambda i: t(i)["ff2"]["bias"]),
    )
    scale = 1.0 / math.sqrt(hid_dim // num_heads)
    w["twqkv"] = w["twqkv"].at[:, :, :hid_dim].multiply(scale)
    w["tbqkv"] = w["tbqkv"].at[:, :hid_dim].multiply(scale)
    return w


def _temporal_layer(h, l, t_refs, seg_c, segt_c, *, frames, num_heads, h_dim,
                    precision, tgroup, tloop, act):
    """One eval-mode TemporalBlock (``models/video.py:99-120``) on
    ``[F, TB, H]`` (frame-major rows): pre-LN MHA over the frame axis +
    pre-LN 2-layer feed-forward, both residual."""
    (tln1s_ref, tln1b_ref, tln2s_ref, tln2b_ref,
     twqkv_ref, tbqkv_ref, twao_ref, tbao_ref,
     tff1_ref, tbff1_ref, tff2_ref, tbff2_ref) = t_refs
    tb = h.shape[1]

    y = _layer_norm(h, tln1s_ref[l], tln1b_ref[l], h_dim)
    qkv = _dot(y.reshape(frames * tb, h_dim), twqkv_ref[l], precision) + tbqkv_ref[l]
    qkv = qkv.reshape(frames, tb, 3 * h_dim).astype(act)
    q = qkv[..., :h_dim]
    k = qkv[..., h_dim:2 * h_dim]
    v = qkv[..., 2 * h_dim:]
    att = _seg_attention(q, k, v, seg_c, segt_c, n_pts=frames, tb=tb,
                         num_heads=num_heads, h_dim=h_dim,
                         precision=precision, group=tgroup, loop=tloop)
    att = (
        _dot(att.reshape(frames * tb, h_dim), twao_ref[l], precision) + tbao_ref[l]
    ).reshape(frames, tb, h_dim)
    h = (h + att).astype(act)

    y = _layer_norm(h, tln2s_ref[l], tln2b_ref[l], h_dim)
    y = jax.nn.relu(
        _dot(y.reshape(frames * tb, h_dim), tff1_ref[l], precision) + tbff1_ref[l]
    )
    y = (
        _dot(y, tff2_ref[l], precision) + tbff2_ref[l]
    ).reshape(frames, tb, h_dim)
    return (h + y).astype(act)


def _st_kernel(
    h_ref, tp_ref, *refs,
    terms, n_pts, frames, block_b, layers, num_heads, h_dim,
    precision, group, tgroup, tloop,
):
    """``layers`` spatial+temporal layer pairs on ``block_b`` windows."""
    s_refs = tuple(refs[:17])          # _W_ORDER_BACKBONE layer stacks
    rest = refs[17:]
    t_refs = tuple(rest[:12])          # _T_ORDER temporal stacks
    seg_ref, segt_ref, o_ref = rest[12:]
    seg_c = seg_ref[...]
    segt_c = segt_ref[...]
    act = jnp.bfloat16 if precision == "bf16" else jnp.float32

    h = h_ref[...].astype(act)                            # [J, BB·F, H]
    for l in range(layers):
        h = _gra_layer_eval(
            h, l, s_refs, seg_c, segt_c, tp_ref[l],
            terms=terms, n_pts=n_pts, num_heads=num_heads, h_dim=h_dim,
            precision=precision, group=group, act=act,
        )
        # [J, BB, F, H] → [F, BB, J, H]: frame-major for the temporal phase
        ht = h.reshape(n_pts, block_b, frames, h_dim).transpose(2, 1, 0, 3)
        ht = ht.reshape(frames, block_b * n_pts, h_dim)
        ht = _temporal_layer(
            ht, l, t_refs, seg_c, segt_c, frames=frames, num_heads=num_heads,
            h_dim=h_dim, precision=precision, tgroup=tgroup, tloop=tloop,
            act=act,
        )
        h = ht.reshape(frames, block_b, n_pts, h_dim).transpose(2, 1, 0, 3)
        h = h.reshape(n_pts, block_b * frames, h_dim)

    o_ref[...] = h.astype(o_ref.dtype)


def make_pallas_video_full_fn(
    model: SpatioTemporalDiff,
    *,
    block_b: int = 8,
    tgroup: int = 1,
    tloop: bool = True,
    layers_per_call: int = 1,
    precision="bf16x3",
    interpret: bool = False,
    vmem_limit_bytes: int | None = 64 * 2**20,
    group: int = 1,
):
    """Build ``fn(params, x [B,F,J,C], t [B]) → ε̂`` — every spatial AND
    temporal block fused into Pallas kernels, weights as runtime operands
    (drop-in for ``ops.pallas_video.make_pallas_video_denoiser_fn``).

    ``block_b``: video windows per grid step (each step holds the full
    [BB, F, J, H] activation in VMEM).  Mosaic requires the block's row
    count ``block_b·F`` to be divisible by 8, so for odd frame counts
    (81/243) ``block_b`` is rounded up to the needed multiple.
    ``tgroup``: query frames per temporal-attention segment GEMM (bigger
    → fewer, longer GEMMs but a ``tgroup``× score workspace).
    ``tloop``: run the temporal query sweep as an in-kernel
    ``lax.fori_loop`` (tgroup=1 only).  Required at real frame counts:
    unrolling 81 query iterations per layer OOMs this environment's
    remote-compile helper (measured, docs/PERF.md round 5).
    ``layers_per_call``: layers fused per pallas_call — 1 (default)
    compiles one small reusable program; ``model.num_layers`` is the
    VMEM-resident monolith (compile-pathological through this
    environment's remote-compile service; see module docstring).
    ``group``: query joints per spatial-attention GEMM.
    """
    assert model.cp_axis is None, (
        "the fused video kernels own complete windows; build the model "
        "with cp_axis=None (context parallelism keeps the module path)")
    hid = model.hid_dim
    heads = model.num_heads
    num_layers = model.num_layers
    frames = model.frames
    assert num_layers % layers_per_call == 0, (num_layers, layers_per_call)
    basis = np.asarray(model.basis)
    basis_j = jnp.asarray(basis, jnp.float32)
    n_pts = basis.shape[1]
    terms = _sparse_terms(np.asarray(basis, np.float64))
    seg_j, segt_j = _segment_matrices(heads, hid)
    act = jnp.bfloat16 if precision == "bf16" else jnp.float32
    seg_j, segt_j = seg_j.astype(act), segt_j.astype(act)  # exact 0/1
    f32 = jnp.float32

    def fn(params: Dict[str, Any], x: Array, t: Array) -> Array:
        p = jax.tree_util.tree_map(lambda v: jnp.asarray(v, f32), params)
        b, f, j, c_in = x.shape
        assert f == frames and j == n_pts, (x.shape, frames, n_pts)

        # Weight stacks (traceable; runtime operands).  The spatial stacks
        # reuse the frame family's builder through a pseudo-params view.
        pseudo = {
            "gconv_input": p["gconv_input"],
            "gconv_output": p["gconv_output"],
            **{f"atten_{i}": p[f"spatial_atten_{i}"] for i in range(num_layers)},
            **{f"res_{i}": p[f"spatial_res_{i}"] for i in range(num_layers)},
        }
        weights = _weight_stacks(pseudo, num_layers, heads, hid)
        tweights = _temporal_weight_stacks(p, num_layers, heads, hid)
        # `lap` stays f32: the kernel reads its entries as scalars
        # (Mosaic supports only 32-bit scalar vector.extracts).
        s_args = [weights[k].astype(act if k != "lap" else f32)
                  for k in _W_ORDER_BACKBONE]
        t_args = [tweights[k].astype(act) for k in _T_ORDER]

        # Timestep path in XLA (tiny): MLP + per-layer projections, one
        # [B·F, H] row block per layer.
        temb = timestep_embedding(t.astype(f32), hid)
        temb = nn.swish(temb @ jnp.asarray(p["temb_dense_0"]["kernel"], f32)
                        + p["temb_dense_0"]["bias"])
        temb = temb @ jnp.asarray(p["temb_dense_1"]["kernel"], f32) \
            + p["temb_dense_1"]["bias"]
        st = nn.swish(temb)
        tp = jnp.stack([
            jnp.repeat(st @ p[f"spatial_res_{i}"]["temb_proj"]["kernel"]
                       + p[f"spatial_res_{i}"]["temb_proj"]["bias"],
                       frames, axis=0)
            for i in range(num_layers)
        ]).astype(act)                                    # [L, B·F, H]

        # Mosaic block constraint: the sliced row dim (BB·F) must be a
        # multiple of 8 (sublane tile).  81-frame windows force BB to a
        # multiple of 8; 8-frame test windows allow BB=1.
        need = 8 // math.gcd(frames, 8)
        bb = max(min(block_b, b), 1)
        bb = ((bb + need - 1) // need) * need
        pad = (-b) % bb
        rows = bb * frames

        # Input ChebConv + positional embedding in XLA (two small einsums).
        h = _cheb_bm(basis_j, x.reshape(b * frames, j, c_in).astype(f32),
                     p["gconv_input"]["w"], p["gconv_input"]["b"])
        h = h.reshape(b, frames, j, hid) \
            + jnp.asarray(p["pos_embed"], f32)[None, :, None, :]
        hj = jnp.transpose(h.reshape(b * frames, j, hid), (1, 0, 2))
        if pad:
            hj = jnp.pad(hj, ((0, 0), (0, pad * frames), (0, 0)))
            tp = jnp.pad(tp, ((0, 0), (0, pad * frames), (0, 0)))
        bp = b + pad

        lpc = layers_per_call
        kernel = functools.partial(
            _st_kernel,
            terms=terms, n_pts=n_pts, frames=frames, block_b=bb,
            layers=lpc, num_heads=heads, h_dim=hid,
            precision=precision, group=group, tgroup=tgroup,
            tloop=(tloop and tgroup == 1),
        )
        hj = hj.astype(act)
        for c in range(num_layers // lpc):
            sl = slice(c * lpc, (c + 1) * lpc)
            hj = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n_pts, bp * frames, hid), act),
                grid=(bp // bb,),
                in_specs=[
                    pl.BlockSpec((n_pts, rows, hid), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((lpc, rows, hid), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM),
                    *[_full_spec(w[sl].shape) for w in s_args],
                    *[_full_spec(w[sl].shape) for w in t_args],
                    _full_spec(seg_j.shape), _full_spec(segt_j.shape),
                ],
                out_specs=pl.BlockSpec((n_pts, rows, hid),
                                       lambda i: (0, i, 0),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_limit_bytes),
            )(hj, tp[sl], *[w[sl] for w in s_args], *[w[sl] for w in t_args],
              seg_j, segt_j)

        hj = hj[:, :b * frames].astype(f32)
        out = _cheb_bm(basis_j, jnp.transpose(hj, (1, 0, 2)),
                       p["gconv_output"]["w"], p["gconv_output"]["b"])
        return out.reshape(b, frames, j, model.coords_out)

    return fn


def _temporal_only_kernel(h_ref, *refs, frames, num_heads, h_dim,
                          precision, tgroup, tloop):
    """One TemporalBlock on a ``[F, TBb, H]`` row block (its own kernel)."""
    t_refs = tuple(refs[:12])          # _T_ORDER stacks, layer axis = 1
    seg_ref, segt_ref, o_ref = refs[12:]
    seg_c = seg_ref[...]
    segt_c = segt_ref[...]
    act = jnp.bfloat16 if precision == "bf16" else jnp.float32
    h = h_ref[...].astype(act)
    h = _temporal_layer(
        h, 0, t_refs, seg_c, segt_c, frames=frames, num_heads=num_heads,
        h_dim=h_dim, precision=precision, tgroup=tgroup, tloop=tloop,
        act=act,
    )
    o_ref[...] = h.astype(o_ref.dtype)


def make_pallas_temporal_layer_fn(
    *,
    frames: int,
    num_heads: int,
    hid_dim: int,
    block_tb: int = 128,
    tgroup: int = 1,
    tloop: bool = True,
    precision="bf16x3",
    interpret: bool = False,
    vmem_limit_bytes: int | None = 64 * 2**20,
):
    """Build ``apply(tstacks, ht [N, F, H], layer) → [N, F, H]`` — ONE
    TemporalBlock (``models/video.py:99-120``) as its own Pallas kernel,
    drop-in for the XLA ``_temporal_block`` on the batch-major layout the
    spatial-fused eval path uses (``ops/pallas_video.py:156-159``).

    The middle road between the XLA temporal blocks and the co-resident
    spatio-temporal kernel (``make_pallas_video_full_fn``): each phase is
    kernel-resident, the per-layer program stays small (one rolled
    temporal body), and per-step VMEM is bounded by ``block_tb`` rows —
    the two failure modes that block the co-resident kernel at 81 frames
    through this environment's remote-compile service (helper OOM /
    scoped-VMEM exhaustion, docs/PERF.md round 5).

    ``tstacks``: the ``_temporal_weight_stacks`` dict (built once per
    jitted call; sliced per layer here so one compiled program serves all
    layers).  ``N = B·J`` rows; attention runs over the frame axis.
    """
    act = jnp.bfloat16 if precision == "bf16" else jnp.float32
    seg_j, segt_j = _segment_matrices(num_heads, hid_dim)
    seg_j, segt_j = seg_j.astype(act), segt_j.astype(act)  # exact 0/1
    kernel = functools.partial(
        _temporal_only_kernel, frames=frames, num_heads=num_heads,
        h_dim=hid_dim, precision=precision, tgroup=tgroup,
        tloop=(tloop and tgroup == 1),
    )

    def apply(tstacks: Dict[str, Array], ht: Array, layer: int) -> Array:
        n, f, hd = ht.shape
        assert f == frames and hd == hid_dim, (ht.shape, frames, hid_dim)
        t_args = [tstacks[k][layer:layer + 1].astype(act) for k in _T_ORDER]

        bb = max(8, min(block_tb, ((n + 7) // 8) * 8))
        pad = (-n) % bb
        hf = jnp.transpose(ht, (1, 0, 2)).astype(act)     # [F, N, H]
        if pad:
            hf = jnp.pad(hf, ((0, 0), (0, pad), (0, 0)))
        np_rows = n + pad

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((frames, np_rows, hid_dim), act),
            grid=(np_rows // bb,),
            in_specs=[
                pl.BlockSpec((frames, bb, hid_dim), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                *[_full_spec(w.shape) for w in t_args],
                _full_spec(seg_j.shape), _full_spec(segt_j.shape),
            ],
            out_specs=pl.BlockSpec((frames, bb, hid_dim),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit_bytes),
        )(hf, *t_args, seg_j, segt_j)
        return jnp.transpose(out[:, :n], (1, 0, 2)).astype(jnp.float32)

    return apply
