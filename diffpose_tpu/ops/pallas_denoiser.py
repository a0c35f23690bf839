"""Pallas TPU kernel: the ENTIRE GCNDiff forward in one VMEM-resident kernel.

The production denoiser is ~1.4M parameters (5.6 MB f32) — the whole
network fits in VMEM.  The XLA composite forward pays an HBM round-trip
and op-dispatch overhead between each of its ~60 small ops; this kernel
loads the weights once per batch tile and keeps every activation on-chip.

Design (see also ``pallas_cheb.py``):

* grid over batch tiles; activations joint-major ``[17, TB, H]`` so all
  per-joint linear maps are single MXU GEMMs on the free ``[17·TB, H]``
  view;
* Chebyshev/graph mixing over the *leading* joint dim: compile-time
  sparse scaled adds for the static Chebyshev stack, per-joint broadcast
  reductions for the learned adjacency;
* attention over 17 joints without tiny batched matmuls: for each query
  joint ``n`` the scores against all keys are one broadcast multiply +
  one ``[17·TB, H] @ [H, heads]`` *segment-sum* GEMM (the segment matrix
  has 1/√d_k folded in); softmax reduces over the leading key dim; the
  value contraction is the mirrored ``[heads → H]`` expansion GEMM;
* the timestep-embedding MLP and the five per-layer temb projections are
  tiny and stay in XLA, entering the kernel as a precomputed ``[L, B, H]``
  input.

Inference-path kernel (no dropout), float32.  Verified against
``GCNDiff.apply`` in interpret mode and on hardware.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from flax import linen as nn

from diffpose_tpu.graph import learned_adjacency_laplacian
from diffpose_tpu.models.layers import timestep_embedding
from diffpose_tpu.ops.pallas_cheb import _sparse_terms

Array = jax.Array


def _layer_norm(z, scale, bias, h_dim):
    mean = jnp.mean(z, axis=-1, keepdims=True)
    c = z - mean
    var = jnp.sum(c * c, axis=-1, keepdims=True) / (h_dim - 1)
    return scale * c / (jnp.sqrt(var) + 1e-6) + bias


def _cheb(z, w3, bias, terms, n_pts, precision=None):
    tb = z.shape[1]
    c = z.shape[2]
    zf = z.reshape(n_pts * tb, c)
    u = [
        jnp.dot(zf, w3[k], preferred_element_type=jnp.float32, precision=precision).reshape(n_pts, tb, -1)
        for k in range(w3.shape[0])
    ]
    rows = []
    for j in range(n_pts):
        acc = u[0][j] + bias
        for k, m, coeff in terms[j]:
            acc = acc + coeff * u[k][m]
        rows.append(acc)
    return jnp.stack(rows)


def _lap_mix(lap_ref, layer, z, n_pts):
    # y[n] = Σ_m lap[n, m] · z[m] with scalar coefficients read from the
    # (dynamic, learned) adjacency — Mosaic supports scalar·vector scaled
    # adds but not rank-expanding reshapes of small vectors.
    rows = []
    for n in range(n_pts):
        acc = lap_ref[layer, n, 0] * z[0]
        for m in range(1, n_pts):
            acc = acc + lap_ref[layer, n, m] * z[m]
        rows.append(acc)
    return jnp.stack(rows)


def _denoiser_kernel(
    x_ref, tp_ref,
    win_ref, bin_ref,
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
    wqkv_ref, bqkv_ref, wao_ref, bao_ref,
    lap_ref,
    wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    wg1_ref, bg1_ref, wg2_ref, bg2_ref,
    wout_ref, bout_ref,
    seg_ref, segt_ref,
    o_ref,
    *, terms, n_pts, num_layers, num_heads, h_dim, precision,
):
    tb = x_ref.shape[1]
    seg_c = seg_ref[...]      # [H, heads], holds 1/sqrt(dk)
    segt_c = segt_ref[...]    # [heads, H]

    h = _cheb(x_ref[...], win_ref[...], bin_ref[...], terms, n_pts, precision)

    for l in range(num_layers):
        # ---- attention sublayer ----
        y = _layer_norm(h, ln1s_ref[l], ln1b_ref[l], h_dim)
        qkv = (
            jnp.dot(y.reshape(n_pts * tb, h_dim), wqkv_ref[l],
                    preferred_element_type=jnp.float32, precision=precision)
            + bqkv_ref[l]
        )
        qkv = qkv.reshape(n_pts, tb, 3 * h_dim)
        q = qkv[..., :h_dim]
        k = qkv[..., h_dim:2 * h_dim]
        v = qkv[..., 2 * h_dim:]

        att_rows = []
        for n in range(n_pts):
            p = q[n:n + 1] * k                                    # [17, TB, H]
            s = jnp.dot(
                p.reshape(n_pts * tb, h_dim), seg_c,
                preferred_element_type=jnp.float32, precision=precision,
            ).reshape(n_pts, tb, num_heads)                       # scores over keys
            smax = jnp.max(s, axis=0, keepdims=True)
            e = jnp.exp(s - smax)
            probs = e / jnp.sum(e, axis=0, keepdims=True)
            w = jnp.dot(
                probs.reshape(n_pts * tb, num_heads), segt_c,
                preferred_element_type=jnp.float32, precision=precision,
            ).reshape(n_pts, tb, h_dim)
            att_rows.append(jnp.sum(w * v, axis=0))               # [TB, H]
        att = jnp.stack(att_rows)
        att = (
            jnp.dot(att.reshape(n_pts * tb, h_dim), wao_ref[l],
                    preferred_element_type=jnp.float32, precision=precision)
            + bao_ref[l]
        ).reshape(n_pts, tb, h_dim)
        h = h + att

        # ---- GraphNet sublayer ----
        y = _layer_norm(h, ln2s_ref[l], ln2b_ref[l], h_dim)
        y = _lap_mix(lap_ref, l, y, n_pts)
        y = jax.nn.relu(
            jnp.dot(y.reshape(n_pts * tb, h_dim), wfc1_ref[l],
                    preferred_element_type=jnp.float32, precision=precision)
            + bfc1_ref[l]
        ).reshape(n_pts, tb, 2 * h_dim)
        y = _lap_mix(lap_ref, l, y, n_pts)
        y = (
            jnp.dot(y.reshape(n_pts * tb, 2 * h_dim), wfc2_ref[l],
                    preferred_element_type=jnp.float32, precision=precision)
            + bfc2_ref[l]
        ).reshape(n_pts, tb, h_dim)
        h = h + y

        # ---- residual Chebyshev block with timestep injection ----
        u = jax.nn.relu(_cheb(h, wg1_ref[l], bg1_ref[l], terms, n_pts, precision))
        u = u + tp_ref[l]  # [TB, H] broadcasts over the joint dim
        u = jax.nn.relu(_cheb(u, wg2_ref[l], bg2_ref[l], terms, n_pts, precision))
        h = h + u

    o_ref[...] = _cheb(h, wout_ref[...], bout_ref[...], terms, n_pts, precision)


def make_pallas_denoiser(
    params: Dict[str, Any],
    basis: np.ndarray,
    *,
    num_layers: int = 5,
    num_heads: int = 4,
    hid_dim: int = 96,
    block_b: int = 128,
    interpret: bool = False,
    precision=None,
):
    """Build ``fn(x, t) → ε̂`` running the whole forward as one Pallas kernel.

    Output matches ``GCNDiff.apply`` (eval mode) to float32 tolerance.
    """
    n_pts = basis.shape[1]
    dk = hid_dim // num_heads
    terms = _sparse_terms(np.asarray(basis, np.float64))

    # Segment matrices: score folding (with 1/sqrt(dk)) and head expansion.
    seg = np.zeros((hid_dim, num_heads), np.float32)
    segt = np.zeros((num_heads, hid_dim), np.float32)
    for h in range(num_heads):
        seg[h * dk:(h + 1) * dk, h] = 1.0 / math.sqrt(dk)
        segt[h, h * dk:(h + 1) * dk] = 1.0

    f32 = jnp.float32

    def stack(fn):
        return jnp.stack([fn(i) for i in range(num_layers)]).astype(f32)

    a = lambda i: params[f"atten_{i}"]
    r = lambda i: params[f"res_{i}"]
    weights = dict(
        win=jnp.asarray(params["gconv_input"]["w"], f32),
        bin_=jnp.asarray(params["gconv_input"]["b"], f32),
        ln1s=stack(lambda i: a(i)["norm1"]["scale"]),
        ln1b=stack(lambda i: a(i)["norm1"]["bias"]),
        ln2s=stack(lambda i: a(i)["norm2"]["scale"]),
        ln2b=stack(lambda i: a(i)["norm2"]["bias"]),
        wqkv=stack(lambda i: jnp.concatenate(
            [a(i)["attn"][x]["kernel"] for x in ("q", "k", "v")], axis=1)),
        bqkv=stack(lambda i: jnp.concatenate(
            [a(i)["attn"][x]["bias"] for x in ("q", "k", "v")])),
        wao=stack(lambda i: a(i)["attn"]["out"]["kernel"]),
        bao=stack(lambda i: a(i)["attn"]["out"]["bias"]),
        lap=stack(lambda i: learned_adjacency_laplacian(
            jnp.asarray(a(i)["gnet"]["a_hat"], f32))),
        wfc1=stack(lambda i: a(i)["gnet"]["fc1"]["kernel"]),
        bfc1=stack(lambda i: a(i)["gnet"]["fc1"]["bias"]),
        wfc2=stack(lambda i: a(i)["gnet"]["fc2"]["kernel"]),
        bfc2=stack(lambda i: a(i)["gnet"]["fc2"]["bias"]),
        wg1=stack(lambda i: r(i)["gconv1"]["gconv"]["w"]),
        bg1=stack(lambda i: r(i)["gconv1"]["gconv"]["b"]),
        wg2=stack(lambda i: r(i)["gconv2"]["gconv"]["w"]),
        bg2=stack(lambda i: r(i)["gconv2"]["gconv"]["b"]),
        wout=jnp.asarray(params["gconv_output"]["w"], f32),
        bout=jnp.asarray(params["gconv_output"]["b"], f32),
    )
    wtp = stack(lambda i: r(i)["temb_proj"]["kernel"])   # [L, 4H, H]
    btp = stack(lambda i: r(i)["temb_proj"]["bias"])     # [L, H]
    t0k = jnp.asarray(params["temb_dense_0"]["kernel"], f32)
    t0b = jnp.asarray(params["temb_dense_0"]["bias"], f32)
    t1k = jnp.asarray(params["temb_dense_1"]["kernel"], f32)
    t1b = jnp.asarray(params["temb_dense_1"]["bias"], f32)

    kernel = functools.partial(
        _denoiser_kernel,
        terms=terms, n_pts=n_pts, num_layers=num_layers,
        num_heads=num_heads, h_dim=hid_dim, precision=precision,
    )
    seg_j = jnp.asarray(seg)
    segt_j = jnp.asarray(segt)

    c_in = params["gconv_input"]["w"].shape[1]
    c_out = params["gconv_output"]["w"].shape[2]

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM)

    def fn(x: Array, t: Array) -> Array:
        bsz = x.shape[0]
        bb = min(block_b, bsz)
        assert bsz % bb == 0, (bsz, bb)

        # Timestep path in XLA (tiny): MLP + all per-layer projections.
        temb = timestep_embedding(t, hid_dim)
        temb = nn.swish(temb @ t0k + t0b) @ t1k + t1b
        st = nn.swish(temb)
        tp = jnp.stack([st @ wtp[l] + btp[l] for l in range(num_layers)])  # [L, B, H]

        xj = jnp.transpose(x.astype(f32), (1, 0, 2))  # [N, B, C]

        w = weights
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pts, bsz, c_out), f32),
            grid=(bsz // bb,),
            in_specs=[
                pl.BlockSpec((n_pts, bb, c_in), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((num_layers, bb, hid_dim), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                full(w["win"].shape), full(w["bin_"].shape),
                full(w["ln1s"].shape), full(w["ln1b"].shape),
                full(w["ln2s"].shape), full(w["ln2b"].shape),
                full(w["wqkv"].shape), full(w["bqkv"].shape),
                full(w["wao"].shape), full(w["bao"].shape),
                full(w["lap"].shape),
                full(w["wfc1"].shape), full(w["bfc1"].shape),
                full(w["wfc2"].shape), full(w["bfc2"].shape),
                full(w["wg1"].shape), full(w["bg1"].shape),
                full(w["wg2"].shape), full(w["bg2"].shape),
                full(w["wout"].shape), full(w["bout"].shape),
                full(seg_j.shape), full(segt_j.shape),
            ],
            out_specs=pl.BlockSpec((n_pts, bb, c_out), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(
            xj, tp,
            w["win"], w["bin_"],
            w["ln1s"], w["ln1b"], w["ln2s"], w["ln2b"],
            w["wqkv"], w["bqkv"], w["wao"], w["bao"],
            w["lap"],
            w["wfc1"], w["bfc1"], w["wfc2"], w["bfc2"],
            w["wg1"], w["bg1"], w["wg2"], w["bg2"],
            w["wout"], w["bout"],
            seg_j, segt_j,
        )
        return jnp.transpose(out, (1, 0, 2))

    return fn
