"""Ablation timing of the fused denoiser kernel: where do the ms go?

The bf16x3 denoiser forward measures 3.79 ms at b=1024 while its MXU
speed-of-light is ~0.34 ms — this probe times kernel variants with parts
replaced by cheap stand-ins to attribute the gap:

  full        — the production kernel (baseline)
  no_attn     — attention sublayer: y1 passed through (skips the
                17-query score/softmax/value loop + qkv/out GEMMs)
  attn_only   — ONLY the attention sublayers (gnet + cheb blocks skipped)
  no_lap      — GraphNet lap mixes skipped (y used directly)
  no_chebmix  — Chebyshev sparse joint-mixing skipped (channel GEMMs kept)
  no_ln       — LayerNorms replaced by identity
  onepass     — full kernel at single-pass bf16 (matmul-pass share)

Timings are NOT semantically meaningful — this is cost attribution only.

Usage: python scripts/probe_ablate.py [variant ...] (default: all)
"""

from __future__ import annotations

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff
from diffpose_tpu.models.layers import timestep_embedding
from diffpose_tpu.ops.pallas_denoiser import (
    _W_ORDER,
    _cheb,
    _dot,
    _dot_exact_w,
    _full_spec,
    _lap_mix,
    _layer_norm,
    _prep_weights,
)
from flax import linen as nn

B = 1024
BLOCK_B = 128
HID = 96
LAYERS = 5
HEADS = 4


def _attention_grouped(q, k, v, seg_c, segt_c, n_pts, tb, precision, group):
    """All queries of a group in ONE pair of segment GEMMs: the per-query
    loop costs ~34 tiny MXU invocations per layer; grouping cuts that to
    2·ceil(17/G)."""
    att_rows = []
    for g0 in range(0, n_pts, group):
        g = min(group, n_pts - g0)
        # P[m, j, tb, d] = k[m]·q[g0+j]
        p = k[:, None] * q[g0:g0 + g][None]          # [17, g, tb, H]
        s = _dot_exact_w(p.reshape(n_pts * g * tb, HID), seg_c, precision)
        s = s.reshape(n_pts, g, tb, HEADS)
        smax = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - smax)
        probs = e / jnp.sum(e, axis=0, keepdims=True)
        w = _dot_exact_w(probs.reshape(n_pts * g * tb, HEADS), segt_c, precision)
        w = w.reshape(n_pts, g, tb, HID)
        att_rows.append(jnp.sum(w * v[:, None], axis=0))  # [g, tb, H]
    return jnp.concatenate(att_rows, axis=0)


def _kernel(
    x_ref, tp_ref, *refs,
    terms, n_pts, precision, skip,
):
    (win_ref, bin_ref,
     ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
     wqkv_ref, bqkv_ref, wao_ref, bao_ref,
     lap_ref,
     wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
     wg1_ref, bg1_ref, wg2_ref, bg2_ref,
     wout_ref, bout_ref,
     seg_ref, segt_ref,
     o_ref) = refs
    tb = x_ref.shape[1]
    seg_c = seg_ref[...]
    segt_c = segt_ref[...]

    def cheb(z, w3, bias):
        if "chebmix" in skip:
            # channel GEMM only (order-0 term), joint mixing skipped
            zf = z.reshape(n_pts * tb, z.shape[2])
            return (_dot(zf, w3[0], precision) + bias).reshape(n_pts, tb, -1)
        return _cheb(z, w3, bias, terms, n_pts, precision)

    def ln(z, s, b):
        if "ln" in skip:
            return z
        return _layer_norm(z, s, b, HID)

    h = cheb(x_ref[...], win_ref[...], bin_ref[...])

    for l in range(LAYERS):
        if "attn" not in skip:
            y = ln(h, ln1s_ref[l], ln1b_ref[l])
            qkv = _dot(y.reshape(n_pts * tb, HID), wqkv_ref[l], precision) + bqkv_ref[l]
            qkv = qkv.reshape(n_pts, tb, 3 * HID)
            q = qkv[..., :HID]
            k = qkv[..., HID:2 * HID]
            v = qkv[..., 2 * HID:]
            group = next((int(s[3:]) for s in skip if s.startswith("grp")), 0)
            if group:
                att = _attention_grouped(
                    q, k, v, seg_c, segt_c, n_pts, tb, precision, group)
            else:
                att_rows = []
                for n in range(n_pts):
                    p = q[n:n + 1] * k
                    s = _dot_exact_w(p.reshape(n_pts * tb, HID), seg_c, precision)
                    s = s.reshape(n_pts, tb, HEADS)
                    smax = jnp.max(s, axis=0, keepdims=True)
                    e = jnp.exp(s - smax)
                    probs = e / jnp.sum(e, axis=0, keepdims=True)
                    w = _dot_exact_w(probs.reshape(n_pts * tb, HEADS), segt_c, precision)
                    w = w.reshape(n_pts, tb, HID)
                    att_rows.append(jnp.sum(w * v, axis=0))
                att = jnp.stack(att_rows)
            att = (
                _dot(att.reshape(n_pts * tb, HID), wao_ref[l], precision) + bao_ref[l]
            ).reshape(n_pts, tb, HID)
            h = h + att

        if "gnetcheb" not in skip:
            y = ln(h, ln2s_ref[l], ln2b_ref[l])
            if "lap" not in skip:
                y = _lap_mix(lap_ref, l, y, n_pts)
            y = jax.nn.relu(
                _dot(y.reshape(n_pts * tb, HID), wfc1_ref[l], precision) + bfc1_ref[l]
            ).reshape(n_pts, tb, 2 * HID)
            if "lap" not in skip:
                y = _lap_mix(lap_ref, l, y, n_pts)
            y = (
                _dot(y.reshape(n_pts * tb, 2 * HID), wfc2_ref[l], precision) + bfc2_ref[l]
            ).reshape(n_pts, tb, HID)
            h = h + y

            u = jax.nn.relu(cheb(h, wg1_ref[l], bg1_ref[l]))
            u = u + tp_ref[l]
            u = jax.nn.relu(cheb(u, wg2_ref[l], bg2_ref[l]))
            h = h + u

    o_ref[...] = cheb(h, wout_ref[...], bout_ref[...])


def build(params, basis, precision, skip, block_b=BLOCK_B):
    n_pts = basis.shape[1]
    weights, terms, seg_j, segt_j = _prep_weights(params, basis, LAYERS, HEADS, HID)
    f32 = jnp.float32
    stack = lambda fn: jnp.stack([fn(i) for i in range(LAYERS)]).astype(f32)
    r = lambda i: params[f"res_{i}"]
    wtp = stack(lambda i: r(i)["temb_proj"]["kernel"])
    btp = stack(lambda i: r(i)["temb_proj"]["bias"])
    t0k = jnp.asarray(params["temb_dense_0"]["kernel"], f32)
    t0b = jnp.asarray(params["temb_dense_0"]["bias"], f32)
    t1k = jnp.asarray(params["temb_dense_1"]["kernel"], f32)
    t1b = jnp.asarray(params["temb_dense_1"]["bias"], f32)

    kernel = functools.partial(
        _kernel, terms=terms, n_pts=n_pts, precision=precision, skip=skip)
    c_in = params["gconv_input"]["w"].shape[1]
    c_out = params["gconv_output"]["w"].shape[2]
    w_args = [weights[k] for k in _W_ORDER]
    w_specs = [_full_spec(w.shape) for w in w_args]

    def fn(x, t):
        bsz = x.shape[0]
        bb = block_b
        temb = timestep_embedding(t, HID)
        temb = nn.swish(temb @ t0k + t0b) @ t1k + t1b
        st = nn.swish(temb)
        tp = jnp.stack([st @ wtp[l] + btp[l] for l in range(LAYERS)])
        xj = jnp.transpose(x.astype(f32), (1, 0, 2))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_pts, bsz, c_out), f32),
            grid=(bsz // bb,),
            in_specs=[
                pl.BlockSpec((n_pts, bb, c_in), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((LAYERS, bb, HID), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
                *w_specs,
                _full_spec(seg_j.shape), _full_spec(segt_j.shape),
            ],
            out_specs=pl.BlockSpec((n_pts, bb, c_out), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        )(xj, tp, *w_args, seg_j, segt_j)
        return jnp.transpose(out, (1, 0, 2))

    return jax.jit(fn)


VARIANTS = {
    "full": ("bf16x3", frozenset(), BLOCK_B),
    "no_attn": ("bf16x3", frozenset({"attn"}), BLOCK_B),
    "attn_only": ("bf16x3", frozenset({"gnetcheb"}), BLOCK_B),
    "no_lap": ("bf16x3", frozenset({"lap"}), BLOCK_B),
    "no_chebmix": ("bf16x3", frozenset({"chebmix"}), BLOCK_B),
    "no_ln": ("bf16x3", frozenset({"ln"}), BLOCK_B),
    "onepass": (None, frozenset(), BLOCK_B),
    # grouped-query attention: fewer, bigger segment GEMMs
    "full_b32": ("bf16x3", frozenset(), 32),
    "grp4": ("bf16x3", frozenset({"grp4"}), BLOCK_B),
    "grp8_b64": ("bf16x3", frozenset({"grp8"}), 64),
    "grp17_b32": ("bf16x3", frozenset({"grp17"}), 32),
    "grp17_b64": ("bf16x3", frozenset({"grp17"}), 64),
}


def main():
    names = [a for a in sys.argv[1:] if a in VARIANTS] or list(VARIANTS)
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = GCNDiff(basis=basis)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(B,)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]

    for name in names:
        precision, skip, bb = VARIANTS[name]
        fn = build(params, basis, precision, skip, block_b=bb)
        try:
            t0 = time.perf_counter()
            out = fn(x, t)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            iters = 30
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x, t)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(f"{name:12s} {ms:7.2f} ms  (compile {compile_s:.0f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — keep probing other variants
            msg = str(exc).split("\n")[0][:160]
            print(f"{name:12s} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
