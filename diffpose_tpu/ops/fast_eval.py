"""MXU-shaped fast inference path for the GCNDiff denoiser.

The straightforward (training) forward is a long chain of small ops: per
ChebConv a graph-mix over 17 joints *and* a channel-mix over 96 features,
per attention four 96×96 projections, etc.  For inference we restructure
the math into a small number of large GEMMs that map cleanly onto the MXU:

* **Fused Chebyshev convolution** — merge the graph-mix and channel-mix
  into ONE dense matmul.  For basis ``T_k [N,N]`` and weights
  ``W_k [C,D]``::

      y[b, n, d] = Σ_k Σ_m Σ_c T_k[n,m] · x[b,m,c] · W_k[c,d]
                 = reshape(x, [B, N·C]) @ BigW,
      BigW[(m,c), (n,d)] = Σ_k T_k[n,m] · W_k[c,d]

  BigW is ``[N·C, N·D]`` (1632² for hid 96) — precomputed once per conv
  from the trained weights.  This trades ~8× FLOPs (MXU has them to spare
  at these sizes) for one dense, perfectly-tiled GEMM instead of two
  poorly-shaped stages with an HBM round-trip between them.

* **Fused QKV** — one ``[B·N, C] @ [C, 3C]`` projection per layer.

* The GraphNet's learned-adjacency Laplacian is normalized once from the
  trained ``Â`` (it only changes when parameters change).

* Optional bf16 compute (f32 accumulation via ``preferred_element_type``).

Outputs match ``GCNDiff.apply`` (eval mode) to float tolerance — verified
by tests.  Measured on v5e hardware the BigW trade LOSES to the standard
forward (4.45 vs 3.06 ms at f32 — the 8× FLOP inflation exceeds the op-
overhead savings; docs/PERF.md) — kept as an option and a documented
cautionary benchmark.  The production fast path is the fused Pallas
pipeline (``ops/pallas_pipeline.py``); training keeps the autodiff-
friendly module forward.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.graph import learned_adjacency_laplacian
from diffpose_tpu.models.layers import timestep_embedding

Array = jax.Array


def _big_cheb_weight(basis: np.ndarray, w: Array) -> Array:
    """[K,N,N] basis + [K,C,D] weights → [(N·C), (N·D)] fused weight."""
    basis = jnp.asarray(basis, w.dtype)
    big = jnp.einsum("knm,kcd->mcnd", basis, w)
    k, n, _ = basis.shape
    c, d = w.shape[1], w.shape[2]
    return big.reshape(n * c, n * d)


def precompute_fast_params(
    params: Dict[str, Any],
    basis: np.ndarray,
    num_layers: int = 5,
    dtype=jnp.float32,
    with_temb: bool = True,
) -> Dict[str, Any]:
    """Fold the trained parameter tree into inference-fused constants."""
    n = basis.shape[1]

    def cheb(p):
        return {
            "w": _big_cheb_weight(basis, jnp.asarray(p["w"], dtype)),
            "b": jnp.tile(jnp.asarray(p["b"], dtype), (n,)),
        }

    fp: Dict[str, Any] = {
        "n_pts": n,
        "gconv_input": cheb(params["gconv_input"]),
        "gconv_output": cheb(params["gconv_output"]),
        "layers": [],
    }
    if with_temb:
        fp["temb0"] = {k: jnp.asarray(v, dtype) for k, v in params["temb_dense_0"].items()}
        fp["temb1"] = {k: jnp.asarray(v, dtype) for k, v in params["temb_dense_1"].items()}
    for i in range(num_layers):
        a = params[f"atten_{i}"]
        r = params[f"res_{i}"]
        qkv_kernel = jnp.concatenate(
            [jnp.asarray(a["attn"][x]["kernel"], dtype) for x in ("q", "k", "v")], axis=1
        )
        qkv_bias = jnp.concatenate(
            [jnp.asarray(a["attn"][x]["bias"], dtype) for x in ("q", "k", "v")]
        )
        lap = learned_adjacency_laplacian(jnp.asarray(a["gnet"]["a_hat"], jnp.float32))
        layer = {
            "norm1": {k: jnp.asarray(v, dtype) for k, v in a["norm1"].items()},
            "norm2": {k: jnp.asarray(v, dtype) for k, v in a["norm2"].items()},
            "qkv_kernel": qkv_kernel,
            "qkv_bias": qkv_bias,
            "out": {k: jnp.asarray(v, dtype) for k, v in a["attn"]["out"].items()},
            "lap": jnp.asarray(lap, dtype),
            "fc1": {k: jnp.asarray(v, dtype) for k, v in a["gnet"]["fc1"].items()},
            "fc2": {k: jnp.asarray(v, dtype) for k, v in a["gnet"]["fc2"].items()},
            "gconv1": cheb(r["gconv1"]["gconv"]),
            "gconv2": cheb(r["gconv2"]["gconv"]),
        }
        if with_temb:
            layer["temb_proj"] = {
                k: jnp.asarray(v, dtype) for k, v in r["temb_proj"].items()
            }
        fp["layers"].append(layer)
    return fp


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _layer_norm_std(p, x):
    dim = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    std = jnp.sqrt(jnp.sum(c * c, axis=-1, keepdims=True) / (dim - 1))
    return p["scale"] * c / (std + 1e-6) + p["bias"]


def _backbone(fp, x: Array, temb, *, num_heads: int, hid_dim: int, dtype) -> Array:
    n = fp["n_pts"]
    dk = hid_dim // num_heads
    scale = 1.0 / math.sqrt(dk)
    b = x.shape[0]

    h = x.reshape(b, -1) @ fp["gconv_input"]["w"] + fp["gconv_input"]["b"]  # [B, N*H]

    for layer in fp["layers"]:
        h3 = h.reshape(b, n, hid_dim)
        # --- attention sublayer (pre-LN residual) ---
        y = _layer_norm_std(layer["norm1"], h3)
        qkv = y.reshape(b * n, hid_dim) @ layer["qkv_kernel"] + layer["qkv_bias"]
        qkv = qkv.reshape(b, n, 3, num_heads, dk)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        att = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        att = att.transpose(0, 2, 1, 3).reshape(b, n, hid_dim)
        h3 = h3 + _dense(layer["out"], att)

        # --- GraphNet "FFN" sublayer ---
        y = _layer_norm_std(layer["norm2"], h3)
        y = jnp.einsum("nm,bmc->bnc", layer["lap"], y)
        y = jax.nn.relu(_dense(layer["fc1"], y))
        y = jnp.einsum("nm,bmc->bnc", layer["lap"], y)
        h3 = h3 + _dense(layer["fc2"], y)

        # --- residual Cheb block (temb injection for the denoiser) ---
        hf = h3.reshape(b, n * hid_dim)
        out = jax.nn.relu(hf @ layer["gconv1"]["w"] + layer["gconv1"]["b"])
        if temb is not None:
            tproj = _dense(layer["temb_proj"], jax.nn.swish(temb))  # [B, H]
            out = out + jnp.tile(tproj, (1, n))
        out = jax.nn.relu(out @ layer["gconv2"]["w"] + layer["gconv2"]["b"])
        h = hf + out

    out = h @ fp["gconv_output"]["w"] + fp["gconv_output"]["b"]
    return out.reshape(b, n, -1).astype(jnp.float32)


def make_fast_denoiser(
    params: Dict[str, Any],
    basis: np.ndarray,
    *,
    num_layers: int = 5,
    num_heads: int = 4,
    hid_dim: int = 96,
    dtype=jnp.float32,
):
    """Build ``fn(x, t) → ε̂`` with all inference fusions applied.

    ``x``: [B, N, coords_in]; ``t``: [B].  Equivalent to
    ``GCNDiff.apply`` in eval mode.
    """
    fp = precompute_fast_params(params, basis, num_layers, dtype, with_temb=True)

    def fn(x: Array, t: Array) -> Array:
        x = x.astype(dtype)
        temb = timestep_embedding(t, hid_dim).astype(dtype)
        temb = _dense(fp["temb1"], jax.nn.swish(_dense(fp["temb0"], temb)))
        return _backbone(fp, x, temb, num_heads=num_heads, hid_dim=hid_dim, dtype=dtype)

    return fn


def make_fast_lifter(
    params: Dict[str, Any],
    basis: np.ndarray,
    *,
    num_layers: int = 5,
    num_heads: int = 4,
    hid_dim: int = 96,
    dtype=jnp.float32,
):
    """Fast 2D→3D lifter: ``fn(x_2d) → xyz`` ≡ ``GCNPose.apply`` eval mode."""
    fp = precompute_fast_params(params, basis, num_layers, dtype, with_temb=False)

    def fn(x: Array) -> Array:
        return _backbone(
            fp, x.astype(dtype), None, num_heads=num_heads, hid_dim=hid_dim, dtype=dtype
        )

    return fn
