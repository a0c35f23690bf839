"""Hardware validation for the VIDEO family's in-kernel PRNG dropout
(``ops/pallas_video_train.py``, ``dropout="prng"``) — hardware-only, the
pendant of ``probe_prng_dropout.py check`` for the video rates and the
per-layer seed folding.

Validates, per spatial layer i with seed ``s + i·1000003``:
  (a) kernel-drawn keep rates match the VIDEO rates (probs 0.9,
      sublayer 0.9 — NOT the frame model's 0.75 — cheb 0.9);
  (b) layer streams are independent (masks differ across layers);
  (c) the prng forward equals the pure-JAX oracle fed the dumped masks
      (which also pins the fwd/bwd mask regeneration contract);
  (d) determinism: same seed → identical output; different seed → not.

Usage: python scripts/probe_video_prng.py [--b=8 --frames=8]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.ops import train_ref as tr
from diffpose_tpu.ops.pallas_denoiser import _prep_weights
from diffpose_tpu.ops.pallas_train import STACK_KEYS, build_pallas_train_stack
from diffpose_tpu.ops.pallas_video_train import (
    make_pallas_video_train_fn,
    video_dropout_rates,
)


def main():
    b = next((int(a[4:]) for a in sys.argv if a.startswith("--b=")), 8)
    frames = next((int(a[9:]) for a in sys.argv if a.startswith("--frames=")), 8)
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = SpatioTemporalDiff(basis=basis, frames=frames, num_layers=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, frames, 17, 5)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 50, size=(b,)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x[:2], t[:2])["params"]
    rates = video_dropout_rates(model)
    rows = b * frames
    hid, heads = model.hid_dim, model.num_heads
    print(f"video rates (probs, sublayer, cheb) = {rates}")

    # --- per-layer stack-level validation (the prng kernels themselves)
    stack = build_pallas_train_stack(
        basis, num_layers=1, num_heads=heads, hid_dim=hid,
        block_b_fwd=16, block_b_bwd=16, group=4, dropout="prng", rates=rates)
    stack_m = build_pallas_train_stack(
        basis, num_layers=1, num_heads=heads, hid_dim=hid,
        block_b_fwd=16, block_b_bwd=16, group=4, dropout="masks", rates=rates)
    h0 = jnp.asarray(rng.normal(size=(17, rows, hid)).astype(np.float32))
    tp = jnp.asarray(rng.normal(size=(1, rows, hid)).astype(np.float32))
    seed0 = jnp.asarray([12345], jnp.int32)

    dumps_by_layer = []
    for i in range(model.num_layers):
        seed_i = seed0 + jnp.int32(i) * jnp.int32(1000003)
        # per-layer weights, exactly as the video fn assembles them
        pseudo = {
            "gconv_input": params["gconv_input"],
            "gconv_output": params["gconv_output"],
            "atten_0": params[f"spatial_atten_{i}"],
            "res_0": params[f"spatial_res_{i}"],
        }
        weights, _, _, _ = _prep_weights(pseudo, basis, 1, heads, hid)
        w = {k: weights[k] for k in STACK_KEYS}
        d5, _, dumps = jax.jit(
            lambda w, h, tpp, s: stack.run_fwd_dump(w, h, tpp, s)
        )(w, h0, tp, seed_i)
        dumps_by_layer.append({k: np.asarray(v) for k, v in dumps.items()})

        # (a) keep rates at the VIDEO rates
        want = {"probs_h": 1 - rates[0], "m1": 1 - rates[1],
                "m2": 1 - rates[1], "m3": 1 - rates[2], "m4": 1 - rates[2]}
        for kk, kp in want.items():
            got = float(dumps[kk].mean())
            assert abs(got - kp) < 0.02, (i, kk, got, kp)
        # (c) prng kernel ≡ masks kernel fed the dumped masks (same math,
        # same masks — catches any regeneration/expansion mismatch), and
        # relative agreement with the f32 oracle (bf16x3 grade)
        masks = tr.DropoutMasks(
            probs=jnp.transpose(jnp.asarray(dumps["probs_h"]), (0, 2, 1, 3, 4)),
            attn_out=jnp.asarray(dumps["m1"]), gnet_out=jnp.asarray(dumps["m2"]),
            cheb1=jnp.asarray(dumps["m3"]), cheb2=jnp.asarray(dumps["m4"]))
        from diffpose_tpu.ops.pallas_train import kernel_masks

        d5_m = jax.jit(stack_m)(w, h0, tp, kernel_masks(masks, hid // heads))
        kk = float(jnp.abs(d5 - d5_m).max())
        with jax.default_matmul_precision("float32"):
            want_d5 = jax.jit(lambda: tr.layers_forward(
                w, h0, tp, masks, basis=jnp.asarray(basis, jnp.float32),
                num_layers=1, num_heads=heads, hid_dim=hid, rates=rates))()
        scale = float(jnp.abs(want_d5).max())
        rel = float(jnp.abs(d5 - want_d5).max()) / scale
        print(f"layer {i}: keep rates ok; prng≡masks-kernel max|Δ| = {kk:.2e}; "
              f"vs f32 oracle rel = {rel:.2e}")
        assert kk < 1e-5, kk
        assert rel < 1e-3, rel

    # (b) layer streams independent
    for kk in ("probs_h", "m1", "m4"):
        same = (dumps_by_layer[0][kk] == dumps_by_layer[1][kk]).mean()
        print(f"{kk}: layer0≡layer1 fraction = {same:.3f}")
        assert 0.5 < same < 0.95, same  # ≈ kp²+(1-kp)² if independent

    # (d) end-to-end determinism of the full fused fn
    fn = make_pallas_video_train_fn(
        model, block_b_fwd=16, block_b_bwd=16, group=4, dropout="prng")
    tkey = jax.random.PRNGKey(5)
    jfn = jax.jit(fn)
    o1 = jfn(params, x, t, seed0, tkey)
    o2 = jfn(params, x, t, seed0, tkey)
    o3 = jfn(params, x, t, seed0 + 77, tkey)
    assert float(jnp.abs(o1 - o2).max()) == 0.0
    assert float(jnp.abs(o1 - o3).max()) > 0.0
    print("end-to-end: same seed bit-identical; different seed differs — OK")
    print("video prng validation PASSED")


if __name__ == "__main__":
    main()
