"""Roofline/MFU accounting for the fused paths (VERDICT r4 task 3).

For each production path, counts the algorithmic work of its XLA twin via
``compiled.cost_analysis()`` (flops + bytes accessed are layout-exact for
the traced program; backend-independent for this purpose, so the count
runs on CPU without touching the TPU tunnel), then combines it with the
measured hardware step times (docs/PERF.md) to place each path against
the v5e rooflines:

    MXU peak  ~197 TFLOP/s bf16 (half that for the f32-emulating bf16x3
              grade: 3 passes for general GEMMs, 2 for exact-bf16 weights)
    HBM       ~819 GB/s

Usage:  JAX_PLATFORMS=cpu python scripts/roofline.py
Prints a markdown table for docs/PERF.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.diffusion import ddim_sample, get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose

# Measured wall-clock per dispatch on the v5e tunnel (docs/PERF.md; round
# noted beside each).  frames = frames per dispatch.
MEASURED = {
    # headline eval: b=1024, lift + 2-step DDIM, 8-batch sweep → per batch
    "frame eval (b=1024, lift+2xDDIM)": dict(
        ms=1024 * 1000 / 138_957, frames=1024, note="r5 bench median"),
    "frame train step (b=1024, masks)": dict(
        ms=15.49, frames=1024, note="r2 probe_train_kernel"),
    "igcn train solver-iter (b=512)": dict(
        ms=10.38, frames=512, note="r4b prng; per fwd+bwd iteration"),
    "video eval fwd (b=16, f=81)": dict(
        ms=10.47 / 2, frames=16 * 81, note="r4 model-only / 2 DDIM steps"),
    "video train step (b=16, f=81, prng)": dict(
        ms=68.62, frames=16 * 81, note="r4b"),
}

PEAK_BF16 = 197e12   # v5e MXU, single-pass bf16
PEAK_HBM = 819e9     # v5e HBM bandwidth


def _cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    diff = GCNDiff(basis=basis)
    pose = GCNPose(basis=basis)
    mask = jnp.ones((1, 1, 17))
    key = jax.random.PRNGKey(0)
    pd = diff.init({"params": key}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    pp = pose.init({"params": key}, jnp.zeros((2, 17, 2)))["params"]

    rows = {}

    # 1) frame eval pipeline (the bench workload, minus metrics)
    def eval_one(x2d):
        xyz = pose.apply({"params": pp}, x2d, mask)
        xyz = xyz - xyz[:, :1, :]
        uvxyz = jnp.concatenate([x2d, xyz], axis=-1)
        return ddim_sample(
            lambda x, t: diff.apply({"params": pd}, x, t, mask),
            uvxyz, (0, 12), betas)[..., 2:]

    rows["frame eval (b=1024, lift+2xDDIM)"] = _cost(
        eval_one, jnp.zeros((1024, 17, 2)))

    # 2) frame train fwd+bwd (loss grad only — the kernel pair's scope)
    def train_grad(x, t, e):
        def loss(params):
            eps = diff.apply({"params": params}, x, t, mask, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(jnp.sum((e - eps) ** 2, axis=(1, 2)))
        return jax.value_and_grad(loss)(pd)

    rows["frame train step (b=1024, masks)"] = _cost(
        train_grad, jnp.zeros((1024, 17, 5)), jnp.zeros((1024,)),
        jnp.zeros((1024, 17, 5)))

    # 3) one igcn solver iteration fwd+bwd: the 5-layer stack + BN is the
    # same per-iteration work as one frame fwd+bwd at the same batch,
    # minus I/O convs (reuses the frame count scaled to b=512)
    f, b = rows["frame train step (b=1024, masks)"]
    rows["igcn train solver-iter (b=512)"] = (f / 2, b / 2)

    # 4) video eval forward (one denoiser application)
    from diffpose_tpu.models.video import SpatioTemporalDiff

    video = SpatioTemporalDiff(basis=basis, frames=81)
    xv = jnp.zeros((16, 81, 17, 5))
    tv = jnp.zeros((16,))
    pv = video.init({"params": key}, xv, tv)["params"]
    rows["video eval fwd (b=16, f=81)"] = _cost(
        lambda x, t: video.apply({"params": pv}, x, t), xv, tv)

    # 5) video train fwd+bwd+Adam — approximate with fwd+bwd grad
    def vtrain_grad(x, t, e):
        def loss(params):
            eps = video.apply({"params": params}, x, t, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(jnp.sum((e - eps) ** 2, axis=(1, 2, 3)))
        return jax.value_and_grad(loss)(pv)

    rows["video train step (b=16, f=81, prng)"] = _cost(
        vtrain_grad, xv, tv, jnp.zeros_like(xv))

    print("| path | MFLOP/frame | ms meas. | TFLOP/s | %bf16-peak "
          "| %x3-grade peak | GB/s (XLA bytes) | bound |")
    print("|---|---|---|---|---|---|---|---|")
    for name, (flops, bytes_) in rows.items():
        m = MEASURED[name]
        tflops = flops / (m["ms"] * 1e-3) / 1e12
        gbs = bytes_ / (m["ms"] * 1e-3) / 1e9
        pct = 100 * tflops * 1e12 / PEAK_BF16
        # parity grade: ~2.5 bf16 passes per algorithmic FLOP (3-pass
        # general GEMMs, 2-pass exact-weight GEMMs, 1-pass elementwise)
        pct_x3 = pct * 2.5
        bound = "compute" if pct_x3 > 100 * gbs * 1e9 / PEAK_HBM else "memory/latency"
        print(f"| {name} | {flops / m['frames'] / 1e6:.1f} "
              f"| {m['ms']:.2f} ({m['note']}) | {tflops:.2f} | {pct:.1f}% "
              f"| {pct_x3:.1f}% | {gbs:.0f} | {bound} |")


if __name__ == "__main__":
    main()
