"""Hardware probe: whole-network video kernel vs spatial-only fusion.

Measures the model-only denoiser forward (b windows x 81 frames) for
  (a) XLA module path,
  (b) round-4 spatial-fused path (4 spatial kernels + XLA temporal),
  (c) the whole-network kernel (ONE pallas_call).
Run solo on the TPU tunnel:  python scripts/probe_video_full.py
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.video import SpatioTemporalDiff


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--block_b", type=int, default=1)
    ap.add_argument("--tgroup", type=int, default=9)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--impl", default="all",
                    choices=("all", "xla", "spatial", "st", "full"))
    ap.add_argument("--st_tloop", type=int, default=0)
    ap.add_argument("--precision", default="bf16x3")
    ap.add_argument("--vmem_mb", type=int, default=64)
    args = ap.parse_args()

    basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
    model = SpatioTemporalDiff(basis=basis, frames=args.frames)
    x0 = jax.random.normal(
        jax.random.PRNGKey(0), (args.b, args.frames, 17, 5))
    t = jnp.full((args.b,), 7.0)
    params = model.init({"params": jax.random.PRNGKey(1)}, x0, t)["params"]

    xs = jax.random.normal(
        jax.random.PRNGKey(2), (args.iters, args.b, args.frames, 17, 5))
    frames_total = args.b * args.frames

    def bench(name, fn):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        np.asarray(f(params, xs[0], t))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = f(params, xs[i], t)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt * 1e3:.2f} ms  "
              f"({frames_total / dt:,.0f} frames/s)", flush=True)

    with jax.default_matmul_precision("BF16_BF16_F32_X3"):
        if args.impl in ("all", "xla"):
            bench("xla-x3", lambda p, x, tt: model.apply({"params": p}, x, tt))
        if args.impl in ("all", "spatial"):
            from diffpose_tpu.ops.pallas_video import (
                make_pallas_video_denoiser_fn,
            )
            sp = make_pallas_video_denoiser_fn(
                model, block_b=128, precision=args.precision)
            bench("spatial-fused", sp)
        if args.impl in ("all", "st"):
            from diffpose_tpu.ops.pallas_video import (
                make_pallas_video_denoiser_fn as _mk,
            )
            st = _mk(model, block_b=128, precision=args.precision,
                     temporal_impl="pallas", tloop=bool(args.st_tloop))
            bench(f"st-fused(tloop={args.st_tloop})", st)
        if args.impl in ("all", "full"):
            from diffpose_tpu.ops.pallas_video_full import (
                make_pallas_video_full_fn,
            )
            full = make_pallas_video_full_fn(
                model, block_b=args.block_b, tgroup=args.tgroup,
                precision=args.precision,
                vmem_limit_bytes=args.vmem_mb * 2**20)
            bench("full-fused", full)


if __name__ == "__main__":
    main()
