"""Hardware probe: fused Pallas eval pipeline vs batch-tile size.

The whole-network kernels tile the batch with ``block_b`` (grid over
tiles, weights VMEM-resident across the grid).  Bigger tiles amortize the
per-tile instruction stream (the 17-row joint loops emit the same op
count regardless of tile width) at the cost of VMEM; this measures where
the knee is, plus whether merging the 8-batch sweep into one kernel
launch beats ``lax.map`` over batches.

Usage: python scripts/probe_blockb.py [iters] [--vmem=MB] [--blocks=128,256]
                                      [--group=1]

``--vmem``: raise Mosaic's scoped-VMEM limit (default 16 MB; v5e has
128 MB/core) — block_b=256 needs ~24 MB, 512 ~47 MB.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from diffpose_tpu.diffusion import get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose
from diffpose_tpu.ops.pallas_pipeline import make_pallas_eval

B, NB = 1024, 8
SEQ = (0, 12)


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 25
    vmem_mb = next((int(a[7:]) for a in sys.argv if a.startswith("--vmem=")), 0)
    blocks = next((tuple(int(b) for b in a[9:].split(","))
                   for a in sys.argv if a.startswith("--blocks=")),
                  (128, 256, 512))
    group = next((int(a[8:]) for a in sys.argv if a.startswith("--group=")), 1)

    basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
    betas = get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51
    )
    key = jax.random.PRNGKey(0)
    diff = GCNDiff(basis=basis)
    pose = GCNPose(basis=basis)
    params_diff = diff.init({"params": key}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    params_pose = pose.init({"params": key}, jnp.zeros((2, 17, 2)))["params"]

    x = jax.random.normal(jax.random.PRNGKey(1), (NB, B, 17, 2), jnp.float32)
    xm = x.reshape(NB * B, 17, 2)

    with jax.default_matmul_precision("float32"):
        for block_b in blocks:
            eval_one = make_pallas_eval(
                params_pose, params_diff, basis,
                seq=SEQ, betas=betas, test_times=1,
                block_b=block_b, precision="bf16x3", group=group,
                vmem_limit_bytes=vmem_mb * 2**20 or None,
            )
            sweep = jax.jit(lambda xs, f=eval_one: jax.lax.map(f, xs))
            t0 = time.perf_counter()
            sweep(x).block_until_ready()
            print(f"block_b={block_b:4d} g={group:2d} sweep   compile {time.perf_counter()-t0:6.1f}s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = sweep(x)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            fps = NB * B * iters / dt
            print(f"block_b={block_b:4d} g={group:2d} sweep   {dt/iters*1e3:7.2f} ms/sweep "
                  f"({fps:,.0f} frames/s)", flush=True)

            merged = jax.jit(eval_one)
            t0 = time.perf_counter()
            merged(xm).block_until_ready()
            print(f"block_b={block_b:4d} g={group:2d} merged  compile {time.perf_counter()-t0:6.1f}s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = merged(xm)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            fps = NB * B * iters / dt
            print(f"block_b={block_b:4d} g={group:2d} merged  {dt/iters*1e3:7.2f} ms/call  "
                  f"({fps:,.0f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
