"""Hardware timing probe: denoiser forward variants on the TPU chip.

Times, at batch 1024 (the eval protocol batch, reference
``runners/diffpose_frame.py:300-330``):

* standard XLA module forward at default and f32 matmul precision,
* the fused whole-network Pallas kernel (``ops/pallas_denoiser.py``) at
  default single-pass-bf16 and parity-grade bf16x3 precision,
* the fused Pallas lifter (GCNPose).

Usage: python scripts/probe_kernels.py [iters]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff, GCNPose
from diffpose_tpu.ops.pallas_denoiser import make_pallas_denoiser, make_pallas_lifter

BATCH = 1024


def timeit(name, fn, *args, iters=50):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {ms:8.3f} ms/call   (compile {compile_s:.1f}s)", flush=True)
    return ms


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"devices: {jax.devices()}", flush=True)
    basis = cheb_basis_from_edges(17, H36M_EDGES)
    key = jax.random.PRNGKey(0)

    diff = GCNDiff(basis=basis)
    pd = diff.init({"params": key}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    pose = GCNPose(basis=basis)
    pp = pose.init({"params": key}, jnp.zeros((2, 17, 2)))["params"]
    mask = jnp.ones((1, 1, 17))

    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 17, 5), jnp.float32)
    x2 = x[..., :2]
    t = jnp.full((BATCH,), 12.0)

    @jax.jit
    def xla_default(x, t):
        return diff.apply({"params": pd}, x, t, mask)

    @jax.jit
    def xla_f32(x, t):
        with jax.default_matmul_precision("float32"):
            return diff.apply({"params": pd}, x, t, mask)

    ref = timeit("XLA fwd (default prec)", xla_default, x, t, iters=iters)
    timeit("XLA fwd (f32 prec)", xla_f32, x, t, iters=iters)

    want = np.asarray(jax.block_until_ready(xla_f32(x, t)))

    for prec, label in [(None, "default"), ("bf16x3", "bf16x3")]:
        fn = jax.jit(make_pallas_denoiser(pd, basis, block_b=128, precision=prec))
        ms = timeit(f"Pallas denoiser ({label})", fn, x, t, iters=iters)
        err = float(np.abs(np.asarray(fn(x, t)) - want).max())
        print(f"    max|Δ| vs XLA-f32: {err:.2e}   speedup vs XLA-default: {ref/ms:.2f}x",
              flush=True)

    @jax.jit
    def xla_pose_f32(x2):
        with jax.default_matmul_precision("float32"):
            return pose.apply({"params": pp}, x2, mask)

    refp = timeit("XLA lifter fwd (f32 prec)", xla_pose_f32, x2, iters=iters)
    wantp = np.asarray(jax.block_until_ready(xla_pose_f32(x2)))
    for prec, label in [(None, "default"), ("bf16x3", "bf16x3")]:
        fn = jax.jit(make_pallas_lifter(pp, basis, block_b=128, precision=prec))
        ms = timeit(f"Pallas lifter ({label})", fn, x2, iters=iters)
        err = float(np.abs(np.asarray(fn(x2)) - wantp).max())
        print(f"    max|Δ| vs XLA-f32: {err:.2e}   speedup vs XLA-f32: {refp/ms:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
