"""Mosaic capability probe: batched dot_general inside a Pallas kernel.

If [T, F, dk] x [T, dk, F] batched matmuls lower through this
environment's Mosaic toolchain, temporal attention can use 4 per-head
batched GEMMs ([F,F] scores per row) instead of the segment-matrix
formulation whose rank-4 unrolls OOM the remote compile helper at F=81
(observed r5: tpu_compile_helper SIGKILL).  Run solo on the tunnel.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]            # [T, F, dk]
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [T, F, F]
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [T, F, dk]
    o_ref[...] = o


def main():
    T, F, dk = 136, 81, 24
    q = jax.random.normal(jax.random.PRNGKey(0), (T, F, dk))
    k = jax.random.normal(jax.random.PRNGKey(1), (T, F, dk))
    v = jax.random.normal(jax.random.PRNGKey(2), (T, F, dk))

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, F, dk), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    t0 = time.perf_counter()
    try:
        out = np.asarray(jax.jit(fn)(q, k, v))
    except Exception as e:
        print(f"UNSUPPORTED: {type(e).__name__}: {str(e)[:300]}")
        return 1
    ref = np.asarray(jnp.einsum(
        "tfd,tgd->tfg", q, k))
    ref = np.asarray(jax.nn.softmax(ref, axis=-1) @ np.asarray(v))
    err = np.abs(out - ref).max()
    print(f"SUPPORTED: compile+run {time.perf_counter() - t0:.1f}s, "
          f"max|err| {err:.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
