"""Probe: can this backend round-trip a compiled executable to disk?

The remote-compile service ignores JAX's persistent compilation cache
(docs/PERF.md), so every process pays 40–420 s per jit.  If
``jax.experimental.serialize_executable`` can serialize + deserialize a
compiled program on the axon backend, ``utils/aot_cache.py`` can cache
executables under ``.jax_cache_exec/`` and a second ``bench.py`` run
starts measuring in seconds (VERDICT r2 item 5).

Usage: probe_aot.py [--big]
"""

from __future__ import annotations

import os
import pickle
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    def f(x, w):
        return jnp.tanh(x @ w) @ w.T

    x = jnp.asarray(np.random.default_rng(0).normal(size=(256, 512)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(512, 512)), jnp.float32)

    t0 = time.perf_counter()
    lowered = jax.jit(f).lower(x, w)
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
    want = np.asarray(compiled(x, w))

    from jax.experimental import serialize_executable as se

    t0 = time.perf_counter()
    payload, in_tree, out_tree = se.serialize(compiled)
    blob = pickle.dumps((payload, in_tree, out_tree))
    print(f"serialize: {time.perf_counter()-t0:.2f}s, {len(blob)/1e6:.2f} MB",
          flush=True)

    t0 = time.perf_counter()
    payload2, in_tree2, out_tree2 = pickle.loads(blob)
    loaded = se.deserialize_and_load(payload2, in_tree2, out_tree2)
    print(f"deserialize_and_load: {time.perf_counter()-t0:.2f}s", flush=True)

    t0 = time.perf_counter()
    got = np.asarray(loaded(x, w))
    print(f"first call: {time.perf_counter()-t0:.2f}s", flush=True)
    np.testing.assert_allclose(got, want, atol=1e-5)
    print("ROUNDTRIP OK (numerics match)", flush=True)

    if "--big" in sys.argv:
        # the real question: does it work for a Mosaic-kernel program?
        from diffpose_tpu.diffusion import get_beta_schedule
        from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
        from diffpose_tpu.models import GCNDiff, GCNPose
        from diffpose_tpu.ops.pallas_pipeline import make_pallas_eval

        basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
        betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                                  num_diffusion_timesteps=51)
        key = jax.random.PRNGKey(0)
        diff, pose = GCNDiff(basis=basis), GCNPose(basis=basis)
        pd = diff.init({"params": key}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
        pp = pose.init({"params": key}, jnp.zeros((2, 17, 2)))["params"]
        eval_one = make_pallas_eval(pp, pd, basis, seq=(0, 12), betas=betas,
                                    test_times=1, precision="bf16x3", block_b=128)
        x2d = jnp.asarray(np.random.default_rng(2).normal(size=(1024, 17, 2)),
                          jnp.float32)
        t0 = time.perf_counter()
        compiled = jax.jit(eval_one).lower(x2d).compile()
        print(f"pallas compile: {time.perf_counter()-t0:.1f}s", flush=True)
        want = np.asarray(compiled(x2d))
        payload, it, ot = se.serialize(compiled)
        blob = pickle.dumps((payload, it, ot))
        print(f"pallas serialize: {len(blob)/1e6:.2f} MB", flush=True)
        loaded = se.deserialize_and_load(*pickle.loads(blob))
        got = np.asarray(loaded(x2d))
        np.testing.assert_allclose(got, want, atol=1e-5)
        print("PALLAS ROUNDTRIP OK", flush=True)


if __name__ == "__main__":
    main()
