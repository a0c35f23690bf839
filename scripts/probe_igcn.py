"""Hardware timing: fused Pallas IGCN fixed-point eval vs the XLA module.

Direct-inference implicit eval (one Anderson solve per batch, reference
``runners/implicit_pose.py:523-526``) at production size.

Usage: probe_igcn.py [iters] [--b=512 --bb=128 --grp=1 --vmem=MB --solver=anderson]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.ops.pallas_igcn import make_pallas_igcn


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 20
    b = next((int(a[4:]) for a in sys.argv if a.startswith("--b=")), 512)
    bb = next((int(a[5:]) for a in sys.argv if a.startswith("--bb=")), 128)
    grp = next((int(a[6:]) for a in sys.argv if a.startswith("--grp=")), 1)
    vmem_mb = next((int(a[7:]) for a in sys.argv if a.startswith("--vmem=")), 0)
    solver = next((a[9:] for a in sys.argv if a.startswith("--solver=")), "anderson")

    basis = cheb_basis_from_edges(17, H36M_EDGES)
    # production ipose config: hid 96, 5 layers, anderson m=5, tol 0.1,
    # min 10 / max 20 iterations (configs/human36m_ipose.yml)
    model = IGCN(basis=basis, solver=solver)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, 17, 5)).astype(np.float32))
    t = jnp.full((b,), 12.0)

    # --- XLA module path at each parity-grade matmul precision ---
    outs = {}
    for prec in ("float32", "BF16_BF16_F32_X3"):
        with jax.default_matmul_precision(prec):
            mod = jax.jit(lambda x, t: model.apply(
                variables, x, t, train=False, differentiable=False))
            t0 = time.perf_counter()
            out, aux = mod(x, t)
            jax.block_until_ready(out)
            print(f"module[{prec}] compile {time.perf_counter()-t0:.0f}s  "
                  f"iters {int(aux['iterations'])}", flush=True)
            t0 = time.perf_counter()
            for _ in range(iters):
                out, aux = mod(x, t)
            jax.block_until_ready(out)
            ms = (time.perf_counter() - t0) / iters * 1e3
            print(f"XLA module solve (b={b}, {prec}): {ms:7.2f} ms "
                  f"({b/ms*1e3:,.0f} frames/s)", flush=True)
            outs[prec] = np.asarray(out)

    # Chaos baseline: on random (untrained) weights the fixed-point map is
    # not contractive, so iterate-level precision differences amplify and
    # the loose tol can converge to different points — the f32-vs-X3 module
    # delta calibrates how much solve-level |Δ| is inherent, independent of
    # the kernels.
    print(f"module f32-vs-X3 solve max|Δ| "
          f"{np.max(np.abs(outs['float32'] - outs['BF16_BF16_F32_X3'])):.2e}",
          flush=True)

    if "--xla-only" in sys.argv:  # Mosaic compiles hang when the remote
        return                    # compile service is degraded (PERF.md)

    # --- fused Pallas path (bf16x3) ---
    fn = jax.jit(make_pallas_igcn(
        model, variables["params"], variables["batch_stats"],
        block_b=bb, precision="bf16x3", group=grp,
        vmem_limit_bytes=vmem_mb * 2**20 or None))
    t0 = time.perf_counter()
    out_p, aux_p = fn(x, t)
    jax.block_until_ready(out_p)
    print(f"pallas compile {time.perf_counter()-t0:.0f}s  "
          f"iters {int(aux_p['iterations'])}  "
          f"max|Δ| {float(jnp.max(jnp.abs(out_p - out))):.2e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        out_p, aux_p = fn(x, t)
    jax.block_until_ready(out_p)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"pallas solve (b={b} bb={bb} g={grp}): {ms:7.2f} ms "
          f"({b/ms*1e3:,.0f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
