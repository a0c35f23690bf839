"""Precision parity probe: P1 impact of each eval-path precision choice.

Methodology (round 1, docs/PERF.md): run the FULL eval pipeline (lift →
2-step DDIM → root-centered prediction) at production size on random
weights, against a CPU float64-free f32 reference of the same math, and
report prediction deltas and the per-sample P1 delta |P1_x − P1_ref|.
The parity budget for real-data reproduction is 0.5 mm end-to-end; any
eval path we call "parity-grade" must sit well inside it.

Compares, on hardware:
  * XLA path, f32 matmul precision        (round-1 headline path)
  * XLA path, default (single-pass bf16)  (known NOT parity-grade)
  * fused Pallas pipeline, bf16x3         (round-2 headline path)

Usage: python scripts/probe_precision.py [n_frames]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SEQ = (0, 12)


def build(n):
    import jax
    import jax.numpy as jnp
    from diffpose_tpu.diffusion import ddim_sample, get_beta_schedule
    from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
    from diffpose_tpu.models import GCNDiff, GCNPose

    basis = cheb_basis_from_edges(17, H36M_EDGES)
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    key = jax.random.PRNGKey(0)
    diff = GCNDiff(basis=basis)
    pose = GCNPose(basis=basis)
    pd = diff.init({"params": key}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    pp = pose.init({"params": key}, jnp.zeros((2, 17, 2)))["params"]
    mask = jnp.ones((1, 1, 17))
    x2d = jax.random.normal(jax.random.PRNGKey(1), (n, 17, 2), jnp.float32) * 0.3
    # plausible pose scale (meters): random target to score P1 against
    tgt = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (n, 17, 3), jnp.float32)) * 0.3

    def xla_eval(x):
        xyz = pose.apply({"params": pp}, x, mask)
        xyz = xyz - xyz[:, :1, :]
        uvxyz = jnp.concatenate([x, xyz], axis=-1)
        out = ddim_sample(lambda z, t: diff.apply({"params": pd}, z, t, mask),
                          uvxyz, SEQ, betas)
        return out[..., 2:]

    return (basis, betas, pd, pp, x2d, tgt, xla_eval)


def p1(pred, tgt):
    pred = pred - pred[:, :1]
    tgt = tgt - tgt[:, :1]
    return np.linalg.norm(pred - tgt, axis=-1).mean(axis=-1) * 1000.0  # mm


def main():
    import jax
    import jax.numpy as jnp
    from diffpose_tpu.ops.pallas_pipeline import make_pallas_eval

    basis, betas, pd, pp, x2d, tgt, xla_eval = build(N)

    # CPU f32 reference (exact f32 matmuls)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x_cpu = jax.device_put(x2d, cpu)
        ref = np.asarray(jax.jit(xla_eval)(x_cpu))
    p1_ref = p1(ref, tgt)
    print(f"reference: CPU f32, {N} frames", flush=True)

    def report(name, pred):
        d = np.abs(pred - ref)
        dp1 = np.abs(p1(pred, tgt) - p1_ref)
        print(f"{name:38s} |Δpred| mean {d.mean()*1000:7.4f} mm  max {d.max()*1000:7.3f} mm"
              f"   |ΔP1| mean {dp1.mean():7.4f} mm  max {dp1.max():7.3f} mm", flush=True)

    with jax.default_matmul_precision("float32"):
        report("XLA f32 precision (r1 headline)",
               np.asarray(jax.jit(xla_eval)(x2d)))
    report("XLA default (single-pass bf16)",
           np.asarray(jax.jit(xla_eval)(x2d)))
    with jax.default_matmul_precision("BF16_BF16_F32_X3"):
        report("XLA BF16_BF16_F32_X3 (3-pass bf16)",
               np.asarray(jax.jit(xla_eval)(x2d)))

    if "--xla-only" in sys.argv:  # Mosaic compiles hang when the remote
        return                    # compile service is degraded (PERF.md)
    fused = make_pallas_eval(pp, pd, basis, seq=SEQ, betas=betas,
                             test_times=1, precision="bf16x3")
    report("Pallas fused bf16x3 (r2 headline)",
           np.asarray(jax.jit(fused)(x2d)))
    # Non-parity speed tier: bf16-resident activations, f32 accumulation.
    fast = make_pallas_eval(pp, pd, basis, seq=SEQ, betas=betas,
                            test_times=1, precision="bf16")
    report("Pallas fused bf16 (FAST tier)",
           np.asarray(jax.jit(fast)(x2d)))


if __name__ == "__main__":
    main()
