"""Hardware timing: fused Pallas implicit (IGCN) TRAIN step vs the XLA module.

Backprop-through-the-solve training at the production ipose config
(hid 96, 5 layers, anderson m=5, min 10 / max 20 iterations, batch 512 —
configs/human36m_ipose.yml; reference workload
``runners/implicit_pose.py:270-420``).  The differentiable solve runs a
fixed ``max_iterations``-length scan, so one train step costs
~``max_iterations`` stack fwd+bwd pairs — compare per-iteration cost
against the standard family's single fused fwd+bwd (15.49 ms at b=1024).

Usage: probe_igcn_train.py [iters] [--b=512 --bbf=64 --bbb=32 --grp=17
                            --vmem=100 --maxit=20 --xla-only --pallas-only
                            --sweep=N]

``--sweep=N``: additionally time the device-resident implicit train
sweep (``make_implicit_train_sweep_step``, the ``--train_sweep`` CLI
path) at N optimizer steps per dispatch — module base step (XLA), and
the fused-kernel base step unless ``--xla-only``.
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

from diffpose_tpu.diffusion import get_beta_schedule
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import ema_register
from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.train import TrainState, make_optimizer


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    b = next((int(a[4:]) for a in sys.argv if a.startswith("--b=")), 512)
    bbf = next((int(a[6:]) for a in sys.argv if a.startswith("--bbf=")), 64)
    bbb = next((int(a[6:]) for a in sys.argv if a.startswith("--bbb=")), 32)
    grp = next((int(a[6:]) for a in sys.argv if a.startswith("--grp=")), 17)
    vmem_mb = next((int(a[7:]) for a in sys.argv if a.startswith("--vmem=")), 100)
    maxit = next((int(a[8:]) for a in sys.argv if a.startswith("--maxit=")), 20)

    basis = cheb_basis_from_edges(17, H36M_EDGES)
    model = IGCN(basis=basis, max_iterations=maxit, min_iterations=min(10, maxit))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,)))
    betas = get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51)
    opt = make_optimizer(lr=2e-5, steps_per_epoch=100)
    state0 = TrainState.create(
        variables["params"], opt.init(variables["params"]),
        ema_params=ema_register(variables["params"]),
        model_state=variables["batch_stats"],
    )

    rng = np.random.default_rng(0)
    batch = {
        "poses_3d": jnp.asarray(rng.normal(size=(b, 17, 3)).astype(np.float32)),
        "poses_2d_gmm": jnp.asarray(
            np.abs(rng.normal(size=(b, 17, 5, 5))).astype(np.float32) + 0.1),
    }
    key = jax.random.PRNGKey(7)

    def bench(name, step):
        t0 = time.perf_counter()
        st, metrics = step(state0, batch, key)
        jax.block_until_ready(st.params)
        print(f"{name}: compile {time.perf_counter()-t0:.0f}s  "
              f"loss {float(metrics['loss']):.1f}  "
              f"fp_it {float(metrics['fp_iterations']):.0f}", flush=True)
        st = state0
        t0 = time.perf_counter()
        for _ in range(iters):
            st, metrics = step(st, batch, key)
        jax.block_until_ready(st.params)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name} (b={b}, maxit={maxit}): {ms:7.2f} ms/step "
              f"({b/ms*1e3:,.0f} frames/s; {ms/maxit:.2f} ms/solver-iter)",
              flush=True)
        return float(metrics["loss"])

    if "--pallas-only" not in sys.argv:
        from diffpose_tpu.train.implicit_steps import make_implicit_train_step

        # The module path OOMs at b=512 × 20 iterations: XLA stashes the
        # per-iteration attention tensors as [it, B, 4, 17, 24] with 7.5–
        # 10.6× tile-padding expansion (480 MB per buffer, measured) —
        # so it is measured at the largest batch that fits; the fused
        # kernels' joint-major stashes take b=512 directly.
        xla_b = next((int(a[8:]) for a in sys.argv if a.startswith("--xla-b=")), 128)
        xbatch = {k: v[:xla_b] for k, v in batch.items()}
        for prec in ("float32", "BF16_BF16_F32_X3"):
            with jax.default_matmul_precision(prec):
                step = jax.jit(make_implicit_train_step(
                    model, opt, betas), donate_argnums=())
                t0 = time.perf_counter()
                st, metrics = step(state0, xbatch, key)
                jax.block_until_ready(st.params)
                print(f"XLA module [{prec}]: compile {time.perf_counter()-t0:.0f}s  "
                      f"loss {float(metrics['loss']):.1f}", flush=True)
                t0 = time.perf_counter()
                for _ in range(iters):
                    st, metrics = step(st, xbatch, key)
                jax.block_until_ready(st.params)
                ms = (time.perf_counter() - t0) / iters * 1e3
                print(f"XLA module [{prec}] (b={xla_b}, maxit={maxit}): "
                      f"{ms:7.2f} ms/step ({xla_b/ms*1e3:,.0f} frames/s; "
                      f"{ms/maxit:.2f} ms/solver-iter)", flush=True)

    if "--xla-only" in sys.argv:  # Mosaic compiles hang when the remote
        return                    # compile service is degraded (PERF.md)

    from diffpose_tpu.ops.pallas_igcn_train import make_pallas_implicit_train_step

    drp = next((a[10:] for a in sys.argv if a.startswith("--dropout=")), "masks")
    step = jax.jit(make_pallas_implicit_train_step(
        model, opt, betas, block_b_fwd=bbf, block_b_bwd=bbb, group=grp,
        vmem_limit_bytes=vmem_mb * 2**20 if vmem_mb else None, dropout=drp,
    ), donate_argnums=())
    bench(f"Pallas fused [bf16x3 ({bbf},{bbb}) grp{grp} {drp}]", step)

    if "--remat" in sys.argv:
        step = jax.jit(make_pallas_implicit_train_step(
            model, opt, betas, block_b_fwd=bbf, block_b_bwd=bbb, group=grp,
            vmem_limit_bytes=vmem_mb * 2**20 if vmem_mb else None, remat=True,
            dropout=drp,
        ), donate_argnums=())
        bench(f"Pallas fused+remat [bf16x3 ({bbf},{bbb}) grp{grp} {drp}]", step)

    sweep = next((int(a[8:]) for a in sys.argv if a.startswith("--sweep=")), 0)
    if sweep:
        # Device-resident sweep (the --train_sweep CLI path): N optimizer
        # steps per dispatch over device-resident data; fused base step.
        from diffpose_tpu.train.implicit_steps import make_implicit_train_sweep_step

        rng2 = np.random.default_rng(1)
        data = {
            "poses_3d": jnp.asarray(
                rng2.normal(size=(sweep * b, 17, 3)).astype(np.float32)),
            "poses_2d_gmm": jnp.asarray(
                np.abs(rng2.normal(size=(sweep * b, 17, 5, 5))
                       ).astype(np.float32) + 0.1),
        }
        idx = jnp.arange(sweep * b, dtype=jnp.int32).reshape(sweep, b)
        base = make_pallas_implicit_train_step(
            model, opt, betas, block_b_fwd=bbf, block_b_bwd=bbb, group=grp,
            vmem_limit_bytes=vmem_mb * 2**20 if vmem_mb else None)
        sw = jax.jit(make_implicit_train_sweep_step(
            model, opt, betas, sweep=sweep, base_step=base), donate_argnums=())
        t0 = time.perf_counter()
        st, metrics = sw(state0, data, idx, key)
        jax.block_until_ready(st.params)
        print(f"Pallas sweep x{sweep}: compile {time.perf_counter()-t0:.0f}s  "
              f"loss[-1] {float(metrics['loss'][-1]):.1f}", flush=True)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, metrics = sw(st, data, idx, key)
        jax.block_until_ready(st.params)
        ms = (time.perf_counter() - t0) / (iters * sweep) * 1e3
        print(f"Pallas sweep x{sweep} (b={b}, maxit={maxit}): {ms:7.2f} ms/step "
              f"({b/ms*1e3:,.0f} frames/s; {ms/maxit:.2f} ms/solver-iter)",
              flush=True)


if __name__ == "__main__":
    main()
