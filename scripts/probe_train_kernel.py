"""Hardware timing: fused Pallas train step vs the XLA train step.

Usage: probe_train_kernel.py [iters] [--bf=F --bb=B --grp=G --sweep=N --vmem=MB]

Baselines measured earlier (scripts/probe_train.py, b=1024, device-resident
batch, donated state): XLA float32 22.50 ms, XLA BF16_BF16_F32_X3 19.89 ms.
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
from diffpose_tpu.models import GCNDiff, ema_register
from diffpose_tpu.train.optim import make_optimizer
from diffpose_tpu.train.state import TrainState
from diffpose_tpu.diffusion import get_beta_schedule
from diffpose_tpu.ops.pallas_train import make_pallas_train_step

B = 1024


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 30
    bf = next((int(a[5:]) for a in sys.argv if a.startswith("--bf=")), 64)
    bb = next((int(a[5:]) for a in sys.argv if a.startswith("--bb=")), 32)
    grp = next((int(a[6:]) for a in sys.argv if a.startswith("--grp=")), 17)
    vmem_mb = next((int(a[7:]) for a in sys.argv if a.startswith("--vmem=")), 0)

    if "--nomask" in sys.argv:
        # constant keep-everything masks: isolates the dropout-RNG cost
        import diffpose_tpu.ops.train_ref as _tr
        import diffpose_tpu.ops.pallas_train as _pt

        real = _tr.make_dropout_masks

        def const_masks(key, **kw):
            m = real(jax.random.PRNGKey(0), **kw)
            return _tr.DropoutMasks(*[jnp.ones_like(x) for x in m])

        _tr.make_dropout_masks = const_masks
        _pt.make_dropout_masks = const_masks  # not imported there, but safe
        print("NOMASK: constant all-ones dropout masks", flush=True)

    basis = cheb_basis_from_edges(17, H36M_EDGES)
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    model = GCNDiff(basis=basis)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    opt = make_optimizer(lr=2e-4, steps_per_epoch=1)
    state = TrainState.create(params=params, opt_state=opt.init(params),
                              ema_params=ema_register(params))

    rng = np.random.default_rng(0)
    pool3d = rng.normal(size=(B, 17, 3)).astype(np.float32)
    pool2d = rng.normal(size=(B, 17, 5, 5)).astype(np.float32)
    pool2d[..., 0] = np.abs(pool2d[..., 0]) + 0.5
    pool2d[..., 3:5] = np.abs(pool2d[..., 3:5]) * 0.01 + 1e-3
    batch = {
        "poses_3d": jax.device_put(jnp.asarray(pool3d)),
        "poses_2d_gmm": jax.device_put(jnp.asarray(pool2d)),
    }

    sweep = next((int(a[8:]) for a in sys.argv if a.startswith("--sweep=")), 0)

    prec = next((a[7:] for a in sys.argv if a.startswith("--prec=")), "bf16x3")
    step = make_pallas_train_step(
        opt, betas, basis, block_b_fwd=bf, block_b_bwd=bb, group=grp,
        precision=prec, vmem_limit_bytes=vmem_mb * 2**20 or None)
    key = jax.random.PRNGKey(1)

    if sweep:
        # Production composition: the pallas step inside make_train_sweep_step's
        # lax.scan over a device-resident dataset (what `--train_sweep N
        # --train_impl pallas` runs in the trainer).
        from diffpose_tpu.train.steps import make_train_sweep_step

        n_pool = 4096
        p2 = rng.normal(size=(n_pool, 17, 5, 5)).astype(np.float32)
        p2[..., 0] = np.abs(p2[..., 0]) + 0.5
        p2[..., 3:5] = np.abs(p2[..., 3:5]) * 0.01 + 1e-3
        data = {
            "poses_3d": jax.device_put(jnp.asarray(
                rng.normal(size=(n_pool, 17, 3)).astype(np.float32))),
            "poses_2d_gmm": jax.device_put(jnp.asarray(p2)),
        }

        sweep_step = make_train_sweep_step(
            None, opt, betas, sweep=sweep,
            base_step=lambda st, bt, k: step(st, bt, k))
        step_j = jax.jit(sweep_step, donate_argnums=(0,))
        idx = jnp.asarray(
            rng.integers(0, n_pool, size=(sweep, B)), jnp.int32)

        t0 = time.perf_counter()
        state, m = step_j(state, data, idx, key)
        jax.block_until_ready(m["loss"])
        print(f"compile {time.perf_counter()-t0:.0f}s  "
              f"first loss {float(m['loss'][-1]):.4f}", flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = step_j(state, data, idx, jax.random.fold_in(key, i))
        jax.block_until_ready(m["loss"])
        ms = (time.perf_counter() - t0) / (iters * sweep) * 1e3
        print(f"fused train SWEEP (sweep={sweep} bf={bf} bb={bb} grp={grp}): "
              f"{ms:7.2f} ms/step ({B/ms*1e3:,.0f} frames/s)  "
              f"loss {float(m['loss'][-1]):.4f}", flush=True)
        return

    step_j = jax.jit(step, donate_argnums=(0,))

    t0 = time.perf_counter()
    state, m = step_j(state, batch, key)
    jax.block_until_ready(m["loss"])
    print(f"compile {time.perf_counter()-t0:.0f}s  first loss {float(m['loss']):.4f}",
          flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_j(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"fused train step (bf={bf} bb={bb} grp={grp}): {ms:7.2f} ms/step "
          f"({B/ms*1e3:,.0f} frames/s)  loss {float(m['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
