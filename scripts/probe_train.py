"""Hardware probe for the training step: where does the wall-clock go?

Times, at batch 1024 (reference train config):

  (a) jitted fused step, device-resident batch, donated state  — pure step
  (b) same step with a fresh host batch staged each call        — loader path
  (c) train_sweep (device-resident dataset + N steps/dispatch)  — sweep path

Optionally writes a ``jax.profiler`` trace of (b) to ``/tmp/train_trace``.

Usage: python scripts/probe_train.py [iters] [--trace] [--f32]

``--f32``: true-f32 matmul passes (the trainer's parity-grade default,
``train_matmul_precision="float32"``); default is single-pass bf16.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# (No persistent-cache env: this backend ignores the JAX compilation
# cache — no entries are ever written — so setting it buys nothing.)

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.models import GCNDiff
from diffpose_tpu.train.optim import make_optimizer
from diffpose_tpu.train.state import TrainState
from diffpose_tpu.train.steps import make_train_step, make_train_sweep_step
from diffpose_tpu.diffusion import get_beta_schedule

B = 1024
N_DATA = 65536  # device-resident pool for the sweep path
K_GMM = 5


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 30
    trace = "--trace" in sys.argv
    prec = None
    for a in sys.argv:
        if a.startswith("--prec="):
            prec = a.split("=", 1)[1]
    if "--f32" in sys.argv:
        prec = "float32"
    if prec:
        jax.config.update("jax_default_matmul_precision", prec)
        print(f"matmul precision: {prec}", flush=True)
    else:
        print("matmul precision: default (single-pass bf16)", flush=True)

    basis = cheb_basis_from_edges(17, H36M_EDGES)
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=1e-3,
                              num_diffusion_timesteps=51)
    model = GCNDiff(basis=basis)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, 17, 5)), jnp.zeros((2,)))["params"]
    opt = make_optimizer(lr=2e-4, steps_per_epoch=1)
    # ema_params must be a COPY: aliasing params in a donated pytree makes
    # the TPU runtime reject the execute (same buffer donated twice).
    from diffpose_tpu.models import ema_register
    state = TrainState.create(params=params, opt_state=opt.init(params),
                              ema_params=ema_register(params))
    mask = jnp.ones((1, 1, 17))

    rng = np.random.default_rng(0)
    pool3d = rng.normal(size=(N_DATA, 17, 3)).astype(np.float32)
    pool2d = rng.normal(size=(N_DATA, 17, K_GMM, 5)).astype(np.float32)
    pool2d[..., 0] = np.abs(pool2d[..., 0]) + 0.5  # kernel weights
    pool2d[..., 3:5] = np.abs(pool2d[..., 3:5]) * 0.01 + 1e-3  # var_u, var_v

    step = make_train_step(model, opt, betas, mask=mask)
    step_j = jax.jit(step, donate_argnums=(0,))

    batch_dev = {
        "poses_3d": jax.device_put(jnp.asarray(pool3d[:B])),
        "poses_2d_gmm": jax.device_put(jnp.asarray(pool2d[:B])),
    }
    key = jax.random.PRNGKey(1)

    # -- (a) device-resident batch ------------------------------------
    state, m = step_j(state, batch_dev, key)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_j(state, batch_dev, jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])
    ms_a = (time.perf_counter() - t0) / iters * 1e3
    print(f"(a) device-resident batch:        {ms_a:7.2f} ms/step "
          f"({B/ms_a*1e3:,.0f} frames/s)", flush=True)

    # -- (b) fresh host batch each call --------------------------------
    host_batches = [
        {"poses_3d": pool3d[i * B:(i + 1) * B],
         "poses_2d_gmm": pool2d[i * B:(i + 1) * B]}
        for i in range(8)
    ]
    ctx = jax.profiler.trace("/tmp/train_trace") if trace else None
    if ctx:
        ctx.__enter__()
    t0 = time.perf_counter()
    for i in range(iters):
        hb = host_batches[i % 8]
        batch = {k: jnp.asarray(v) for k, v in hb.items()}
        state, m = step_j(state, batch, jax.random.fold_in(key, 1000 + i))
    jax.block_until_ready(m["loss"])
    ms_b = (time.perf_counter() - t0) / iters * 1e3
    if ctx:
        ctx.__exit__(None, None, None)
        print("trace written to /tmp/train_trace", flush=True)
    print(f"(b) host batch staged per call:   {ms_b:7.2f} ms/step "
          f"({B/ms_b*1e3:,.0f} frames/s)", flush=True)

    # -- (c) sweep: device-resident dataset, N steps per dispatch ------
    data_dev = {
        "poses_3d": jax.device_put(jnp.asarray(pool3d)),
        "poses_2d_gmm": jax.device_put(jnp.asarray(pool2d)),
    }
    for sweep in (8, 32):
        sweep_fn = jax.jit(
            make_train_sweep_step(model, opt, betas, sweep=sweep, mask=mask),
            donate_argnums=(0,),
        )
        idx = jnp.asarray(
            rng.integers(0, N_DATA, size=(sweep, B)).astype(np.int32))
        state, m = sweep_fn(state, data_dev, idx, key)
        jax.block_until_ready(m["loss"])
        n_disp = max(2, iters // sweep)
        t0 = time.perf_counter()
        for i in range(n_disp):
            idx = jnp.asarray(
                rng.integers(0, N_DATA, size=(sweep, B)).astype(np.int32))
            state, m = sweep_fn(state, data_dev, idx, jax.random.fold_in(key, 2000 + i))
        jax.block_until_ready(m["loss"])
        ms_c = (time.perf_counter() - t0) / (n_disp * sweep) * 1e3
        print(f"(c) sweep={sweep:3d} steps/dispatch:    {ms_c:7.2f} ms/step "
              f"({B/ms_c*1e3:,.0f} frames/s)", flush=True)


if __name__ == "__main__":
    main()
