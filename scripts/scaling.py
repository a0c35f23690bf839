"""Scaling-efficiency harness: frames/s at 1..N devices (north star:
"≥80% scaling efficiency at N≥2 hosts", SURVEY §6 / BASELINE.md).

Weak scaling: the per-device batch stays fixed and the global batch grows
with the mesh, so perfect scaling is fps(n) = n · fps(1) and
efficiency(n) = fps(n) / (n · fps(1)).

Measures the production eval program (lift + 2-step DDIM, the headline
workload) and the data-parallel train step (grad pmean over the mesh
axis), each as ONE jitted shard_map program per mesh size.

Runs anywhere:
* virtual CPU mesh (default here): validates the harness + the sharded
  programs at every width — `env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python scripts/scaling.py`
* real pod slice: the same command with no env overrides measures true
  ICI scaling; multi-host, run one process per host with
  `diffpose_tpu.parallel.mesh.distributed_init` (see scripts/mp_worker.py)
  and the mesh spans all global devices automatically.

Prints one JSON line per (workload, n) and a final summary line; use
--markdown to also emit a table (docs/SCALING.md is a committed example).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n_devices, per_device_batch, test_times, hid_dim, num_layers):
    import jax
    import jax.numpy as jnp

    from diffpose_tpu.data import BatchLoader, make_synthetic_dataset
    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
    from diffpose_tpu.models import GCNDiff, GCNPose, ema_register
    from diffpose_tpu.parallel import (
        make_mesh,
        make_sharded_eval_step,
        make_sharded_train_step,
        shard_batch,
    )
    from diffpose_tpu.train import TrainState, make_optimizer

    basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
    diff = GCNDiff(basis=basis, hid_dim=hid_dim, num_layers=num_layers)
    pose = GCNPose(basis=basis, hid_dim=hid_dim, num_layers=num_layers)
    betas = get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51
    )
    params = diff.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((2, 17, 5)), jnp.zeros((2,))
    )["params"]
    pose_params = pose.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((2, 17, 2))
    )["params"]
    optimizer = make_optimizer(lr=2e-5, steps_per_epoch=1)
    state = TrainState.create(
        params, optimizer.init(params), ema_params=ema_register(params)
    )

    mesh = make_mesh(devices=jax.devices()[:n_devices])
    batch_size = per_device_batch * n_devices
    ds = make_synthetic_dataset(num_frames=batch_size, n_kernels=3, seed=0)
    loader = BatchLoader(ds, batch_size=batch_size, shuffle=False)
    batch = shard_batch(mesh, next(iter(loader.epoch(0))))

    eval_step = make_sharded_eval_step(
        diff, pose, betas, (0, 12), mesh, test_times=test_times
    )
    train_step = make_sharded_train_step(
        diff, optimizer, betas, mesh, donate=False
    )
    return dict(
        mesh=mesh, batch=batch, state=state, pose_params=pose_params,
        eval_step=eval_step, train_step=train_step, batch_size=batch_size,
    )


def _time(fn, iters):
    import jax

    fn()  # compile + warmup
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out,
    )
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma list of mesh widths (default: 1,2,4,..,N)")
    ap.add_argument("--per-device-batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--test-times", type=int, default=1)
    ap.add_argument("--hid-dim", type=int, default=96)
    ap.add_argument("--num-layers", type=int, default=5)
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()

    import jax

    n_avail = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    if args.per_device_batch is None:
        args.per_device_batch = 1024 if on_tpu else 64
    if args.devices:
        widths = [int(x) for x in args.devices.split(",")]
    else:
        widths = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= n_avail]

    rows = []
    base = {}
    for n in widths:
        import jax.random as jr

        b = build(n, args.per_device_batch, args.test_times,
                  args.hid_dim, args.num_layers)
        key = jr.PRNGKey(9)
        for name, fn in (
            ("eval", lambda: b["eval_step"](
                b["state"], b["pose_params"], b["batch"], key)),
            ("train", lambda: b["train_step"](b["state"], b["batch"], key)),
        ):
            dt = _time(fn, args.iters)
            fps = b["batch_size"] / dt
            row = dict(workload=name, devices=n, batch=b["batch_size"],
                       ms_per_step=round(dt * 1e3, 3),
                       frames_per_sec=round(fps, 1))
            if n == min(widths):
                base[name] = fps / n
            row["efficiency_pct"] = round(100 * fps / (n * base[name]), 1)
            rows.append(row)
            print(json.dumps(row), flush=True)

    summary = {
        "platform": jax.default_backend(),
        "process_count": jax.process_count(),
        "min_eval_efficiency_pct": min(
            r["efficiency_pct"] for r in rows
            if r["workload"] == "eval" and r["devices"] > min(widths)
        ) if len(widths) > 1 else 100.0,
    }
    print(json.dumps({"summary": summary}), flush=True)

    if args.markdown:
        print("\n| workload | devices | global batch | ms/step | frames/s | efficiency |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['workload']} | {r['devices']} | {r['batch']} | "
                  f"{r['ms_per_step']} | {r['frames_per_sec']:,} | "
                  f"{r['efficiency_pct']}% |")


if __name__ == "__main__":
    main()
