"""Multi-process data-parallel worker: the REAL process boundary.

Everything multi-chip elsewhere in the test suite is single-process
``shard_map`` over a virtual device mesh; this module exercises the
multi-controller path the reference never had (§2.6 of the survey — the
reference's only multi-device machinery is intra-process
``torch.nn.DataParallel``, ``runners/diffpose_frame.py:127``):

* ``jax.distributed.initialize`` federates N processes into one JAX
  runtime (CPU/gloo here; on TPU pods the same call auto-detects and the
  collectives ride ICI/DCN);
* each process loads ONLY its slice of every global batch
  (``BatchLoader(process_count=, process_index=)``) and contributes it via
  ``jax.make_array_from_process_local_data``;
* the jitted train/eval shard_map programs span the process boundary —
  gradient ``pmean`` and the eval shards move through cross-process
  collectives.

Run as a script (one invocation per process; see
``tests/test_multiprocess.py`` for the launcher):

    python scripts/mp_worker.py --process-id 0 --num-processes 2 \
        --coordinator 127.0.0.1:PORT --out /tmp/out0.npz

The same functions run single-process (``process_count=1``) to produce
the ground truth the distributed run must match exactly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_problem(seed: int = 0):
    """Tiny-but-real GCNDiff/GCNPose problem, deterministic in ``seed``."""
    import jax
    import jax.numpy as jnp

    from diffpose_tpu.data import make_synthetic_dataset
    from diffpose_tpu.diffusion import get_beta_schedule
    from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
    from diffpose_tpu.models import GCNDiff, GCNPose, ema_register
    from diffpose_tpu.train import TrainState, make_optimizer

    basis = cheb_basis_from_edges(17, H36M_EDGES, order=2)
    diff = GCNDiff(basis=basis, hid_dim=32, num_layers=2, num_heads=4)
    pose = GCNPose(basis=basis, hid_dim=32, num_layers=2, num_heads=4)
    betas = get_beta_schedule(
        "linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51
    )
    params = diff.init(
        {"params": jax.random.PRNGKey(seed)},
        jnp.zeros((2, 17, 5)), jnp.zeros((2,)),
    )["params"]
    pose_params = pose.init(
        {"params": jax.random.PRNGKey(seed + 1)}, jnp.zeros((2, 17, 2))
    )["params"]
    optimizer = make_optimizer(lr=2e-4, steps_per_epoch=1)
    state = TrainState.create(
        params, optimizer.init(params), ema_params=ema_register(params)
    )
    ds = make_synthetic_dataset(num_frames=32, n_kernels=3, seed=11)
    return dict(
        basis=basis, diff=diff, pose=pose, betas=betas,
        optimizer=optimizer, state=state, pose_params=pose_params, ds=ds,
    )


def run_workload(prob, mesh, *, batch_size: int = 16, train_steps: int = 3):
    """Train ``train_steps`` sharded steps + one sharded eval step.

    Identical global math regardless of how many processes contribute the
    mesh: the loader slices the SAME global permutation per process, and
    ``make_array_from_process_local_data`` reassembles the global batch.

    Returns ``(losses, p1_shards, param_checksum)`` where ``p1_shards`` is
    a list of ``(global_offset, values)`` for the locally-addressable
    shards of the per-sample P1 vector.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffpose_tpu.data import BatchLoader
    from diffpose_tpu.parallel import (
        make_sharded_eval_step,
        make_sharded_train_step,
    )

    sharding = NamedSharding(mesh, P("data"))
    loader = BatchLoader(
        prob["ds"], batch_size=batch_size, shuffle=True, seed=5,
        process_count=jax.process_count(), process_index=jax.process_index(),
    )

    def to_global(batch):
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }

    mask = None  # all-True is the default inside the steps
    train_step = make_sharded_train_step(
        prob["diff"], prob["optimizer"], prob["betas"], mesh, mask=mask,
        donate=False,
    )
    state = prob["state"]
    losses = []
    step = 0
    while step < train_steps:
        for batch in loader.epoch(step):
            state, metrics = train_step(
                state, to_global(batch), jax.random.PRNGKey(100 + step)
            )
            losses.append(float(np.asarray(metrics["loss"])))
            step += 1
            if step >= train_steps:
                break

    eval_step = make_sharded_eval_step(
        prob["diff"], prob["pose"], prob["betas"], (0, 12), mesh,
        test_times=2, mask=mask,
    )
    batch = next(iter(loader.epoch(999)))
    p1, _, _ = eval_step(
        state, prob["pose_params"], to_global(batch), jax.random.PRNGKey(7)
    )
    shards = sorted(
        ((s.index[0].start or 0, np.asarray(s.data)) for s in p1.addressable_shards),
        key=lambda t: t[0],
    )
    checksum = float(
        sum(float(np.abs(np.asarray(x)).sum())
            for x in jax.tree_util.tree_leaves(state.params))
    )
    return losses, shards, checksum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import numpy as np

    from diffpose_tpu.parallel.mesh import distributed_init, make_mesh

    idx, count = distributed_init(
        args.coordinator, args.num_processes, args.process_id,
        cpu_collectives="gloo",
    )
    assert count == args.num_processes, (count, args.num_processes)

    prob = build_problem()
    mesh = make_mesh()  # all GLOBAL devices, every process participating
    losses, shards, checksum = run_workload(prob, mesh)

    np.savez(
        args.out,
        losses=np.asarray(losses, np.float64),
        checksum=np.float64(checksum),
        shard_offsets=np.asarray([o for o, _ in shards], np.int64),
        shard_values=np.concatenate([v for _, v in shards]),
        meta=np.bytes_(json.dumps({
            "process_index": idx,
            "process_count": count,
            "global_devices": len(jax.devices()),
            "local_devices": len(jax.local_devices()),
        }).encode()),
    )
    print(f"worker {idx}/{count} OK", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
