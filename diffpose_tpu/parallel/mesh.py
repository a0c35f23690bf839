"""Device-mesh construction and multi-host initialization.

The reference's only multi-device machinery is single-process
``torch.nn.DataParallel`` (``runners/diffpose_frame.py:127``), which
replicates and scatter/gathers on every forward.  Here parallelism is an
explicit first-class layer: a ``jax.sharding.Mesh`` with a ``data`` axis
(optionally a ``hypothesis`` axis for multi-hypothesis eval), XLA
collectives over ICI within a slice, and ``jax.distributed`` over DCN for
multi-host.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_collectives: Optional[str] = None,
) -> Tuple[int, int]:
    """Initialize multi-host JAX (DCN) if applicable; returns (index, count).

    Safe to call in single-process jobs (no-op).  With TPU pod slices the
    arguments are auto-detected from the environment.

    ``cpu_collectives`` ("gloo" or "mpi") selects the CPU cross-process
    collective backend — required for multi-process runs on the CPU
    platform (the harness for testing the process boundary without a pod:
    ``tests/test_multiprocess.py`` / ``scripts/mp_worker.py``).  TPU runs
    leave it None (collectives ride ICI/DCN via the TPU runtime).
    """
    if num_processes is not None and num_processes > 1:
        if cpu_collectives is not None:
            jax.config.update(
                "jax_cpu_collectives_implementation", cpu_collectives
            )
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh over the available devices.

    Default: a 1-D ``('data',)`` mesh over all devices — the natural layout
    for this workload (a ~1.4M-parameter model needs no tensor sharding;
    frames/hypotheses shard over ``data``).  Pass e.g.
    ``axis_sizes=(4, 2), axis_names=('data', 'hypothesis')`` for a 2-D
    mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    assert int(np.prod(axis_sizes)) == len(devices), (
        f"mesh {tuple(axis_sizes)} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))
