"""Device-memory-aware batch sizing.

TPU-native counterpart of the reference's dynamic chunk sizing
(``common/memory_utils.py``): instead of reactively chunking batches when
CUDA runs out of memory, pick a per-chip batch size up front from the
chip's HBM budget — XLA's static shapes then never OOM mid-run.
"""

from __future__ import annotations

from typing import Optional

import jax


def device_memory_budget(device: Optional[jax.Device] = None, fraction: float = 0.9) -> int:
    """Usable HBM bytes on ``device`` (defaults to the first device)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    limit = stats.get("bytes_limit")
    if limit is None:
        # Reasonable defaults per generation when stats are unavailable.
        limit = 16 * 1024 ** 3
    in_use = stats.get("bytes_in_use", 0)
    return max(int(limit * fraction) - int(in_use), 0)


def suggest_batch_size(
    per_sample_bytes: int,
    *,
    fixed_bytes: int = 0,
    device: Optional[jax.Device] = None,
    target_fraction: float = 0.9,
    min_batch: int = 8,
    max_batch: int = 65536,
    multiple_of: int = 8,
) -> int:
    """Largest batch that fits the HBM budget, rounded to ``multiple_of``.

    ``per_sample_bytes`` should cover activations (+grads for training);
    ``fixed_bytes`` covers parameters/optimizer state.  Equivalent role to
    ``get_dynamic_chunk_size`` (``memory_utils.py:30-110``) but decided
    once, statically.
    """
    budget = device_memory_budget(device, target_fraction) - fixed_bytes
    if per_sample_bytes <= 0:
        return max_batch
    n = budget // per_sample_bytes
    n = (n // multiple_of) * multiple_of
    return int(min(max(n, min_batch), max_batch))


def estimate_per_sample_bytes(
    n_joints: int = 17,
    hid_dim: int = 96,
    num_layers: int = 5,
    dtype_bytes: int = 4,
    train: bool = True,
) -> int:
    """Rough per-sample activation footprint of the denoiser forward(+bwd)."""
    # ~6 live [J, hid] tensors per layer block, doubled for backward.
    per_layer = 6 * n_joints * hid_dim * dtype_bytes
    total = per_layer * num_layers * (2 if train else 1)
    return int(total * 1.5)  # fudge for attention scores and fusion slack
