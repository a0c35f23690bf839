"""Context parallelism: shard the temporal (frame) axis across chips.

The joint-graph attention of this model family is tiny (17 joints); the
long axis is the video window (81/243 frames).  Context parallelism here
= block-partitioning frames over a ``context`` mesh axis; spatial blocks
are embarrassingly parallel, and temporal attention all-gathers K/V over
ICI while queries stay sharded (exact attention).  See
:class:`diffpose_tpu.models.video.SpatioTemporalDiff`.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def make_cp_video_forward(
    cp_model,
    mesh: Mesh,
    *,
    cp_axis: str = "context",
    mask=None,
):
    """Jit a frame-sharded forward of a ``SpatioTemporalDiff`` built with
    ``cp_axis=<axis>``.

    Returns ``fn(params, x, t)`` where ``x`` is the full ``[B, F, J, C]``
    window; the frame axis is sharded over ``cp_axis`` and each shard runs
    the module on its local block (the module gathers K/V internally).
    """
    assert cp_model.cp_axis == cp_axis, "model must be built with cp_axis set"

    def local_fn(params, x, t):
        return cp_model.apply({"params": params}, x, t, mask)

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, cp_axis), P()),
        out_specs=P(None, cp_axis),
        check_vma=False,
    )
    return jax.jit(sharded)
