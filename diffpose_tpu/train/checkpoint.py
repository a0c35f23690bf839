"""Orbax checkpointing with *full* train-state resume.

The reference saves ``[model, optimizer, epoch, step, ema]`` every epoch
but only ever restores the model weights — ``start_epoch`` is hardcoded 0
(``runners/diffpose_frame.py:130-132, 185``), so true resume doesn't
exist there.  Here the whole :class:`~diffpose_tpu.train.state.TrainState`
(params, optimizer state, EMA shadow, step/epoch counters) round-trips.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from diffpose_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: Optional[int] = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: TrainState, *, pose_params=None, wait: bool = False):
        payload = {"state": state}
        if pose_params is not None:
            payload["pose_params"] = pose_params
        self._mngr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, template_state: TrainState, *, step: Optional[int] = None,
                template_pose_params=None):
        """Restore into the structure of ``template_state`` (+ pose params).

        Returns ``(state, pose_params_or_None)``; raises if no checkpoint.
        """
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {self._dir}")
        template = {"state": template_state}
        if template_pose_params is not None:
            template["pose_params"] = template_pose_params
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._mngr.restore(step, args=ocp.args.StandardRestore(abstract))
        return restored["state"], restored.get("pose_params")

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()
