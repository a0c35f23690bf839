"""Train state pytree: parameters, optimizer state, EMA shadow, counters.

Unlike the reference — which saves optimizer/epoch/EMA but never restores
them (``runners/diffpose_frame.py:130-132``, start_epoch hardcoded 0 at
``:185``) — this state is the single source of truth for full resume.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Optional[Any]
    step: jax.Array          # int32 scalar
    epoch: jax.Array         # int32 scalar
    model_state: Any = None  # mutable collections (e.g. IGCN batch_stats)

    @classmethod
    def create(cls, params, opt_state, ema_params=None, model_state=None):
        import jax.numpy as jnp

        return cls(
            params=params,
            opt_state=opt_state,
            ema_params=ema_params,
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
            model_state=model_state,
        )
