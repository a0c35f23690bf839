"""Exponential moving average of parameters, as pure pytree functions.

Matches the reference ``EMAHelper`` update rule
``shadow = (1−μ)·param + μ·shadow`` (``models/ema.py:16-22``), applied after
every optimizer step.  Being a pure function over pytrees, it composes
directly with jit/shard_map (no module-walking, no DataParallel unwrap).
"""

from __future__ import annotations

import jax


def ema_register(params):
    """Initialize the EMA shadow as a *copy* of the live parameters.

    A real copy (not an alias): shadow and live params must be distinct
    buffers so a jitted step may donate the train state.
    """
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(shadow, params, mu: float = 0.999):
    """One EMA step: ``(1−μ)·param + μ·shadow``."""
    return jax.tree_util.tree_map(lambda s, p: (1.0 - mu) * p + mu * s, shadow, params)
