"""Optimizer assembly: Adam + global-norm clip + staircase LR decay.

Reference semantics: Adam(β=(0.9, 0.999), eps=1e-8, weight_decay=0,
amsgrad off) (``common/utils.py:39-50``); global grad-norm clip at 1.0
(``runners/diffpose_frame.py:230``); LR updated only at epochs divisible
by ``decay`` to ``lr·γ^(epoch/decay)`` (``common/utils.py:26-30`` +
``runners/diffpose_frame.py:244-245``) — i.e. a staircase
``lr·γ^⌊epoch/decay⌋``.
"""

from __future__ import annotations

import optax


def staircase_lr(lr: float, gamma: float, decay_epochs: int, steps_per_epoch: int):
    """Per-step schedule implementing the reference's epoch staircase."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * gamma ** (epoch // decay_epochs)

    return schedule


def make_optimizer(
    *,
    optimizer: str = "Adam",
    lr: float = 2e-5,
    lr_gamma: float = 0.9,
    decay_epochs: int = 60,
    steps_per_epoch: int = 1,
    grad_clip: float = 1.0,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    schedule = staircase_lr(lr, lr_gamma, decay_epochs, steps_per_epoch)
    if optimizer == "Adam":
        opt = optax.adam(schedule, b1=0.9, b2=0.999, eps=eps)
    elif optimizer == "RMSProp":
        opt = optax.rmsprop(schedule)
    elif optimizer == "SGD":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise NotImplementedError(f"Optimizer {optimizer} not understood.")
    return optax.chain(optax.clip_by_global_norm(grad_clip), opt)
