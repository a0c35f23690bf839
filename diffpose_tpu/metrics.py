"""Pose-error metrics and per-action accounting.

Protocol #1 (MPJPE) and Protocol #2 (Procrustes-aligned MPJPE) with the
same math as the reference (``common/loss.py:7-64``), but the Procrustes
alignment runs *batched on device* in JAX (the reference drops to per-batch
numpy on the CPU — a device→host sync every eval batch,
``runners/diffpose_frame.py:387``).

The per-action accumulation replicates ``common/utils.py:96-271``
including its averaging conventions (per-action average of per-frame
errors, then unweighted mean over the 15 actions).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

H36M_ACTIONS: Tuple[str, ...] = (
    "Directions", "Discussion", "Eating", "Greeting", "Phoning", "Photo",
    "Posing", "Purchases", "Sitting", "SittingDown", "Smoking", "Waiting",
    "WalkDog", "Walking", "WalkTogether",
)


# ---------------------------------------------------------------------------
# Device-side metrics
# ---------------------------------------------------------------------------


def mpjpe(predicted: Array, target: Array) -> Array:
    """Protocol #1: mean Euclidean distance over joints and batch."""
    assert predicted.shape == target.shape
    return jnp.mean(jnp.linalg.norm(predicted - target, axis=-1))


def mpjpe_per_sample(predicted: Array, target: Array) -> Array:
    """Per-sample mean joint error, shape [B]."""
    return jnp.mean(jnp.linalg.norm(predicted - target, axis=-1), axis=-1)


def weighted_mpjpe(predicted: Array, target: Array, w: Array) -> Array:
    """Per-joint weighted MPJPE (reference ``common/loss.py:16-22``)."""
    return jnp.mean(w * jnp.linalg.norm(predicted - target, axis=-1))


def procrustes_align(predicted: Array, target: Array) -> Array:
    """Optimal rigid alignment (scale+rotation+translation) of ``predicted``
    onto ``target``; batched SVD on device.

    Follows the reference solution (``common/loss.py:25-61``): normalize
    both point sets, ``H = X₀ᵀY₀``, SVD, reflection fix via the sign of
    ``det(R)`` applied to the last column of V and last singular value.
    """
    assert predicted.shape == target.shape and predicted.shape[-1] in (2, 3)
    mu_x = jnp.mean(target, axis=-2, keepdims=True)
    mu_y = jnp.mean(predicted, axis=-2, keepdims=True)
    x0 = target - mu_x
    y0 = predicted - mu_y
    norm_x = jnp.sqrt(jnp.sum(x0 ** 2, axis=(-2, -1), keepdims=True))
    norm_y = jnp.sqrt(jnp.sum(y0 ** 2, axis=(-2, -1), keepdims=True))
    x0 = x0 / norm_x
    y0 = y0 / norm_y

    h = jnp.swapaxes(x0, -2, -1) @ y0
    u, s, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -2, -1)
    r = v @ jnp.swapaxes(u, -2, -1)

    sign = jnp.sign(jnp.linalg.det(r))[..., None]
    v = v.at[..., :, -1].multiply(sign)
    s = s.at[..., -1].multiply(sign[..., 0])
    r = v @ jnp.swapaxes(u, -2, -1)

    tr = jnp.sum(s, axis=-1)[..., None, None]
    a = tr * norm_x / norm_y
    t = mu_x - a * (mu_y @ r)
    return a * (predicted @ r) + t


def p_mpjpe_per_sample(predicted: Array, target: Array) -> Array:
    """Protocol #2 per-sample error, shape [B]."""
    aligned = procrustes_align(predicted, target)
    return jnp.mean(jnp.linalg.norm(aligned - target, axis=-1), axis=-1)


def p_mpjpe(predicted: Array, target: Array) -> Array:
    """Protocol #2 scalar (mean over batch and joints)."""
    return jnp.mean(p_mpjpe_per_sample(predicted, target))


def n_mpjpe(predicted: Array, target: Array) -> Array:
    """Scale-normalized MPJPE (reference ``common/loss.py:67-77``)."""
    norm_pred = jnp.mean(
        jnp.sum(predicted ** 2, axis=-1, keepdims=True), axis=-2, keepdims=True
    )
    norm_tgt = jnp.mean(
        jnp.sum(target * predicted, axis=-1, keepdims=True), axis=-2, keepdims=True
    )
    scale = norm_tgt / norm_pred
    return mpjpe(scale * predicted, target)


def mean_velocity_error(predicted, target) -> float:
    """First-derivative (velocity) error over the frame axis (host numpy)."""
    vp = np.diff(np.asarray(predicted), axis=0)
    vt = np.diff(np.asarray(target), axis=0)
    return float(np.mean(np.linalg.norm(vp - vt, axis=-1)))


def root_center(x: Array) -> Array:
    """Subtract the root joint (index 0) — done before both protocols."""
    return x - x[..., :1, :]


# ---------------------------------------------------------------------------
# Host-side accumulation (per-action tables)
# ---------------------------------------------------------------------------


class AccumLoss:
    """Running sum/count accumulator (reference ``common/utils.py:212-223``)."""

    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


class AverageMeter:
    """Weighted running average (reference ``common/utils.py:9-24``)."""

    def __init__(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count else 0.0


def define_error_list(actions: Sequence[str]) -> Dict[str, Dict[str, AccumLoss]]:
    return {a: {"p1": AccumLoss(), "p2": AccumLoss()} for a in actions}


def _action_name(action: str) -> str:
    idx = action.find(" ")
    return action[:idx] if idx != -1 else action


def accumulate_action_errors(
    error_sum: Dict[str, Dict[str, AccumLoss]],
    p1_per_sample: np.ndarray,
    p2_per_sample: np.ndarray,
    actions: List[str],
    *,
    num_joints: int = 17,
    reference_compat: bool = True,
) -> Dict[str, Dict[str, AccumLoss]]:
    """Fold per-sample P1/P2 errors into the per-action accumulators.

    Replicates ``mpjpe_by_action_p1/p2`` (``common/utils.py:103-152``)
    including the quirk that, for mixed-action batches, the reference
    credits every sample's P2 with the *batch-wide* mean
    (``utils.py:150``).  Pass ``reference_compat=False`` for the corrected
    per-sample attribution.
    """
    p1 = np.asarray(p1_per_sample, np.float64)
    p2 = np.asarray(p2_per_sample, np.float64)
    n = len(actions)
    assert p1.shape[0] == n and p2.shape[0] == n

    if len(set(actions)) == 1:
        name = _action_name(actions[0])
        error_sum[name]["p1"].update(float(p1.mean()) * n * num_joints, n * num_joints)
        error_sum[name]["p2"].update(float(p2.mean()) * n, n)
    else:
        batch_p2_mean = float(p2.mean())
        for i in range(n):
            name = _action_name(actions[i])
            error_sum[name]["p1"].update(float(p1[i]) * num_joints, num_joints)
            if reference_compat:
                error_sum[name]["p2"].update(batch_p2_mean, 1)
            else:
                error_sum[name]["p2"].update(float(p2[i]), 1)
    return error_sum


def summarize_action_errors(
    error_sum: Dict[str, Dict[str, AccumLoss]], print_table: bool = False
) -> Tuple[float, float]:
    """Per-action table + unweighted across-action averages, in millimetres.

    Output format matches ``print_error_action``
    (``common/utils.py:247-271``) byte-for-byte when ``print_table``.
    """
    mean_all = {"p1": AccumLoss(), "p2": AccumLoss()}
    if print_table:
        print("{0:=^12} {1:=^10} {2:=^8}".format("Action", "p#1 mm", "p#2 mm"))
    for action, value in error_sum.items():
        p1 = value["p1"].avg * 1000.0
        p2 = value["p2"].avg * 1000.0
        mean_all["p1"].update(p1, 1)
        mean_all["p2"].update(p2, 1)
        if print_table:
            print("{0:<12} ".format(action), end="")
            print("{0:>6.2f} {1:>10.2f}".format(p1, p2))
    if print_table:
        print(
            "{0:<12} {1:>6.2f} {2:>10.2f}".format(
                "Average", mean_all["p1"].avg, mean_all["p2"].avg
            )
        )
    return mean_all["p1"].avg, mean_all["p2"].avg


class ActionErrorAccumulator:
    """Shared eval-loop accumulation: valid-masking, per-action error sums
    and running P1/P2 meters (mm) — the loop every runner repeats around
    :func:`accumulate_action_errors` (frame, implicit and video eval all
    fold batches the same way; the video family adds a frame axis).
    """

    def __init__(self, actions: Sequence[str], *, num_joints: int = 17,
                 reference_compat: bool = True):
        self.actions = list(actions)
        self.error_sum = define_error_list(self.actions)
        self.p1_meter = AverageMeter()
        self.p2_meter = AverageMeter()
        self.num_joints = num_joints
        self.reference_compat = reference_compat
        self.frames = 0

    def add(self, batch: dict, p1_b, p2_b, *, frames_per_item: int = 1):
        """Fold one batch's per-sample (or per-sample-per-frame, when
        ``frames_per_item > 1``) errors; padded rows are dropped via the
        batch's ``valid`` mask, every frame inherits its window's action."""
        valid = np.asarray(batch["valid"])
        ids = np.asarray(batch["action_ids"])[valid]
        p1_v = np.asarray(p1_b)[valid].reshape(-1)
        p2_v = np.asarray(p2_b)[valid].reshape(-1)
        if frames_per_item > 1:
            ids = np.repeat(ids, frames_per_item)
        names = [self.actions[i] for i in ids]
        self.frames += len(p1_v)
        if names:
            accumulate_action_errors(
                self.error_sum, p1_v, p2_v, names,
                num_joints=self.num_joints,
                reference_compat=self.reference_compat,
            )
            self.p1_meter.update(float(p1_v.mean()) * 1000.0, len(names))
            self.p2_meter.update(float(p2_v.mean()) * 1000.0, len(names))

    def summarize(self, print_table: bool = False) -> Tuple[float, float]:
        return summarize_action_errors(self.error_sum, print_table=print_table)
