"""Synthetic H3.6M-shaped data for tests and benchmarks.

The real dataset npz files are not distributable with the repo; this
module fabricates geometrically plausible data in exactly the same flat
format (:class:`~diffpose_tpu.data.pipeline.FlatDataset`): random bone
poses on the 17-joint skeleton, pinhole-projected to 2D, wrapped in
``n_kernels`` GMM kernels with small jitter.
"""

from __future__ import annotations

import numpy as np

from diffpose_tpu.data.pipeline import FlatDataset
from diffpose_tpu.data.h36m import ALL_ACTIONS
from diffpose_tpu.graph import H36M_EDGES

# Approximate H3.6M bone lengths in meters, indexed by (parent, child) edge order.
_BONE_LENGTHS = (
    0.13, 0.45, 0.45, 0.13, 0.45, 0.45, 0.24, 0.25, 0.12, 0.12,
    0.15, 0.28, 0.25, 0.15, 0.28, 0.25,
)


def make_synthetic_dataset(
    num_frames: int = 2048,
    n_kernels: int = 5,
    seed: int = 0,
    noise_2d: float = 0.01,
    pose_modes: int | None = None,
) -> FlatDataset:
    """``pose_modes=None`` (default) draws i.i.d. random bone directions —
    maximally diverse, but single-frame lifting is then depth-ambiguous by
    construction (every bone has a mirror-depth solution), so eval MPJPE
    floors high no matter how well a model trains.  ``pose_modes=K``
    clusters the poses around K prototype direction sets (small jitter),
    the well-posed regime real mocap sits in: 2D evidence identifies the
    prototype, so a trained lifter/denoiser CAN drive MPJPE far below the
    unconditional floor.  Used by ``scripts/hw_learning.py`` to
    demonstrate end-to-end learning on hardware."""
    rng = np.random.default_rng(seed)

    # Build random but skeleton-consistent 3D poses: fixed bone lengths,
    # smoothly varying random directions per frame.
    if pose_modes:
        # Prototypes come from a FIXED stream (keyed only by pose_modes) so
        # differently-seeded train/eval splits share the same pose manifold
        # while drawing disjoint frames from it.
        proto_rng = np.random.default_rng(19_690_720 + pose_modes)
        protos = proto_rng.normal(size=(pose_modes, len(H36M_EDGES), 3))
        protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
        assign = rng.integers(0, pose_modes, size=num_frames)
        directions = protos[assign] + 0.08 * rng.normal(
            size=(num_frames, len(H36M_EDGES), 3))
    else:
        directions = rng.normal(size=(num_frames, len(H36M_EDGES), 3))
    directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
    poses = np.zeros((num_frames, 17, 3), np.float32)
    for e, (parent, child) in enumerate(H36M_EDGES):
        poses[:, child] = poses[:, parent] + _BONE_LENGTHS[e] * directions[:, e]

    # Camera-space: push away from the camera and pinhole-project.
    cam_pose = poses + np.array([0.0, 0.0, 4.5], np.float32)
    uv = cam_pose[..., :2] / cam_pose[..., 2:]

    # GMM kernels around the projected uv with jitter; Dirichlet weights.
    weights = rng.dirichlet(np.ones(n_kernels), size=(num_frames, 17)).astype(np.float32)
    means = (
        uv[:, :, None, :]
        + rng.normal(scale=noise_2d, size=(num_frames, 17, n_kernels, 2))
    ).astype(np.float32)
    variances = rng.uniform(
        0.5 * noise_2d, 2.0 * noise_2d, size=(num_frames, 17, n_kernels, 2)
    ).astype(np.float32)
    gmm = np.concatenate([weights[..., None], means, variances], axis=-1)

    action_ids = rng.integers(0, len(ALL_ACTIONS), size=num_frames).astype(np.int32)
    camera_para = np.tile(
        np.asarray([2.29, 2.2876, 0.025, 0.029], np.float32), (num_frames, 1)
    )
    poses = poses - poses[:, :1, :]
    return FlatDataset(poses, gmm, action_ids, camera_para, ALL_ACTIONS)
