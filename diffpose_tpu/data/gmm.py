"""GMM keypoint-distribution sampling, jit-friendly.

The reference draws one GMM kernel per joint per frame on the host with
``np.random.choice`` inside a DataLoader worker
(``common/generators.py:36-38``).  Here the draw is a vectorized
``jax.random.categorical`` over the kernel-weight logits — pure, keyed,
reproducible, and runnable on device inside the jitted train step (no
32-worker host pool needed).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def sample_gmm_batch(key: Array, poses_2d_gmm: Array, poses_3d: Array) -> Tuple[Array, Array, Array]:
    """Draw per-joint GMM kernels and assemble (uvxyz, noise_scale, pose_2d).

    ``poses_2d_gmm``: [B, J, K, 5] with kernel = [weight, mean_u, mean_v,
    var_u, var_v]; ``poses_3d``: [B, J, 3] (already root-centered).

    Returns:
      * ``uvxyz``       [B, J, 5] — selected kernel mean uv ∥ xyz
      * ``noise_scale`` [B, J, 5] — [var_u, var_v, 1, 1, 1]
      * ``pose_2d``     [B, J, 2] — the selected kernel means

    Matches the reference sample assembly
    (``common/generators.py:40-45``).
    """
    b, j, k, c = poses_2d_gmm.shape
    assert c == 5
    logits = jnp.log(jnp.maximum(poses_2d_gmm[..., 0], 1e-12))
    choice = jax.random.categorical(key, logits, axis=-1)  # [B, J]
    kernel = jnp.take_along_axis(
        poses_2d_gmm, choice[..., None, None], axis=2
    )[:, :, 0, :]  # [B, J, 5]

    mean_uv = kernel[..., 1:3]
    var_uv = kernel[..., 3:5]
    uvxyz = jnp.concatenate([mean_uv, poses_3d], axis=-1)
    ones = jnp.ones_like(poses_3d)
    noise_scale = jnp.concatenate([var_uv, ones], axis=-1)
    return uvxyz, noise_scale, mean_uv


def sample_gmm_batch_per_sample(
    base_key: Array, seeds: Array, poses_2d_gmm: Array, poses_3d: Array
) -> Tuple[Array, Array, Array]:
    """Per-sample-keyed GMM draw: sharding-layout invariant.

    Each sample's kernel choice depends only on ``(base_key, seeds[i])`` —
    not on the batch shape — so evaluating a dataset sharded over N chips
    draws *exactly* the same kernels as a single-chip run.  ``seeds`` is a
    per-sample int32 id emitted by the loader.
    """

    def one(seed, gmm, p3):
        key = jax.random.fold_in(base_key, seed)
        logits = jnp.log(jnp.maximum(gmm[..., 0], 1e-12))  # [J, K]
        choice = jax.random.categorical(key, logits, axis=-1)  # [J]
        kernel = jnp.take_along_axis(gmm, choice[:, None, None], axis=1)[:, 0, :]
        mean_uv = kernel[..., 1:3]
        var_uv = kernel[..., 3:5]
        uvxyz = jnp.concatenate([mean_uv, p3], axis=-1)
        noise_scale = jnp.concatenate([var_uv, jnp.ones_like(p3)], axis=-1)
        return uvxyz, noise_scale, mean_uv

    return jax.vmap(one)(seeds, poses_2d_gmm, poses_3d)


def gmm_mean_pose_2d(poses_2d_gmm: Array) -> Array:
    """Weight-averaged 2D pose (the distribution mean), [B, J, 2].

    Deterministic alternative used at eval time when a single 2D estimate
    is wanted instead of a sampled kernel.
    """
    w = poses_2d_gmm[..., 0:1]
    return jnp.sum(w * poses_2d_gmm[..., 1:3], axis=2) / jnp.maximum(
        jnp.sum(w, axis=2), 1e-12
    )
