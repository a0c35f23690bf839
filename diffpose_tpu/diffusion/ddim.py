"""Device-resident DDIM sampling and the GMM forward process.

The reference drives its reverse loop from host Python, calling the model
once per timestep through ``DataParallel`` (``common/utils_diff.py:46-67``).
Here the entire reverse trajectory is a ``lax.scan`` inside one jit region:
no host round-trips, no per-step dispatch, and the (tiny) per-step math
fuses with the denoiser call.

Step math (η generalizes DDIM→DDPM, reference ``utils_diff.py:59-65``)::

    x0_t   = (x_t − ε̂·√(1−ᾱ_t)) / √ᾱ_t
    c1     = η·√((1 − ᾱ_t/ᾱ_next)(1 − ᾱ_next)/(1 − ᾱ_t))
    c2     = √(1 − ᾱ_next − c1²)
    x_next = √ᾱ_next·x0_t + c1·N(0,I) + c2·ε̂
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def make_skip_sequence(
    skip_type: str, test_timesteps: int, test_num_diffusion_timesteps: int
) -> Tuple[int, ...]:
    """Timestep subsequence for accelerated sampling.

    ``uniform``: ``range(0, T_test, T_test // K)``; ``quad``:
    ``linspace(0, √(0.8·T_test), K)²`` — matching the runner's selection
    (reference ``runners/diffpose_frame.py:310-317``).
    """
    if skip_type == "uniform":
        skip = test_num_diffusion_timesteps // test_timesteps
        return tuple(range(0, test_num_diffusion_timesteps, skip))
    if skip_type == "quad":
        seq = np.linspace(0, np.sqrt(test_num_diffusion_timesteps * 0.8), test_timesteps) ** 2
        return tuple(int(s) for s in seq)
    raise NotImplementedError(skip_type)


def antithetic_timesteps(key: Array, n: int, num_timesteps: int) -> Array:
    """Antithetic timestep pairs: draw ⌈n/2⌉ uniform t, mirror as T−1−t.

    Matches the reference training loop (``runners/diffpose_frame.py:216-218``).
    """
    t = jax.random.randint(key, (n // 2 + 1,), 0, num_timesteps)
    return jnp.concatenate([t, num_timesteps - t - 1])[:n]


def q_sample(x0: Array, t: Array, noise: Array, betas) -> Array:
    """Forward process ``x_t = √ᾱ_t·x0 + √(1−ᾱ_t)·noise``.

    ``noise`` is expected to be *already scaled* per coordinate by the GMM
    kernel std (the reference multiplies ``e`` by ``targets_noise_scale``
    before mixing: ``runners/diffpose_frame.py:219-222``).  ``t`` indexes
    the unpadded ᾱ (no −1 allowed here).

    ``betas`` must be a host (numpy) array: the √ᾱ/√(1−ᾱ) tables are
    precomputed in float64 and baked in as f32 constants — avoiding the
    f32 ``1−ᾱ`` cancellation the reference incurs by mixing in f32 on
    device (``runners/diffpose_frame.py:220-222``).
    """
    ab = np.cumprod(1.0 - np.asarray(betas, np.float64))
    sqrt_ab = jnp.asarray(np.sqrt(ab), x0.dtype)
    sqrt_1mab = jnp.asarray(np.sqrt(1.0 - ab), x0.dtype)
    bshape = (-1,) + (1,) * (x0.ndim - 1)  # rank-agnostic (frame or video)
    return x0 * sqrt_ab[t].reshape(bshape) + noise * sqrt_1mab[t].reshape(bshape)


def ddim_sample(
    denoise_fn: Callable[[Array, Array], Array],
    x: Array,
    seq: Sequence[int],
    betas,
    eta: float = 0.0,
    key: Optional[Array] = None,
    return_x0_preds: bool = False,
):
    """Run the reverse DDIM trajectory over ``seq`` as an on-device scan.

    ``denoise_fn(x_t, t_vec) -> ε̂`` with ``t_vec`` a float [B] vector (the
    same timestep broadcast over the batch, as in the reference sampler).

    Returns the final sample (and, optionally, the stacked x0 predictions —
    the reference returns all intermediates, ``utils_diff.py:50-67``; only
    the final ``xs[-1]`` and occasionally x0 are consumed downstream).
    """
    # All per-step mixing coefficients depend only on (betas, seq, eta), all
    # static — precompute them in float64 on host and feed the scan small
    # f32 constants.  More accurate than the reference's on-device f32
    # ``1 − ᾱ`` arithmetic, and removes all gather/indexing from the loop.
    ab = np.concatenate([[1.0], np.cumprod(1.0 - np.asarray(betas, np.float64))])
    seq = list(int(s) for s in seq)
    ts = list(reversed(seq))
    ts_next = list(reversed([-1] + seq[:-1]))

    at = ab[np.asarray(ts) + 1]
    at_next = ab[np.asarray(ts_next) + 1]
    sqrt_at = np.sqrt(at)
    sqrt_1m_at = np.sqrt(1.0 - at)
    sqrt_at_next = np.sqrt(at_next)

    stochastic = eta != 0.0 and key is not None
    if stochastic:
        c1 = eta * np.sqrt((1.0 - at / at_next) * (1.0 - at_next) / (1.0 - at))
        c2 = np.sqrt((1.0 - at_next) - c1 ** 2)
        step_keys = jax.random.split(key, len(seq))
    else:
        c1 = np.zeros(len(seq))
        c2 = np.sqrt(1.0 - at_next)
        step_keys = jnp.zeros((len(seq), 2), jnp.uint32)

    consts = jnp.asarray(
        np.stack([np.asarray(ts, np.float64), sqrt_at, sqrt_1m_at, sqrt_at_next, c1, c2], axis=1),
        x.dtype,
    )
    batch = x.shape[0]

    def step(x_t, scan_in):
        cs, step_key = scan_in
        t, s_at, s_1m_at, s_at_next, c1_t, c2_t = (cs[i] for i in range(6))
        t_vec = jnp.full((batch,), t, x.dtype)
        et = denoise_fn(x_t, t_vec)
        x0_t = (x_t - et * s_1m_at) / s_at
        x_next = s_at_next * x0_t + c2_t * et
        if stochastic:
            x_next = x_next + c1_t * jax.random.normal(step_key, x_t.shape, x_t.dtype)
        return x_next, (x0_t if return_x0_preds else None)

    x_final, x0_preds = jax.lax.scan(step, x, (consts, step_keys))
    if return_x0_preds:
        return x_final, x0_preds
    return x_final
