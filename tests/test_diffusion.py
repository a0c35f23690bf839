import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.diffusion import (
    antithetic_timesteps,
    compute_alpha,
    ddim_sample,
    get_beta_schedule,
    make_skip_sequence,
    q_sample,
)
from diffpose_tpu.diffusion.schedule import padded_alphas_cumprod
from tests.oracle import load_reference_module


BETAS = get_beta_schedule(
    "linear", beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51
)


def test_beta_schedules_match_reference_oracle():
    ref = load_reference_module("common.utils_diff")
    for name in ["quad", "linear", "const", "jsd", "sigmoid"]:
        want = ref.get_beta_schedule(
            beta_schedule=name, beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51
        )
        got = get_beta_schedule(
            name, beta_start=1e-4, beta_end=1e-3, num_diffusion_timesteps=51
        )
        np.testing.assert_allclose(got, want, atol=1e-15)


def test_cosine_schedule_matches_reference_b_variant():
    ref_b = load_reference_module("common.utils_diff_b")
    want = ref_b.get_beta_schedule("cosine", 1e-4, 1e-3, 51)
    got = get_beta_schedule("cosine", beta_start=1e-4, beta_end=1e-3,
                            num_diffusion_timesteps=51)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_compute_alpha_matches_reference_oracle():
    ref = load_reference_module("common.utils_diff")
    import torch

    t = np.array([0, 12, 24, 50, -1], dtype=np.int64)
    want = ref.compute_alpha(torch.from_numpy(BETAS).float(), torch.from_numpy(t)).numpy()
    got = np.asarray(compute_alpha(jnp.asarray(BETAS, jnp.float32), t))
    np.testing.assert_allclose(got, want, atol=1e-7)
    # t = −1 gives ᾱ = 1 exactly.
    np.testing.assert_allclose(got[-1], 1.0, atol=0)


def test_skip_sequences():
    assert make_skip_sequence("uniform", 2, 24) == (0, 12)
    assert make_skip_sequence("uniform", 2, 12) == (0, 6)
    # quad: linspace(0, sqrt(0.8*24), 2)^2 → [0, int(19.2)]
    assert make_skip_sequence("quad", 2, 24) == (0, 19)


def test_antithetic_timesteps_mirror():
    key = jax.random.PRNGKey(0)
    t = np.asarray(antithetic_timesteps(key, 8, 51))
    assert t.shape == (8,)
    assert t.min() >= 0 and t.max() < 51
    half = 8 // 2 + 1
    first = np.asarray(antithetic_timesteps(key, 10, 51))[:6]
    mirrored = np.asarray(antithetic_timesteps(key, 10, 51))[6:]
    np.testing.assert_array_equal(mirrored, 51 - first[: len(mirrored)] - 1)


def test_q_sample_formula(rng):
    x0 = rng.normal(size=(4, 17, 5)).astype(np.float32)
    noise = rng.normal(size=(4, 17, 5)).astype(np.float32)
    t = np.array([0, 10, 25, 50])
    got = np.asarray(q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise), BETAS))
    a = np.cumprod(1 - BETAS)[t][:, None, None]
    want = x0 * np.sqrt(a) + noise * np.sqrt(1 - a)
    np.testing.assert_allclose(got, want, atol=1e-6)


def _numpy_ddim_oracle(x, seq, betas, model_np, eta=0.0):
    """Hand-rolled reverse loop following the published DDIM step formula."""
    ab = np.concatenate([[1.0], np.cumprod(1 - betas)])
    seq_next = [-1] + list(seq[:-1])
    for i, j in zip(reversed(seq), reversed(seq_next)):
        at, at_next = ab[i + 1], ab[j + 1]
        et = model_np(x, np.full((x.shape[0],), float(i)))
        x0 = (x - et * np.sqrt(1 - at)) / np.sqrt(at)
        c2 = np.sqrt(1 - at_next)  # eta = 0
        x = np.sqrt(at_next) * x0 + c2 * et
    return x


def test_ddim_scan_matches_loop_oracle(rng):
    # Linear "denoiser": ε̂ = 0.1·x + 0.01·t (exactly representable math).
    def model_np(x, t):
        return 0.1 * x + 0.01 * t[:, None, None]

    def model_jax(x, t):
        return 0.1 * x + 0.01 * t[:, None, None]

    x = rng.normal(size=(3, 17, 5)).astype(np.float32)
    seq = make_skip_sequence("uniform", 2, 24)
    want = _numpy_ddim_oracle(x.copy(), list(seq), BETAS, model_np)
    got = np.asarray(
        ddim_sample(model_jax, jnp.asarray(x), seq, jnp.asarray(BETAS, jnp.float32))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ddim_longer_sequence_and_x0_preds(rng):
    def model_jax(x, t):
        return 0.05 * x - 0.002 * t[:, None, None]

    x = rng.normal(size=(2, 17, 5)).astype(np.float32)
    seq = make_skip_sequence("uniform", 10, 50)
    out, x0s = ddim_sample(
        model_jax, jnp.asarray(x), seq, jnp.asarray(BETAS, jnp.float32), return_x0_preds=True
    )
    assert out.shape == x.shape
    assert x0s.shape == (10,) + x.shape

    def model_np(x, t):
        return 0.05 * x - 0.002 * t[:, None, None]

    want = _numpy_ddim_oracle(x.copy(), list(seq), BETAS, model_np)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_ddim_eta_stochastic_shapes(rng):
    def model_jax(x, t):
        return 0.1 * x

    x = jnp.asarray(rng.normal(size=(2, 17, 5)).astype(np.float32))
    out = ddim_sample(
        model_jax, x, (0, 6), jnp.asarray(BETAS, jnp.float32), eta=0.5,
        key=jax.random.PRNGKey(3),
    )
    assert out.shape == x.shape
    out2 = ddim_sample(
        model_jax, x, (0, 6), jnp.asarray(BETAS, jnp.float32), eta=0.5,
        key=jax.random.PRNGKey(4),
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))
