import numpy as np
import jax
import jax.numpy as jnp

from diffpose_tpu.models.layers import chunked_attention


def _full(q, k, v, mask=None):
    import math

    scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    if mask is not None:
        scores = jnp.where(mask == 0, -1e9, scores)
    return jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(scores, -1), v)


def test_chunked_matches_full(rng):
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 4, 256, 24)).astype(np.float32))
        for _ in range(3)
    )
    want = _full(q, k, v)
    got = chunked_attention(q, k, v, chunk_size=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chunked_matches_full_with_mask(rng):
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 2, 128, 16)).astype(np.float32))
        for _ in range(3)
    )
    mask = jnp.asarray(rng.integers(0, 2, size=(1, 1, 1, 128)))
    # keep at least one visible key per query
    mask = mask.at[..., 0].set(1)
    want = _full(q, k, v, mask)
    got = chunked_attention(q, k, v, mask, chunk_size=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_small_sequence_shortcut(rng):
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 4, 17, 24)).astype(np.float32))
        for _ in range(3)
    )
    got = chunked_attention(q, k, v, chunk_size=128)
    want = _full(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_chunked_non_divisible_length(rng):
    """S not a multiple of chunk_size pads queries and slices back (the
    long-window eval crash: 320 frames, chunk 256)."""
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 2, 70, 16)).astype(np.float32))
        for _ in range(3)
    )
    want = _full(q, k, v)
    got = chunked_attention(q, k, v, chunk_size=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chunked_non_divisible_with_mask(rng):
    q, k, v = (
        jnp.asarray(rng.normal(size=(1, 2, 50, 16)).astype(np.float32))
        for _ in range(3)
    )
    mask = jnp.asarray(rng.integers(0, 2, size=(1, 1, 1, 50)))
    mask = mask.at[..., 0].set(1)
    want = _full(q, k, v, mask)
    got = chunked_attention(q, k, v, mask, chunk_size=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_temporal_attention_non_divisible_window(rng):
    """TemporalAttention engages the chunked path for any window >= chunk,
    including non-multiples (was an AssertionError)."""
    from diffpose_tpu.models.video import TemporalAttention

    mod = TemporalAttention(num_heads=2, attention_chunk=4)
    x = jnp.asarray(rng.normal(size=(3, 6, 16)).astype(np.float32))
    params = mod.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    out = mod.apply({"params": params}, x)  # eval mode -> chunked path
    assert out.shape == (3, 6, 16)
    # must equal the fused path (chunking is exact)
    fused = mod.clone(attention_chunk=0).apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fused), atol=1e-5)
