from diffpose_tpu.utils.memory import (
    device_memory_budget,
    estimate_per_sample_bytes,
    suggest_batch_size,
)


def test_budget_positive():
    assert device_memory_budget(fraction=0.5) >= 0


def test_suggest_batch_size_bounds():
    per_sample = estimate_per_sample_bytes()
    b = suggest_batch_size(per_sample)
    assert b % 8 == 0
    assert 8 <= b <= 65536
    # Tiny budget clamps at the minimum.
    tiny = suggest_batch_size(10 ** 12)
    assert tiny == 8
