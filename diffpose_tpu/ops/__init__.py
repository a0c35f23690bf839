from diffpose_tpu.ops.fast_eval import (
    make_fast_denoiser,
    make_fast_lifter,
    precompute_fast_params,
)

__all__ = ["make_fast_denoiser", "make_fast_lifter", "precompute_fast_params"]
