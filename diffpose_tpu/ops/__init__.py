from diffpose_tpu.ops.fast_eval import (
    make_fast_denoiser,
    make_fast_lifter,
    precompute_fast_params,
)
from diffpose_tpu.ops.pallas_denoiser import (
    make_pallas_denoiser,
    make_pallas_denoiser_fn,
    make_pallas_lifter,
    make_pallas_lifter_fn,
)
from diffpose_tpu.ops.pallas_pipeline import make_pallas_eval, make_pallas_eval_fn

__all__ = [
    "make_fast_denoiser",
    "make_fast_lifter",
    "precompute_fast_params",
    "make_pallas_denoiser",
    "make_pallas_denoiser_fn",
    "make_pallas_lifter",
    "make_pallas_lifter_fn",
    "make_pallas_eval",
    "make_pallas_eval_fn",
]
