from diffpose_tpu.diffusion.schedule import (
    get_beta_schedule,
    alphas_cumprod,
    compute_alpha,
)
from diffpose_tpu.diffusion.ddim import (
    make_skip_sequence,
    q_sample,
    antithetic_timesteps,
    ddim_sample,
)

__all__ = [
    "get_beta_schedule",
    "alphas_cumprod",
    "compute_alpha",
    "make_skip_sequence",
    "q_sample",
    "antithetic_timesteps",
    "ddim_sample",
]
