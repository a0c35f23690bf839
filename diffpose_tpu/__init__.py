"""diffpose_tpu — a TPU-native diffusion pose-estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DiffPose
(CVPR 2023; reference implementation: nwicakson/diffpose-nw): monocular 3D
human pose estimation as a reverse diffusion process over ``uvxyz`` joint
coordinates with a GMM-based forward process and a GraFormer-style
(Chebyshev graph convolution + multi-head attention) denoiser, plus the
implicit fixed-point (Anderson-accelerated) variant.

Architecture is TPU-first:

* all hot math is jit-compiled XLA with static shapes,
* the DDIM reverse loop runs on device as a ``lax.scan`` (the reference
  drives the sampler from a host-side Python loop),
* the Chebyshev basis of the skeleton graph is precomputed once (the
  reference rebuilds the Laplacian + polynomial basis on every forward),
* multi-chip scaling is expressed with ``jax.sharding.Mesh`` + ``shard_map``
  and XLA collectives over ICI (the reference only has single-process
  ``torch.nn.DataParallel``),
* the fused denoiser block is available as a Pallas TPU kernel.
"""

from diffpose_tpu.version import __version__

__all__ = ["__version__"]
