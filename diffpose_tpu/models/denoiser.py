"""GCNDiff — the ε-prediction diffusion denoiser.

Capability parity with the reference ``models/gcndiff.py:55-113``:
sinusoidal timestep embedding → 2-layer swish MLP (width 4·hid) →
ChebConv(coords_in→hid) → N×[GraAttenLayer → ResChebGCDiff(+temb)] →
ChebConv(hid→coords_out), operating on ``[B, 17, 5]`` uvxyz tensors.

TPU-first differences: the Chebyshev basis is a precomputed constant, the
whole forward is one jit region with static shapes, and the fused Pallas
kernel path (``diffpose_tpu.ops``) can replace the XLA composite.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn

from diffpose_tpu.models.layers import (
    ChebGraphConv,
    GraAttenLayer,
    ResChebGCDiff,
    TorchDense,
    timestep_embedding,
)

Array = jax.Array


class GCNDiff(nn.Module):
    basis: Any  # [K+1, N, N] Chebyshev stack (np.ndarray)
    hid_dim: int = 96
    coords_in: int = 5
    coords_out: int = 5
    num_layers: int = 5
    num_heads: int = 4
    dropout_rate: float = 0.25
    n_pts: int = 17

    @property
    def emd_dim(self) -> int:
        # The reference overrides the config's emd_dim with 4·hid_dim
        # (models/gcndiff.py:68).
        return self.hid_dim * 4

    @nn.compact
    def __call__(
        self,
        x: Array,
        t: Array,
        mask: Optional[Array] = None,
        *,
        train: bool = False,
    ) -> Array:
        """Predict the noise ε̂ for noisy input ``x`` at timesteps ``t``.

        ``x``: [B, n_pts, coords_in]; ``t``: [B] (float or int); ``mask``:
        optional [1 or B, 1, n_pts] attention mask (all-True by default).
        """
        temb = timestep_embedding(t, self.hid_dim)
        temb = TorchDense(self.emd_dim, name="temb_dense_0")(temb)
        temb = nn.swish(temb)
        temb = TorchDense(self.emd_dim, name="temb_dense_1")(temb)

        out = ChebGraphConv(self.hid_dim, self.basis, name="gconv_input")(x)
        for i in range(self.num_layers):
            out = GraAttenLayer(
                self.hid_dim,
                self.num_heads,
                self.n_pts,
                self.dropout_rate,
                name=f"atten_{i}",
            )(out, mask, train=train)
            out = ResChebGCDiff(
                self.hid_dim,
                self.hid_dim,
                self.basis,
                dropout_rate=0.1,  # hardcoded in the reference block builder (gcndiff.py:84)
                name=f"res_{i}",
            )(out, temb, train=train)
        return ChebGraphConv(self.coords_out, self.basis, name="gconv_output")(out)
