"""GCNPose — 2D→3D pose lifter used to initialize the diffusion mean.

Same GraFormer backbone as :class:`GCNDiff` but without timestep
conditioning: coords forced to (2 → 3) by the runner (reference
``models/gcnpose.py:55-113``, ``runners/diffpose_frame.py:138``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn

from diffpose_tpu.models.layers import ChebGraphConv, GraAttenLayer, ResChebGC

Array = jax.Array


class GCNPose(nn.Module):
    basis: Any
    hid_dim: int = 96
    coords_in: int = 2
    coords_out: int = 3
    num_layers: int = 5
    num_heads: int = 4
    dropout_rate: float = 0.25
    n_pts: int = 17

    @nn.compact
    def __call__(
        self, x: Array, mask: Optional[Array] = None, *, train: bool = False
    ) -> Array:
        out = ChebGraphConv(self.hid_dim, self.basis, name="gconv_input")(x)
        for i in range(self.num_layers):
            out = GraAttenLayer(
                self.hid_dim,
                self.num_heads,
                self.n_pts,
                self.dropout_rate,
                name=f"atten_{i}",
            )(out, mask, train=train)
            out = ResChebGC(
                self.hid_dim,
                self.hid_dim,
                self.basis,
                dropout_rate=0.1,
                name=f"res_{i}",
            )(out, train=train)
        return ChebGraphConv(self.coords_out, self.basis, name="gconv_output")(out)
