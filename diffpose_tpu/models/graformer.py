"""Standalone GraFormer 2D→3D lifter (reference ``models/GraFormer.py:204-237``).

Kept for component parity with the reference's standalone model (which has
its own layer interleaving and a 21-point default graph).  Architecture:
ChebConv-in → N×[GraAttenLayer → ResChebGC] → ChebConv-out(3).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn

from diffpose_tpu.models.layers import ChebGraphConv, GraAttenLayer, ResChebGC

Array = jax.Array


class GraFormer(nn.Module):
    basis: Any
    hid_dim: int = 128
    coords_in: int = 2
    coords_out: int = 3
    num_layers: int = 4
    num_heads: int = 4
    dropout_rate: float = 0.1
    n_pts: int = 21

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
