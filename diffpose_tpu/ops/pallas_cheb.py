"""Pallas TPU kernel: fused Chebyshev graph convolution.

One VMEM-resident kernel per call computes the full ChebConv
``y = Σ_k T_k(L) · X · W_k + b`` for a batch tile:

* activations live joint-major ``[N, TB, C]`` so the channel mixing is a
  single MXU GEMM on the free ``[N·TB, C]`` view (merging leading dims of
  a tiled 3D ref costs nothing), and
* the joint mixing exploits the *static sparsity* of the Chebyshev stack:
  ``T_0 = I`` contributes a plain add, and the T_1/T_2 mixes unroll to a
  compile-time list of scaled VPU adds over ``[TB, C]`` slices (the 17-node
  skeleton Laplacian has ~50/150 nonzeros) — no transposes, no tiny
  batched matmuls.

The surrounding ``fused_cheb_conv`` handles the (XLA-fused) layout
transposes at the boundary.  Verified against
:class:`diffpose_tpu.models.layers.ChebGraphConv` in interpret mode and on
hardware.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _sparse_terms(basis: np.ndarray, tol: float = 1e-12):
    """Static (k, n, m, coeff) lists per output joint for k ≥ 1 terms."""
    k1, n, _ = basis.shape
    terms = []
    for out_j in range(n):
        row = []
        for k in range(1, k1):
            for m in range(n):
                c = float(basis[k, out_j, m])
                if abs(c) > tol:
                    row.append((k, m, c))
        terms.append(row)
    return terms


def _cheb_kernel(x_ref, w_ref, b_ref, o_ref, *, terms, n_pts: int):
    tb = x_ref.shape[1]
    c_in = x_ref.shape[2]
    d = w_ref.shape[2]
    xf = x_ref[...].reshape(n_pts * tb, c_in)

    # Channel mixing: one GEMM per Chebyshev order (K+1 = 3 in production).
    k1 = w_ref.shape[0]
    u = [
        jnp.dot(xf, w_ref[k], preferred_element_type=jnp.float32).reshape(n_pts, tb, d)
        for k in range(k1)
    ]

    bias = b_ref[...]
    for out_j in range(n_pts):
        acc = u[0][out_j] + bias  # T_0 = I
        for k, m, coeff in terms[out_j]:
            acc = acc + coeff * u[k][m]
        o_ref[out_j] = acc


def fused_cheb_conv(
    x: Array,
    w: Array,
    b: Array,
    basis: np.ndarray,
    *,
    block_b: int = 256,
    interpret: bool = False,
) -> Array:
    """ChebConv forward via the fused Pallas kernel.

    ``x``: [B, N, C]; ``w``: [K+1, C, D]; ``b``: [D]; ``basis``: host
    ``[K+1, N, N]`` Chebyshev stack (compile-time constant).
    """
    bsz, n, c_in = x.shape
    k1, _, d = w.shape
    assert basis.shape[0] == k1 and basis.shape[1] == n
    block_b = min(block_b, bsz)
    assert bsz % block_b == 0, (bsz, block_b)

    terms = _sparse_terms(np.asarray(basis, np.float64))
    xj = jnp.transpose(x, (1, 0, 2))  # joint-major [N, B, C]

    out = pl.pallas_call(
        functools.partial(_cheb_kernel, terms=terms, n_pts=n),
        out_shape=jax.ShapeDtypeStruct((n, bsz, d), jnp.float32),
        grid=(bsz // block_b,),
        in_specs=[
            pl.BlockSpec((n, block_b, c_in), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, c_in, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, block_b, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xj, w.astype(jnp.float32), b.astype(jnp.float32))
    return jnp.transpose(out, (1, 0, 2))
