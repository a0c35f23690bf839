"""IGCN — implicit (deep-equilibrium) variant of the denoiser.

Capability parity with the reference ``models/igcn.py``: the same 5-layer
GraFormer backbone, but the forward pass solves a fixed point
``z* = f(z*)`` of the layer stack (with a stabilizing BatchNorm per
iteration) instead of a single pass.  Solvers:

* damped fixed-point iteration, relaxation α=0.5 (``igcn.py:225-291``);
* Anderson acceleration with history m, Tikhonov-regularized m×m Gram
  solve, mixing β (``igcn.py:293-438``).

TPU-first re-design: both solvers are static-shape device loops —
``lax.while_loop`` with a global-relative-norm convergence predicate (early
exit, eval fast path) or ``lax.scan`` with convergence masking (fixed
iteration count, reverse-differentiable — used for training, matching the
reference's backprop-through-the-loop).  The Anderson history is a fixed
``[m, D]`` buffer with masked rows standing in for the reference's dynamic
``n = min(i+1, m)`` slicing: invalid rows are zero, which the λ-regularized
solve maps to exactly-zero mixing weights, so the math matches the
reference's dynamic version exactly.

The reference's GPU-memory machinery (chunked attention
``igcn.py:151-187``, chunked batches, ``torch.cuda.empty_cache``) is
intentionally absent: XLA static shapes + batch sharding replace it.

Why there is NO implicit-function-theorem (IFT) gradient mode: the
fixed-point map ``_f(z) = BN(stack(z, temb))`` has no input-injection
term — the input enters only through the initialization ``z₀ =
gconv_input(x)`` (same as reference ``igcn.py:225-291``).  The exact
fixed point is therefore independent of ``x``, and an IFT gradient
(which differentiates the exact fixed point) would zero out the entire
input path.  The model works precisely because the solve is finite
(max_iterations, loose tol) and the iterate retains init dependence;
backprop-through-the-solve is the ONLY correct gradient for this
architecture, not a fallback (docs/PERF.md round 5, negative results).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffpose_tpu.models.layers import (
    ChebGraphConv,
    GraAttenLayer,
    ResChebGCDiff,
    TorchDense,
    timestep_embedding,
)
from diffpose_tpu.models.solvers import solve_anderson, solve_damped

Array = jax.Array


class IGCN(nn.Module):
    basis: Any
    hid_dim: int = 96
    coords_in: int = 5
    coords_out: int = 5
    num_layers: int = 5
    num_heads: int = 4
    dropout_rate: float = 0.25
    n_pts: int = 17
    # implicit-solver configuration (reference configs/human36m_ipose.yml:23-45)
    solver: str = "anderson"
    max_iterations: int = 20
    min_iterations: int = 10
    tolerance: float = 0.1
    anderson_m: int = 5
    anderson_beta: float = 1.0
    anderson_lambda: float = 0.1
    relaxation_alpha: float = 0.5
    # Adaptive relaxation for the damped solver (the reference DECLARES
    # ``use_adaptive_alpha``/``min_alpha``/``max_alpha`` in
    # ``configs/human36m_ipose.yml:34-37`` but never reads them; here the
    # knob is real): grow α on residual improvement, shrink on regression,
    # clamped to [min_alpha, max_alpha].
    use_adaptive_alpha: bool = False
    min_alpha: float = 0.1
    max_alpha: float = 0.9
    bn_momentum: float = 0.1  # torch BatchNorm1d default

    @property
    def emd_dim(self) -> int:
        return self.hid_dim * 4

    def setup(self):
        self.gconv_input = ChebGraphConv(self.hid_dim, self.basis, name="gconv_input")
        self.temb_dense_0 = TorchDense(self.emd_dim, name="temb_dense_0")
        self.temb_dense_1 = TorchDense(self.emd_dim, name="temb_dense_1")
        self.attens = [
            GraAttenLayer(
                self.hid_dim, self.num_heads, self.n_pts, self.dropout_rate,
                name=f"atten_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.residuals = [
            ResChebGCDiff(
                self.hid_dim, self.hid_dim, self.basis, dropout_rate=0.1,
                name=f"res_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.gconv_output = ChebGraphConv(self.coords_out, self.basis, name="gconv_output")
        # Stabilizing BatchNorm over the hidden features (igcn.py:95) —
        # implemented manually so the normalization inside the solver loop
        # stays a pure function of the carried state.
        self.bn_scale = self.param("bn_scale", nn.initializers.ones, (self.hid_dim,))
        self.bn_bias = self.param("bn_bias", nn.initializers.zeros, (self.hid_dim,))
        self.bn_mean = self.variable(
            "batch_stats", "bn_mean", lambda: jnp.zeros((self.hid_dim,))
        )
        self.bn_var = self.variable(
            "batch_stats", "bn_var", lambda: jnp.ones((self.hid_dim,))
        )

    # ------------------------------------------------------------------

    def _stack(self, z: Array, temb: Array, mask, train: bool) -> Array:
        for i in range(self.num_layers):
            z = self.attens[i](z, mask, train=train)
            z = self.residuals[i](z, temb, train=train)
        return z

    def _bn(self, x: Array, train: bool) -> Tuple[Array, Tuple[Array, Array]]:
        """BatchNorm over flattened [B·J, C]; returns (y, batch stats)."""
        flat = x.reshape(-1, self.hid_dim)
        if train:
            mean = jnp.mean(flat, axis=0)
            var = jnp.var(flat, axis=0)
        else:
            mean, var = self.bn_mean.value, self.bn_var.value
        y = (flat - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * self.bn_scale + self.bn_bias
        return y.reshape(x.shape), (mean, var)

    def _f(self, z: Array, temb: Array, mask, train: bool) -> Tuple[Array, Tuple[Array, Array]]:
        out = self._stack(z, temb, mask, train)
        return self._bn(out, train)

    # ------------------------------------------------------------------

    def __call__(
        self,
        x: Array,
        t: Array,
        mask: Optional[Array] = None,
        *,
        train: bool = False,
        z0: Optional[Array] = None,
        z0_weight: Optional[Array] = None,
        differentiable: Optional[bool] = None,
        tolerance_override: Optional[Array] = None,
    ):
        """Solve the fixed point and project out; returns (out, aux).

        ``aux`` carries ``iterations`` (solver steps used) and ``residual``
        (final relative update norm).  ``z0`` warm-starts the solve (the
        reference's ``last_fixed_point`` buffer, ``igcn.py:309-313``):
        with ``z0_weight`` (the reference's ``warm_start_momentum``) the
        initial iterate is the blend ``w·z0 + (1−w)·gconv_input(x)``
        (``igcn.py:310-311``); ``z0_weight=0`` reduces exactly to a cold
        start, so one compiled program serves both cases.  Without
        ``z0_weight``, ``z0`` is used verbatim.  ``differentiable`` forces
        the scan (fixed-count) path; defaults to ``train``.

        ``tolerance_override`` (a traced scalar is fine) replaces the static
        ``tolerance`` in the convergence predicate — the hook for the
        progressive-tolerance schedule (``use_progressive_tol``), which the
        train step computes from the global step.
        """
        if differentiable is None:
            differentiable = train

        temb = timestep_embedding(t, self.hid_dim)
        temb = self.temb_dense_1(nn.swish(self.temb_dense_0(temb)))

        out = self.gconv_input(x)
        if z0 is None:
            z = out
        elif z0_weight is None:
            z = z0
        else:
            w = jnp.asarray(z0_weight, out.dtype)
            z = w * jax.lax.stop_gradient(z0) + (1 - w) * out

        tol = jnp.asarray(
            self.tolerance if tolerance_override is None else tolerance_override,
            jnp.float32,
        )
        if self.solver == "anderson":
            z_star, aux, stats = self._solve_anderson(z, temb, mask, train, differentiable, tol)
        else:
            z_star, aux, stats = self._solve_damped(z, temb, mask, train, differentiable, tol)

        if train and stats is not None and not self.is_initializing():
            m = self.bn_momentum
            self.bn_mean.value = (1 - m) * self.bn_mean.value + m * stats[0]
            self.bn_var.value = (1 - m) * self.bn_var.value + m * stats[1]

        y = self.gconv_output(z_star)
        return y, {**aux, "fixed_point": z_star}

    # ------------------------------------------------------------------

    def _converged(self, z: Array, z_prev: Array) -> Array:
        err = jnp.linalg.norm(z - z_prev) / (jnp.linalg.norm(z_prev) + 1e-8)
        return err

    def _solve_damped(self, z: Array, temb: Array, mask, train: bool, differentiable: bool, tol: Array):
        """Damped iteration (igcn.py:250-282) — shared solver, see
        :mod:`diffpose_tpu.models.solvers`."""
        if self.is_initializing():
            # Param creation must happen OUTSIDE the device loop (creating
            # them inside lax.while_loop leaks tracers); one plain step
            # suffices to build every submodule.
            fz, stats = self._f(z, temb, mask, train)
            z1 = (1 - self.relaxation_alpha) * z + self.relaxation_alpha * fz
            aux = {
                "iterations": jnp.ones((), jnp.int32),
                "residual": self._converged(z1, z),
                "alpha": jnp.asarray(self.relaxation_alpha, z.dtype),
            }
            return z1, aux, stats

        return solve_damped(
            lambda zz: self._f(zz, temb, mask, train), z, tol,
            max_iterations=self.max_iterations,
            min_iterations=self.min_iterations,
            relaxation_alpha=self.relaxation_alpha,
            use_adaptive_alpha=self.use_adaptive_alpha,
            min_alpha=self.min_alpha, max_alpha=self.max_alpha,
            differentiable=differentiable,
            stats_init=(
                jnp.zeros((self.hid_dim,), z.dtype),
                jnp.ones((self.hid_dim,), z.dtype),
            ),
        )

    def _solve_anderson(self, z: Array, temb: Array, mask, train: bool, differentiable: bool, tol: Array):
        """Anderson acceleration (igcn.py:293-438) — shared solver, see
        :mod:`diffpose_tpu.models.solvers` (the solver's initial ``f(z)``
        evaluation doubles as flax param creation outside the loop)."""
        return solve_anderson(
            lambda zz: self._f(zz, temb, mask, train), z, tol,
            m=self.anderson_m, beta=self.anderson_beta,
            lam=self.anderson_lambda,
            max_iterations=self.max_iterations,
            min_iterations=self.min_iterations,
            differentiable=differentiable,
        )

