"""Fixed-point solvers for the implicit (DEQ) family — ONE implementation
shared by the flax module (:class:`~diffpose_tpu.models.igcn.IGCN`), the
fused-kernel inference path (``ops/pallas_igcn.py``) and the fused-kernel
training path (``ops/pallas_igcn_train.py``).

Capability parity with the reference solvers (``models/igcn.py:225-438``):
damped relaxation and Anderson acceleration with Tikhonov-regularized
history mixing.  TPU-first: both are static-shape device loops —
``lax.while_loop`` with a global-relative-norm convergence predicate
(``differentiable=False``, eval early-exit) or ``lax.scan`` with
convergence masking (``differentiable=True``, fixed count,
reverse-differentiable — training backprops through the loop exactly like
the reference).  The Anderson history is a fixed ``[m, D]`` buffer with
masked rows standing in for the reference's dynamic ``min(i+1, m)``
slicing.

``f`` is a callback ``z → (f(z), stats)``: ``stats`` is an arbitrary
pytree threaded through the loop with done-masking (the IGCN module
passes BatchNorm batch statistics; inference paths pass ``None``, which
rides the carry as an empty pytree for free).  Pass the matching
``stats_init`` (same treedef as ``f``'s stats output).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def relative_residual(z: Array, z_prev: Array) -> Array:
    """Global relative update norm — the convergence measure the reference
    checks (``igcn.py:265, 418``)."""
    return jnp.linalg.norm(z - z_prev) / (jnp.linalg.norm(z_prev) + 1e-8)


def _masked(done, old, new):
    return jax.tree_util.tree_map(
        lambda o, n: jnp.where(done, o, n), old, new
    )


def solve_damped(
    f: Callable[[Array], Tuple[Array, Any]],
    z: Array,
    tol: Array,
    *,
    max_iterations: int,
    min_iterations: int,
    relaxation_alpha: float = 0.5,
    use_adaptive_alpha: bool = False,
    min_alpha: float = 0.1,
    max_alpha: float = 0.9,
    differentiable: bool = False,
    stats_init: Any = None,
) -> Tuple[Array, Dict[str, Array], Any]:
    """Damped iteration ``z ← (1−α) z + α f(z)`` (reference igcn.py:250-282).

    With ``use_adaptive_alpha`` the relaxation is residual-monitored:
    α grows ×1.25 when the relative update shrank, halves when it grew,
    clamped to [min_alpha, max_alpha] — the adaptive-relaxation heuristic
    the reference's config names but never implements.  α lives in the
    loop carry, so the whole schedule is one compiled device loop.

    Returns ``(z_star, {"iterations", "residual", "alpha"}, stats)``.
    """

    def body(carry, _=None):
        z, prev_err, alpha, it, done, stats = carry
        fz, new_stats = f(z)
        z_new = (1 - alpha) * z + alpha * fz
        err = relative_residual(z_new, z)
        if use_adaptive_alpha:
            grown = jnp.minimum(alpha * 1.25, max_alpha)
            shrunk = jnp.maximum(alpha * 0.5, min_alpha)
            alpha_new = jnp.where(err < prev_err, grown, shrunk)
            alpha = jnp.where(done, alpha, alpha_new)
        new_done = done | ((it + 1 >= min_iterations) & (err < tol))
        z_out = jnp.where(done, z, z_new)
        err_out = jnp.where(done, prev_err, err)
        stats = _masked(done, stats, new_stats)
        return (z_out, err_out, alpha, it + jnp.where(done, 0, 1), new_done, stats), None

    init = (
        z, jnp.asarray(jnp.inf, z.dtype),
        jnp.asarray(relaxation_alpha, z.dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), bool), stats_init,
    )
    if differentiable:
        carry, _ = jax.lax.scan(body, init, None, length=max_iterations)
    else:
        def cond(carry):
            _, _, _, it, done, _ = carry
            return (it < max_iterations) & (~done)

        carry = jax.lax.while_loop(cond, lambda c: body(c)[0], init)
    z_star, err, alpha, iters, _, stats = carry
    return z_star, {"iterations": iters, "residual": err, "alpha": alpha}, stats


def solve_anderson(
    f: Callable[[Array], Tuple[Array, Any]],
    z: Array,
    tol: Array,
    *,
    m: int,
    beta: float,
    lam: float,
    max_iterations: int,
    min_iterations: int,
    differentiable: bool = False,
) -> Tuple[Array, Dict[str, Array], Any]:
    """Anderson acceleration (reference igcn.py:293-438) with a masked
    fixed-size history: slots fill 0..m-1 then roll (oldest out); invalid
    rows are zero, which the λ-regularized Gram solve maps to exactly-zero
    mixing weights, so the math matches the reference's dynamic
    ``min(i+1, m)`` slicing exactly.

    ``stats`` threading comes from ``f``'s second output (the initial
    outside-the-loop evaluation seeds the carry, so no ``stats_init``).

    Returns ``(z_star, {"iterations", "residual"}, stats)``.
    """
    m = min(m, max_iterations)
    d = z.size
    X = jnp.zeros((m, d), z.dtype)
    F = jnp.zeros((m, d), z.dtype)
    fz0, stats0 = f(z)

    def body(carry, _=None):
        z, fz, X, F, _, it, done, stats = carry
        residual = fz - z
        z_flat = z.reshape(-1)
        r_flat = residual.reshape(-1)

        full = it >= m
        Xs = jnp.where(full, jnp.roll(X, -1, axis=0), X)
        Fs = jnp.where(full, jnp.roll(F, -1, axis=0), F)
        slot = jnp.minimum(it, m - 1)
        zero = jnp.zeros((), slot.dtype)  # match index dtype under x64
        Xs = jax.lax.dynamic_update_slice(Xs, z_flat[None], (slot, zero))
        Fs = jax.lax.dynamic_update_slice(Fs, r_flat[None], (slot, zero))

        count = jnp.minimum(it + 1, m)
        newest = count - 1
        valid = (jnp.arange(m) < count)[:, None].astype(z.dtype)
        dX = (Xs - Xs[newest][None]) * valid
        dF = (Fs - Fs[newest][None]) * valid

        gram = dF @ dF.T + lam * jnp.eye(m, dtype=z.dtype)
        rhs = -(dF @ Fs[newest])
        alpha = jnp.linalg.solve(gram, rhs)
        alpha_sum = jnp.sum(alpha)
        sum_ok = jnp.abs(alpha_sum) > 1e-10
        # Safe denominator: the unselected branch of a where() must not
        # produce NaN (0/0) or its cotangent poisons the whole backward
        # pass through the scan.
        safe_sum = jnp.where(sum_ok, alpha_sum, jnp.ones_like(alpha_sum))
        alpha = jnp.where(sum_ok, alpha / safe_sum, valid[:, 0] / count)
        z_and = (alpha @ Xs).reshape(z.shape) + beta * (alpha @ Fs).reshape(z.shape)

        # First iteration / degenerate history → plain relaxed update
        # (igcn.py:371-373, 402-404).
        df_norm = jnp.linalg.norm(dF)
        use_plain = (it < 1) | (df_norm < 1e-10)
        z_new = jnp.where(use_plain, z + beta * residual, z_and)

        fz_new, new_stats = f(z_new)
        err = relative_residual(z_new, z)
        new_done = done | ((it + 1 >= min_iterations) & (err < tol))
        z_out = jnp.where(done, z, z_new)
        fz_out = jnp.where(done, fz, fz_new)
        stats = _masked(done, stats, new_stats)
        return (z_out, fz_out, Xs, Fs, err, it + jnp.where(done, 0, 1), new_done, stats), None

    init = (
        z, fz0, X, F, jnp.asarray(jnp.inf, z.dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), bool), stats0,
    )
    if differentiable:
        carry, _ = jax.lax.scan(body, init, None, length=max_iterations)
    else:
        def cond(carry):
            _, _, _, _, _, it, done, _ = carry
            return (it < max_iterations) & (~done)

        carry = jax.lax.while_loop(cond, lambda c: body(c)[0], init)
    z_star, _, _, _, err, iters, _, stats = carry
    return z_star, {"iterations": iters, "residual": err}, stats
