"""Sharded train/eval steps: shard_map over the data axis, psum over ICI.

Training: parameters and optimizer state are replicated; the global batch
is sharded over ``data``; each shard computes its gradient and the
``pmean`` collective (compiled by XLA onto ICI) averages them — the
TPU-native equivalent of distributed data parallelism (the reference has
only intra-process ``DataParallel``, §2.6 of the survey).

Evaluation: the ``hypothesis × frames`` batch axis shards over ``data``;
per-sample metrics come back still sharded (no gather needed until the
host reduces the tiny [B] vectors).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Device-put a host batch with the leading axis sharded over the mesh."""
    sharding = data_sharding(mesh, axis)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def make_sharded_train_step(
    model,
    optimizer,
    betas,
    mesh: Mesh,
    *,
    axis: str = "data",
    ema_mu: Optional[float] = 0.999,
    mask=None,
    donate: bool = True,
    base_step: Optional[Callable] = None,
) -> Callable:
    """Build the multi-chip training step: shard_map(data-parallel) + jit.

    Inside the shard each device runs the fused step from
    :func:`diffpose_tpu.train.steps.make_train_step` on its batch shard
    (or an injected ``base_step`` — e.g. the fused Pallas train step built
    with ``axis_name=axis``); gradients/loss are ``pmean``-reduced over
    ``axis``.
    """
    from diffpose_tpu.train.steps import make_train_step

    local_step = base_step or make_train_step(
        model, optimizer, betas, ema_mu=ema_mu, mask=mask, axis_name=axis
    )

    keys = ("poses_2d_gmm", "poses_3d")
    batch_spec = P(axis)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), {k: batch_spec for k in keys}, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())

    def step(state, batch, key):
        return jitted(state, {k: batch[k] for k in keys}, key)

    return step


def make_sharded_train_sweep_step(
    model,
    optimizer,
    betas,
    mesh: Mesh,
    *,
    sweep: int,
    axis: str = "data",
    ema_mu: Optional[float] = 0.999,
    mask=None,
    donate: bool = True,
) -> Callable:
    """Device-resident-data training × data parallelism: ``sweep``
    optimizer steps per dispatch, batch sharded over ``axis``.

    The training dataset is REPLICATED on every device (H3.6M train is
    ~1.9 GB — small next to per-chip HBM) and each dispatch carries only a
    ``[sweep, B]`` int32 index array whose batch axis shards over the
    mesh: shard ``d`` gathers and trains on rows ``idx[:, d·B/D:(d+1)·B/D]``.
    Inside the shard a ``lax.scan`` runs ``sweep`` full steps (gather →
    GMM draw → q-sample → fwd/bwd → pmean(grads) → Adam → EMA), so the
    per-step host cost of the standard path (staging ~2.4 MB through the
    interconnect per step — the round-1 "30 ms mystery", docs/PERF.md) is
    paid once per ``sweep`` steps and only for a few KB of indices.

    Semantics: identical to ``sweep`` sequential calls of
    :func:`make_sharded_train_step` on the batches ``data[idx[s]]`` with
    keys ``jax.random.split(key, sweep)`` (exact-equality tested).

    Returns ``step(state, data, idx, key) → (state, {"loss": [sweep]})``
    where ``data`` holds replicated device-resident arrays.
    """
    from diffpose_tpu.train.steps import make_train_step

    base = make_train_step(
        model, optimizer, betas, ema_mu=ema_mu, mask=mask, axis_name=axis
    )
    keys = ("poses_2d_gmm", "poses_3d")

    def local_sweep(state, data, idx, key):
        ks = jax.random.split(key, sweep)

        def body(st, args):
            ids, k = args
            batch = {name: data[name][ids] for name in keys}
            st, metrics = base(st, batch, k)
            return st, metrics["loss"]

        state, losses = jax.lax.scan(body, state, (idx, ks))
        return state, {"loss": losses}

    sharded = jax.shard_map(
        local_sweep,
        mesh=mesh,
        in_specs=(P(), {k: P() for k in keys}, P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())

    def step(state, data, idx, key):
        return jitted(state, {k: data[k] for k in keys}, idx, key)

    return step


def make_sharded_implicit_train_step(
    model,
    optimizer,
    betas,
    mesh: Mesh,
    *,
    axis: str = "data",
    ema_mu: Optional[float] = 0.999,
    mask=None,
    donate: bool = True,
    use_warm_start: bool = False,
    tol_schedule=None,
    base_step: Optional[Callable] = None,
) -> Callable:
    """Data-parallel IGCN training: grads, loss AND BatchNorm batch stats
    are pmean-reduced over the mesh axis (ICI).

    ``use_warm_start``: the step takes ``(z0, z0_weight)`` extras — ``z0``
    sharded over ``axis`` like the batch — and returns the solved fixed
    point in ``metrics["fixed_point"]`` (still sharded, never gathered).

    ``tol_schedule``: progressive solver tolerance, forwarded to
    :func:`make_implicit_train_step` (computed from ``state.step``, which
    is replicated, so every shard anneals identically).

    ``base_step``: inject a fused-kernel implicit step built with
    ``axis_name=axis`` (``ops.pallas_igcn_train.make_pallas_implicit_
    train_step``) in place of the module-path step."""
    from diffpose_tpu.train.implicit_steps import make_implicit_train_step

    base_step = base_step or make_implicit_train_step(
        model, optimizer, betas, ema_mu=ema_mu, mask=mask, axis_name=axis,
        use_warm_start=use_warm_start, tol_schedule=tol_schedule,
    )

    keys = ("poses_2d_gmm", "poses_3d")
    batch_spec = P(axis)

    if use_warm_start:
        def local_step(state, batch, key, z0, z0_weight):
            new_state, metrics = base_step(state, batch, key, z0, z0_weight)
            fp = metrics.pop("fixed_point")
            return new_state, metrics, fp

        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), {k: batch_spec for k in keys}, P(), batch_spec, P()),
            out_specs=(P(), P(), batch_spec),
            check_vma=False,
        )
        jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())

        def step(state, batch, key, z0, z0_weight):
            new_state, metrics, fp = jitted(
                state, {k: batch[k] for k in keys}, key, z0, z0_weight
            )
            metrics["fixed_point"] = fp
            return new_state, metrics

        return step

    sharded = jax.shard_map(
        base_step,
        mesh=mesh,
        in_specs=(P(), {k: batch_spec for k in keys}, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())

    def step(state, batch, key):
        return jitted(state, {k: batch[k] for k in keys}, key)

    return step


def make_sharded_implicit_train_sweep_step(
    model,
    optimizer,
    betas,
    mesh: Mesh,
    *,
    sweep: int,
    axis: str = "data",
    ema_mu: Optional[float] = 0.999,
    mask=None,
    donate: bool = True,
    use_warm_start: bool = False,
    warm_start_momentum: float = 0.0,
    tol_schedule=None,
    base_step: Optional[Callable] = None,
) -> Callable:
    """Device-resident-data IGCN training × data parallelism: the implicit
    sweep (``implicit_steps.make_implicit_train_sweep_step``) runs inside
    ``shard_map`` — dataset replicated, the ``[sweep, B]`` index batch
    axis sharded, grads/loss/batch_stats pmean'd over ``axis`` per scanned
    step.  With warm start the fixed-point carry stays sharded over
    ``axis`` (each shard warm-starts its own slice — never gathered).

    ``base_step``: inject a fused-kernel per-step implicit train step
    (built with ``axis_name=axis``) into the scanned sweep."""
    from diffpose_tpu.train.implicit_steps import make_implicit_train_sweep_step

    local_sweep = make_implicit_train_sweep_step(
        model, optimizer, betas, sweep=sweep, ema_mu=ema_mu, mask=mask,
        axis_name=axis, use_warm_start=use_warm_start,
        warm_start_momentum=warm_start_momentum, tol_schedule=tol_schedule,
        base_step=base_step,
    )
    keys = ("poses_2d_gmm", "poses_3d")

    if use_warm_start:
        def local_step(state, data, idx, key, z0, z0_weight):
            new_state, metrics = local_sweep(state, data, idx, key, z0, z0_weight)
            fp = metrics.pop("fixed_point")
            return new_state, metrics, fp

        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), {k: P() for k in keys}, P(None, axis), P(),
                      P(axis), P()),
            out_specs=(P(), P(), P(axis)),
            check_vma=False,
        )
        jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())

        def step(state, data, idx, key, z0, z0_weight):
            new_state, metrics, fp = jitted(
                state, {k: data[k] for k in keys}, idx, key, z0, z0_weight
            )
            metrics["fixed_point"] = fp
            return new_state, metrics

        return step

    sharded = jax.shard_map(
        local_sweep,
        mesh=mesh,
        in_specs=(P(), {k: P() for k in keys}, P(None, axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())

    def step(state, data, idx, key):
        return jitted(state, {k: data[k] for k in keys}, idx, key)

    return step


def make_sharded_implicit_eval_step(
    implicit_model,
    pose_model,
    mesh: Mesh,
    *,
    t_infer: int,
    test_times: int = 1,
    axis: str = "data",
    mask=None,
    use_ema: bool = False,
    gmm_base_seed: int = 0,
    use_warm_start: bool = False,
    solve_override=None,
    lift_override=None,
) -> Callable:
    """Sharded direct-inference eval: frames shard over ``axis``, each
    shard runs its own fixed-point solve.

    Convergence (and the Anderson history/mixing, which couples the whole
    local batch through the global-norm predicate and the Gram solve) is
    PER SHARD — exactly the reference's chunked-eval semantics, where each
    chunk solves independently (``implicit_pose.py:222-268, 523-526``).
    With a fixed iteration count (``min_iterations == max_iterations``)
    and the per-sample damped solver the sharded result equals the
    single-device result bitwise-closely (tested).

    Returns ``step(state, pose_params, batch, key[, z0, z0_weight]) →
    (p1, p2, pred, iters[, fp])`` where ``iters`` is ``[n_shards]`` (one
    solver count per shard; the single-device step returns a scalar) and
    ``z0``/``fp`` stay sharded like the batch.
    """
    from diffpose_tpu.train.implicit_steps import make_implicit_eval_step

    base = make_implicit_eval_step(
        implicit_model, pose_model, t_infer=t_infer, test_times=test_times,
        mask=mask, use_ema=use_ema, gmm_base_seed=gmm_base_seed,
        use_warm_start=use_warm_start,
        solve_override=solve_override, lift_override=lift_override,
    )
    keys = ("poses_2d_gmm", "poses_3d", "seeds")
    batch_spec = P(axis)

    if use_warm_start:
        def local_step(state, pose_params, batch, key, z0, z0_weight):
            p1, p2, pred, iters, fp = base(state, pose_params, batch, key, z0, z0_weight)
            return p1, p2, pred, jnp.atleast_1d(iters), fp

        in_specs = (P(), P(), {k: batch_spec for k in keys}, P(), batch_spec, P())
        out_specs = (batch_spec, batch_spec, batch_spec, batch_spec, batch_spec)
    else:
        def local_step(state, pose_params, batch, key):
            p1, p2, pred, iters = base(state, pose_params, batch, key)
            return p1, p2, pred, jnp.atleast_1d(iters)

        in_specs = (P(), P(), {k: batch_spec for k in keys}, P())
        out_specs = (batch_spec, batch_spec, batch_spec, batch_spec)

    sharded = jax.jit(jax.shard_map(
        local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    ))

    def step(state, pose_params, batch, key, *extras):
        return sharded(state, pose_params, {k: batch[k] for k in keys}, key, *extras)

    return step


def make_sharded_video_train_step(
    model,
    optimizer,
    betas,
    mesh: Mesh,
    *,
    data_axis: Optional[str] = "data",
    cp_axis: Optional[str] = None,
    ema_mu: Optional[float] = 0.999,
    mask=None,
    donate: bool = True,
    base_step: Optional[Callable] = None,
) -> Callable:
    """Video training over a 1-D or 2-D mesh: windows shard over
    ``data_axis`` (grads pmean), frames over ``cp_axis`` (temporal
    attention all-gathers K/V inside the model; frame-summed loss/grads
    psum).  Pass ``data_axis=None`` for pure context parallelism.

    ``base_step`` injects a pre-built per-shard step (e.g. the fused
    Pallas video train step, ``ops/pallas_video_train.py``, built with
    the same ``data_axis``) — data-parallel only; the CP all-gather lives
    inside the module forward the default step uses."""
    from diffpose_tpu.train.video_steps import make_video_train_step

    local_step = base_step or make_video_train_step(
        model, optimizer, betas, ema_mu=ema_mu, mask=mask,
        data_axis=data_axis, cp_axis=cp_axis,
    )
    keys = ("poses_2d_gmm", "poses_3d")
    batch_spec = P(data_axis, cp_axis)  # [B, F, ...] — None axes replicate
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), {k: batch_spec for k in keys}, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())

    def step(state, batch, key):
        return jitted(state, {k: batch[k] for k in keys}, key)

    return step


def make_sharded_video_eval_step(
    model,
    betas,
    seq,
    mesh: Mesh,
    *,
    frames_total: int,
    data_axis: Optional[str] = "data",
    cp_axis: Optional[str] = None,
    test_times: int = 1,
    eta: float = 0.0,
    mask=None,
    use_ema: bool = False,
    denoise_override=None,
) -> Callable:
    """Windowed DDIM eval over the mesh; per-frame P1/P2 come back
    ``[B, F]`` sharded the same way the windows went in.  Per-(window,
    frame) seed ids make the result exactly layout-invariant.

    ``denoise_override``: fused-kernel denoiser (``ops/pallas_video.py``)
    — runs per shard on the local rows; the temporal K/V all-gather over
    ``cp_axis`` stays inside it as an XLA collective."""
    from diffpose_tpu.train.video_steps import make_video_eval_step

    local_step = make_video_eval_step(
        model, betas, seq, test_times=test_times, eta=eta, mask=mask,
        use_ema=use_ema, cp_axis=cp_axis, data_axis=data_axis,
        frames_total=frames_total, denoise_override=denoise_override,
    )
    keys = ("poses_2d_gmm", "poses_3d")
    batch_spec = P(data_axis, cp_axis)
    seed_spec = P(data_axis)
    in_batch_specs = {k: batch_spec for k in keys}
    in_batch_specs["seeds"] = seed_spec
    err_spec = P(data_axis, cp_axis)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), in_batch_specs, P()),
        out_specs=(err_spec, err_spec, batch_spec),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def step(state, batch, key):
        needed = {k: batch[k] for k in (*keys, "seeds")}
        return jitted(state, needed, key)

    return step


def make_sharded_eval_step(
    diff_model,
    pose_model,
    betas,
    seq,
    mesh: Mesh,
    *,
    axis: str = "data",
    test_times: int = 1,
    eta: float = 0.0,
    mask=None,
    use_ema: bool = False,
    sweep: int = 1,
    hyp_axis: Optional[str] = None,
    denoise_override=None,
    lift_override=None,
) -> Callable:
    """Multi-chip eval step: frames shard over ``axis``; hypotheses either
    stay on-chip (``test_times`` replication inside the shard) or, when
    ``hyp_axis`` names a second mesh axis, shard over it (each shard
    solves ``test_times / hyp_size`` hypotheses; the hypothesis mean is a
    ``psum`` riding ICI — survey §2.6 hypothesis parallelism).  Per-sample
    P1/P2 come back sharded over ``axis``.

    ``sweep > 1`` composes the device-side eval sweep with the mesh: the
    step then takes ``sweep``-stacked batches (``[S, B, ...]``, frame axis 1
    sharded over ``axis``) and a ``[S]``-stacked key array, and runs a
    ``lax.map`` over the sweep *inside* the shard_map — ``S`` batches per
    host dispatch per chip, identical math to ``sweep=1``."""
    from diffpose_tpu.train.steps import make_eval_step

    hyp_size = int(mesh.shape[hyp_axis]) if hyp_axis is not None else 1
    local_step = make_eval_step(
        diff_model, pose_model, betas, seq,
        test_times=test_times, eta=eta, mask=mask, use_ema=use_ema,
        hyp_axis=hyp_axis, hyp_size=hyp_size,
        # fused Pallas kernels (when given) run per-device on the local
        # shard — same composition as the fused sharded train step
        denoise_override=denoise_override, lift_override=lift_override,
    )

    keys = ("poses_2d_gmm", "poses_3d", "seeds")
    if sweep > 1:
        def local_sweep(state, pose_params, batches, ks):
            return jax.lax.map(
                lambda bk: local_step(state, pose_params, bk[0], bk[1]),
                (batches, ks),
            )

        sweep_spec = P(None, axis)
        sharded = jax.shard_map(
            local_sweep,
            mesh=mesh,
            in_specs=(P(), P(), {k: sweep_spec for k in keys}, P()),
            out_specs=(sweep_spec, sweep_spec, sweep_spec),
            check_vma=False,
        )
        jitted = jax.jit(sharded)

        def step(state, pose_params, batches, ks):
            return jitted(state, pose_params, {k: batches[k] for k in keys}, ks)

        return step

    batch_spec = P(axis)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),
            P(),
            {k: batch_spec for k in keys},
            P(),
        ),
        out_specs=(batch_spec, batch_spec, batch_spec),
        check_vma=False,
    )
    jitted = jax.jit(sharded)

    def step(state, pose_params, batch, key):
        return jitted(state, pose_params, {k: batch[k] for k in keys}, key)

    return step
