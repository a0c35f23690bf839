"""Implicit-pose runner: IGCN fixed-point model inside the training/eval
lifecycle (capability parity with reference ``runners/implicit_pose.py``).

``use_implicit=False`` degrades to the standard diffusion runner, matching
the reference's model-selection flag (``implicit_pose.py:139-145``).  The
reference's dynamic chunk-size machinery is replaced by static shapes +
sharding (see §2.6 of the survey).
"""

from __future__ import annotations

import logging
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.config import Config, ImplicitConfig
from diffpose_tpu.metrics import ActionErrorAccumulator
from diffpose_tpu.models.igcn import IGCN
from diffpose_tpu.train.implicit_steps import (
    make_implicit_eval_step,
    make_implicit_train_step,
)
from diffpose_tpu.train.state import TrainState
from diffpose_tpu.train.trainer import DiffposeRunner
from diffpose_tpu.train.optim import make_optimizer

logger = logging.getLogger(__name__)


class ImplicitRunner(DiffposeRunner):
    def __init__(self, config: Config, *, use_implicit: bool = True, **kwargs):
        super().__init__(config, **kwargs)
        self.use_implicit = use_implicit
        self.fp_iterations: list = []
        self._model_state_init = None

    def create_diffusion_model(self, model_path: Optional[str] = None):
        if not self.use_implicit:
            return super().create_diffusion_model(model_path)
        m = self.config.model
        imp = self.config.implicit or ImplicitConfig()
        self.model_diff = IGCN(
            basis=self.basis,
            hid_dim=m.hid_dim,
            coords_in=m.coords_dim[0],
            coords_out=m.coords_dim[1],
            num_layers=m.num_layer,
            num_heads=m.n_head,
            dropout_rate=m.dropout,
            n_pts=m.n_pts,
            solver=imp.solver,
            max_iterations=imp.max_iterations,
            min_iterations=imp.min_iterations,
            tolerance=imp.tolerance,
            anderson_m=imp.anderson_m,
            anderson_beta=imp.anderson_beta,
            anderson_lambda=imp.anderson_lambda,
            use_adaptive_alpha=imp.use_adaptive_alpha,
            relaxation_alpha=imp.init_alpha,
            min_alpha=imp.min_alpha,
            max_alpha=imp.max_alpha,
        )
        variables = self.model_diff.init(
            {"params": self._next_key()},
            jnp.zeros((2, m.n_pts, m.coords_dim[0])),
            jnp.zeros((2,)),
        )
        self._params_diff_init = variables["params"]
        self._model_state_init = variables["batch_stats"]
        if model_path:
            logger.info("initialize implicit model from %s", model_path)
            if model_path.endswith(".pth"):
                from diffpose_tpu.models.convert import (
                    load_torch_states,
                    torch_igcn_to_variables,
                )

                torch_state, *_ = load_torch_states(model_path)
                converted = torch_igcn_to_variables(
                    torch_state, num_layers=m.num_layer
                )
                self._params_diff_init = jax.tree_util.tree_map(
                    jnp.asarray, converted["params"]
                )
                self._model_state_init = jax.tree_util.tree_map(
                    jnp.asarray, converted["batch_stats"]
                )
        return self.model_diff

    def _supports_train_sweep(self) -> bool:
        # make_implicit_train_sweep_step threads batch_stats + the
        # warm-start fixed-point carry through the scan, so the implicit
        # family now rides the device-resident sweep too.
        return True

    def _build_sweep_fn(self, optimizer, n: int):
        """The implicit sweep: batch_stats ride ``TrainState.model_state``
        through the scan; with warm start the fixed-point carry stays ON
        DEVICE across dispatches (the per-batch path ships it host↔device
        every step — the r1 '30 ms mystery', docs/PERF.md)."""
        if not self.use_implicit:
            return super()._build_sweep_fn(optimizer, n)
        ema_mu = self.config.model.ema_rate if self.config.model.ema else None
        imp = self.config.implicit or ImplicitConfig()
        warm = imp.use_warm_start
        tol_schedule = (
            (imp.init_tol, imp.final_tol, imp.tol_decay_steps)
            if imp.use_progressive_tol
            else None
        )
        from diffpose_tpu.train.implicit_steps import make_implicit_train_sweep_step

        if self.mesh is not None:
            from diffpose_tpu.parallel.sharding import (
                make_sharded_implicit_train_sweep_step,
            )

            base_step = self._implicit_pallas_train_base(
                optimizer, ema_mu, tol_schedule, warm,
                in_sweep=True, axis_name="data",
            )
            fn = make_sharded_implicit_train_sweep_step(
                self.model_diff, optimizer, self.betas, self.mesh,
                sweep=n, ema_mu=ema_mu, mask=self.mask,
                use_warm_start=warm,
                warm_start_momentum=imp.warm_start_momentum,
                tol_schedule=tol_schedule, base_step=base_step,
            )
        else:
            base_step = self._implicit_pallas_train_base(
                optimizer, ema_mu, tol_schedule, warm, in_sweep=True)
            fn = jax.jit(
                make_implicit_train_sweep_step(
                    self.model_diff, optimizer, self.betas,
                    sweep=n, ema_mu=ema_mu, mask=self.mask,
                    use_warm_start=warm,
                    warm_start_momentum=imp.warm_start_momentum,
                    tol_schedule=tol_schedule, base_step=base_step,
                ),
                donate_argnums=(0,),
            )
            fn = self._maybe_exec_cache(fn)
        if warm:
            fn = self._wrap_warm_start_sweep(fn, imp.warm_start_momentum)
        return fn

    def _implicit_pallas_train_base(self, optimizer, ema_mu, tol_schedule, warm,
                                    *, in_sweep: bool, axis_name=None):
        """The fused-kernel implicit train step when ``--train_impl pallas``
        (None = module path): every solver iteration's stack fwd+bwd runs
        as the whole-network Pallas kernel pair
        (``ops/pallas_igcn_train.py``) — the implicit family's equivalent
        of the standard family's fused train step."""
        if self.train_impl != "pallas":
            return None
        if self.mask is not None:
            assert bool(np.all(np.asarray(self.mask) == 1)), (
                "--train_impl pallas assumes the all-True joint mask")
        b = self.config.training.batch_size
        assert b % 16 == 0, (
            f"--train_impl pallas needs batch_size % 16 == 0, got {b}")
        from diffpose_tpu.ops.pallas_igcn_train import (
            make_pallas_implicit_train_step,
        )

        imp = self.config.implicit or ImplicitConfig()
        return make_pallas_implicit_train_step(
            self.model_diff, optimizer, self.betas, ema_mu=ema_mu,
            axis_name=axis_name, use_warm_start=warm,
            tol_schedule=tol_schedule,
            **self._pallas_step_kwargs(in_sweep=in_sweep),
        )

    def _wrap_warm_start_sweep(self, raw_sweep, momentum: float):
        """Warm-start carry across sweep DISPATCHES, shared between the main
        and tail sweep fns so the epoch-long carry is seamless (within a
        dispatch the scan carries it; reference ``igcn.py:309-313``)."""
        m = self.config.model
        carry = getattr(self, "_sweep_warm_carry", None)
        if carry is None:
            carry = self._sweep_warm_carry = {"z0": None, "w": 0.0}

        def step(state, data, idx, key):
            if carry["z0"] is None:
                carry["z0"] = jnp.zeros((idx.shape[1], m.n_pts, m.hid_dim))
            new_state, metrics = raw_sweep(
                state, data, idx, key, carry["z0"],
                jnp.asarray(carry["w"], jnp.float32),
            )
            carry["z0"] = metrics.pop("fixed_point")
            carry["w"] = momentum
            return new_state, metrics

        def reset():
            carry["z0"], carry["w"] = None, 0.0

        step.reset = reset
        return step

    def init_state(self, optimizer) -> TrainState:
        if not self.use_implicit:
            return super().init_state(optimizer)
        from diffpose_tpu.models import ema_register

        params = self._params_diff_init
        ema = ema_register(params) if self.config.model.ema else None
        return TrainState.create(
            params, optimizer.init(params), ema_params=ema,
            model_state=self._model_state_init,
        )

    def _build_train_step(self, steps_per_epoch: int):
        if not self.use_implicit:
            return super()._build_train_step(steps_per_epoch)
        o = self.config.optim
        optimizer = make_optimizer(
            optimizer=o.optimizer, lr=o.lr, lr_gamma=o.lr_gamma,
            decay_epochs=o.decay, steps_per_epoch=steps_per_epoch,
            grad_clip=o.grad_clip, eps=o.eps,
        )
        ema_mu = self.config.model.ema_rate if self.config.model.ema else None
        imp = self.config.implicit or ImplicitConfig()
        warm = imp.use_warm_start
        tol_schedule = (
            (imp.init_tol, imp.final_tol, imp.tol_decay_steps)
            if imp.use_progressive_tol
            else None
        )
        if self.mesh is not None:
            from diffpose_tpu.parallel.sharding import make_sharded_implicit_train_step

            base_step = self._implicit_pallas_train_base(
                optimizer, ema_mu, tol_schedule, warm,
                in_sweep=False, axis_name="data",
            )
            step_fn = make_sharded_implicit_train_step(
                self.model_diff, optimizer, self.betas, self.mesh,
                ema_mu=ema_mu, mask=self.mask, use_warm_start=warm,
                tol_schedule=tol_schedule, base_step=base_step,
            )
        else:
            base_step = self._implicit_pallas_train_base(
                optimizer, ema_mu, tol_schedule, warm, in_sweep=False)
            step_fn = jax.jit(
                base_step
                or make_implicit_train_step(
                    self.model_diff, optimizer, self.betas, ema_mu=ema_mu,
                    mask=self.mask, use_warm_start=warm,
                    tol_schedule=tol_schedule,
                ),
                donate_argnums=(0,),
            )
        step_fn = self._maybe_exec_cache(step_fn)
        if warm:
            step_fn = self._wrap_warm_start(step_fn, imp.warm_start_momentum)
        return optimizer, step_fn

    def _wrap_warm_start(self, raw_step, momentum: float):
        """Carry the previous batch's fixed point into the next step — the
        functional equivalent of the reference's ``last_fixed_point`` buffer
        (``igcn.py:309-313``); ``.reset()`` mirrors ``reset_history``
        (called per epoch, ``implicit_pose.py:319-320``)."""
        m = self.config.model
        carry = {"z0": None, "w": 0.0}

        def step(state, batch, key):
            if carry["z0"] is None:
                n = batch["poses_3d"].shape[0]
                carry["z0"] = jnp.zeros((n, m.n_pts, m.hid_dim))
            new_state, metrics = raw_step(
                state, batch, key, carry["z0"], jnp.asarray(carry["w"], jnp.float32)
            )
            carry["z0"] = metrics.pop("fixed_point")
            carry["w"] = momentum
            return new_state, metrics

        def reset():
            carry["z0"], carry["w"] = None, 0.0

        step.reset = reset
        return step

    def evaluate(self, is_train: bool = False, state: Optional[TrainState] = None) -> Tuple[float, float]:
        if not self.use_implicit:
            return super().evaluate(is_train=is_train, state=state)
        with jax.default_matmul_precision(self.eval_matmul_precision):
            return self._evaluate_implicit(is_train=is_train, state=state)

    def _implicit_pallas_overrides(self):
        """Weight-free fused-kernel closures (built once, cached).

        The fixed-point solve runs the 5-layer stack as one VMEM-resident
        Pallas kernel per iteration (parity-grade bf16x3 matmuls), the lift
        as another (``ops/pallas_igcn.py``).  Both take the weights as
        RUNTIME operands — the eval step feeds them the exact weights under
        evaluation from ``state``, so per-epoch eval never re-traces.
        """
        if self.denoiser_impl != "pallas":
            return None, None
        cached = self._eval_cache.get("pallas_overrides_implicit")
        if cached is None:
            from diffpose_tpu.ops.pallas_denoiser import make_pallas_lifter_fn
            from diffpose_tpu.ops.pallas_igcn import make_pallas_igcn_fn

            m = self.config.model
            interpret = jax.default_backend() != "tpu"
            cached = (
                make_pallas_igcn_fn(
                    self.model_diff, precision=self.kernel_precision,
                    interpret=interpret,
                ),
                make_pallas_lifter_fn(
                    self.basis,
                    num_layers=m.num_layer, num_heads=m.n_head, hid_dim=m.hid_dim,
                    precision=self.kernel_precision, interpret=interpret,
                ),
            )
            self._eval_cache["pallas_overrides_implicit"] = cached
        return cached

    def _get_implicit_eval_fn(self, warm: bool):
        """The jitted direct-inference eval step — built once, reused."""
        key = ("implicit_eval_fn", warm)
        fn = self._eval_cache.get(key)
        if fn is not None:
            return fn
        self._eval_builds += 1
        t_cfg = self.config.testing
        solve_override, lift_override = self._implicit_pallas_overrides()
        if self.mesh is not None:
            # Frames shard over `data`; each shard solves independently —
            # the reference's chunked-eval semantics (one fixed-point solve
            # per chunk, implicit_pose.py:523-526), chunk = shard.
            from diffpose_tpu.parallel.sharding import make_sharded_implicit_eval_step

            fn = make_sharded_implicit_eval_step(
                self.model_diff, self.model_pose, self.mesh,
                t_infer=t_cfg.test_num_diffusion_timesteps,
                test_times=t_cfg.test_times, mask=self.mask,
                use_ema=self.use_ema_eval, use_warm_start=warm,
                solve_override=solve_override, lift_override=lift_override,
            )
        else:
            fn = jax.jit(
                make_implicit_eval_step(
                    self.model_diff, self.model_pose,
                    t_infer=t_cfg.test_num_diffusion_timesteps,
                    test_times=t_cfg.test_times, mask=self.mask,
                    use_ema=self.use_ema_eval, use_warm_start=warm,
                    solve_override=solve_override, lift_override=lift_override,
                )
            )
        fn = self._maybe_exec_cache(fn)
        self._eval_cache[key] = fn
        return fn

    def _evaluate_implicit(self, is_train: bool = False, state: Optional[TrainState] = None) -> Tuple[float, float]:
        assert self.model_diff is not None and self.model_pose is not None
        assert self.test_data is not None and self.pose_params is not None
        t_cfg = self.config.testing

        if state is None:
            if self.state is None:
                self.state = TrainState.create(
                    self._params_diff_init, opt_state=(),
                    model_state=self._model_state_init,
                )
            state = self.state

        imp = self.config.implicit or ImplicitConfig()
        warm = imp.use_warm_start
        eval_fn = self._get_implicit_eval_fn(warm)

        loader = self._make_loader(self.test_data, shuffle=False)
        acc = ActionErrorAccumulator(
            self.test_data.actions,
            num_joints=self.config.model.n_pts,
            reference_compat=self.reference_compat,
        )
        self.inference_times, self.fp_iterations = [], []

        # Warm-start carry across eval batches (reference last_fixed_point;
        # reset at eval entry, implicit_pose.py:466-467).
        from diffpose_tpu.parallel.sharding import data_sharding, shard_batch

        z0, z0_w = None, 0.0
        for batch in loader.epoch(0):
            t0 = time.time()
            dev_batch = shard_batch(self.mesh, batch) if self.mesh is not None else batch
            if warm:
                if z0 is None:
                    n = batch["poses_3d"].shape[0] * t_cfg.test_times
                    z0 = jnp.zeros((n, self.config.model.n_pts, self.config.model.hid_dim))
                    if self.mesh is not None:
                        z0 = jax.device_put(z0, data_sharding(self.mesh))
                p1_b, p2_b, _, iters, z0 = eval_fn(
                    state, self.pose_params, dev_batch, self._next_key(),
                    z0, jnp.asarray(z0_w, jnp.float32),
                )
                z0_w = imp.warm_start_momentum
            else:
                p1_b, p2_b, _, iters = eval_fn(state, self.pose_params, dev_batch, self._next_key())
            p1_b, p2_b = np.asarray(p1_b), np.asarray(p2_b)
            self.inference_times.append(time.time() - t0)
            self.fp_iterations.append(float(np.mean(np.asarray(iters))))
            acc.add(batch, p1_b, p2_b)

        self.eval_frames = acc.frames
        logger.info(
            "MPJPE: %.4f | P-MPJPE: %.4f | mean fp iterations: %.1f",
            acc.p1_meter.avg, acc.p2_meter.avg,
            float(np.mean(self.fp_iterations)) if self.fp_iterations else 0.0,
        )
        return acc.summarize(print_table=not is_train)
