"""Video-variant runner: spatio-temporal diffusion over frame windows.

The reference delegates its video-based models (81/243-frame windows,
MPJPE 36.9/18.9 mm in ``resources/table_1.png``) to an external repo
(``README.md:92-93``); SURVEY §7.9 makes the family first-class here.
Orchestration parity with :class:`DiffposeRunner`: model lifecycle, GMM
forward-process training with EMA + staircase LR, per-epoch windowed DDIM
eval with the per-action P1/P2 table, Orbax checkpointing with resume.

TPU-first: training/eval steps run as one jitted device program; on a mesh
the window batch shards over ``data`` and/or the frame axis shards over
``context`` (temporal-attention K/V all-gather inside the model — see
``models/video.py``).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffpose_tpu.config import Config, VideoConfig
from diffpose_tpu.data.loader import BatchLoader
from diffpose_tpu.data.video import VideoDataset
from diffpose_tpu.diffusion import get_beta_schedule, make_skip_sequence
from diffpose_tpu.graph import H36M_EDGES, cheb_basis_from_edges
from diffpose_tpu.metrics import ActionErrorAccumulator, AverageMeter
from diffpose_tpu.models import ema_register
from diffpose_tpu.models.video import SpatioTemporalDiff
from diffpose_tpu.train.checkpoint import Checkpointer
from diffpose_tpu.train.optim import make_optimizer
from diffpose_tpu.train.state import TrainState
from diffpose_tpu.train.video_steps import make_video_eval_step, make_video_train_step

logger = logging.getLogger(__name__)


class VideoRunner:
    def __init__(
        self,
        config: Config,
        *,
        seed: int = 19960903,
        skip_type: str = "uniform",
        eta: float = 0.0,
        mesh=None,
        data_axis: Optional[str] = "data",
        cp_axis: Optional[str] = None,
        log_dir: Optional[str] = None,
        use_ema_eval: bool = False,
        reference_compat: bool = True,
        denoiser_impl: str = "module",  # "module" | "pallas"
        train_impl: str = "module",     # "module" | "pallas"
        dropout_impl: str = "masks",    # "masks" | "prng" (pallas train)
        eval_matmul_precision: str = "float32",
        train_matmul_precision: str = "float32",
        exec_cache: bool = False,
        kernel_precision: str = "bf16x3",
    ):
        self.config = config
        self.video_cfg = config.video or VideoConfig()
        self.seed = seed
        self.skip_type = skip_type
        self.eta = eta
        self.mesh = mesh
        # which mesh axes exist/apply; with mesh=None both are ignored
        self.data_axis = data_axis if (mesh is not None and data_axis in (mesh.axis_names if mesh else ())) else None
        self.cp_axis = cp_axis if (mesh is not None and cp_axis in (mesh.axis_names if mesh else ())) else None
        self.log_dir = log_dir
        self.use_ema_eval = use_ema_eval
        self.reference_compat = reference_compat
        self.denoiser_impl = denoiser_impl
        self.train_impl = train_impl
        self.dropout_impl = dropout_impl
        self.eval_matmul_precision = eval_matmul_precision
        self.train_matmul_precision = train_matmul_precision
        # disk-backed executable cache (utils/aot_cache.py, see DiffposeRunner)
        self.exec_cache = exec_cache
        # Pallas kernel matmul grade (see DiffposeRunner.kernel_precision)
        self.kernel_precision = (
            None if kernel_precision == "default" else kernel_precision)
        self._denoise_override = None

        d = config.diffusion
        self.betas = get_beta_schedule(
            d.beta_schedule, beta_start=d.beta_start, beta_end=d.beta_end,
            num_diffusion_timesteps=d.num_diffusion_timesteps,
        )
        self.basis = cheb_basis_from_edges(config.model.n_pts, H36M_EDGES, order=2)
        self.mask = jnp.ones((1, 1, config.model.n_pts))
        self.key = jax.random.PRNGKey(seed)

        self.model: Optional[SpatioTemporalDiff] = None
        self.state: Optional[TrainState] = None
        self.train_data: Optional[VideoDataset] = None
        self.test_data: Optional[VideoDataset] = None
        self.checkpointer: Optional[Checkpointer] = None
        if log_dir is not None:
            self.checkpointer = Checkpointer(log_dir)

        self.inference_times: list = []
        self.eval_frames: int = 0

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _maybe_exec_cache(self, fn):
        if not self.exec_cache:
            return fn
        from diffpose_tpu.utils.aot_cache import cached_jit

        return cached_jit(fn)

    # ------------------------------------------------------------------

    def create_video_model(self):
        m, v = self.config.model, self.video_cfg
        self.model = SpatioTemporalDiff(
            basis=self.basis,
            frames=v.frames,
            hid_dim=m.hid_dim,
            coords_in=m.coords_dim[0],
            coords_out=m.coords_dim[1],
            num_layers=v.num_layers,
            num_heads=m.n_head,
            dropout_rate=v.dropout,
            n_pts=m.n_pts,
            cp_axis=self.cp_axis,
            attention_chunk=v.attention_chunk,
        )
        # init with the LOCAL frame count the mesh will present
        f_local = v.frames // (self.mesh.shape[self.cp_axis] if self.cp_axis else 1)
        if self.cp_axis is None:
            params = self.model.init(
                {"params": self._next_key()},
                jnp.zeros((2, f_local, m.n_pts, m.coords_dim[0])),
                jnp.zeros((2,)),
            )["params"]
        else:
            # CP modules touch axis_index → init must run inside shard_map;
            # an identically-structured cp_axis=None twin avoids that.
            twin = self.model.clone(cp_axis=None, frames=f_local)
            params = twin.init(
                {"params": self._next_key()},
                jnp.zeros((2, f_local, m.n_pts, m.coords_dim[0])),
                jnp.zeros((2,)),
            )["params"]
            # restore the full-length positional table
            params = dict(params)
            params["pos_embed"] = jnp.asarray(
                jax.random.normal(self._next_key(), (v.frames, m.hid_dim)) * 0.02
            )
        self._params_init = params
        return self.model

    def set_data(self, train: Optional[VideoDataset], test: Optional[VideoDataset]):
        self.train_data = train
        self.test_data = test
        for name, ds in (("training", train), ("testing", test)):
            if ds is not None:
                logger.info(
                    "%s windows: %d × %d frames", name, len(ds), ds.poses_3d.shape[1]
                )

    def prepare_data(self):
        """Build window datasets from the configured H3.6M npz pair."""
        from diffpose_tpu.data.pipeline import prepare_h36m_sequences
        from diffpose_tpu.data.video import make_video_windows

        d, v = self.config.data, self.video_cfg
        train_seq, test_seq = prepare_h36m_sequences(
            d.dataset_path, d.dataset_path_train_2d, d.dataset_path_test_2d
        )
        self.set_data(
            make_video_windows(*train_seq, frames=v.frames,
                               stride=v.train_stride or v.frames),
            make_video_windows(*test_seq, frames=v.frames,
                               stride=v.eval_stride or v.frames),
        )

    # ------------------------------------------------------------------

    def _make_loader(self, data: VideoDataset, shuffle: bool) -> BatchLoader:
        return BatchLoader(
            data,
            batch_size=self.config.training.batch_size,
            shuffle=shuffle,
            seed=self.seed,
            process_count=jax.process_count(),
            process_index=jax.process_index(),
        )

    def _pallas_train_kwargs(self) -> dict:
        """Kernel config for make_pallas_video_train_step: the frame
        family's fastest tiles ((64, 32), whole-row attention) — the
        spatial-block math is identical; the fused ``B·F`` row axis is
        zero-padded to the tile inside the fn.  Off-TPU (interpret) the
        small tiling keeps CPU smoke tests cheap, and ``prng`` dropout
        falls back to masks (Mosaic interpret has no PRNG).  On TPU,
        ``--dropout_impl prng`` is the measured fast choice for video
        training (18.9k vs 16.7k frames/s; docs/PERF.md round-4b)."""
        interpret = jax.default_backend() != "tpu"
        dropout = self.dropout_impl
        if dropout == "prng" and interpret:
            logger.warning(
                "--dropout_impl prng needs TPU hardware (Mosaic interpret "
                "mode has no PRNG); using explicit masks")
            dropout = "masks"
        if interpret:
            return dict(interpret=True, dropout=dropout,
                        block_b_fwd=8, block_b_bwd=8, group=4)
        return dict(interpret=False, dropout=dropout,
                    block_b_fwd=64, block_b_bwd=32, group=17,
                    vmem_limit_bytes=100 * 2**20)

    def _pallas_train_step(self, optimizer, ema_mu, data_axis=None):
        from diffpose_tpu.ops.pallas_video_train import make_pallas_video_train_step

        assert bool(np.all(np.asarray(self.mask) == 1)), (
            "--train_impl pallas assumes the all-True joint mask")
        return make_pallas_video_train_step(
            self.model, optimizer, self.betas, ema_mu=ema_mu,
            data_axis=data_axis,
            precision=self.kernel_precision or "bf16x3",
            **self._pallas_train_kwargs(),
        )

    def _build_train_step(self, steps_per_epoch: int):
        o = self.config.optim
        optimizer = make_optimizer(
            optimizer=o.optimizer, lr=o.lr, lr_gamma=o.lr_gamma,
            decay_epochs=o.decay, steps_per_epoch=steps_per_epoch,
            grad_clip=o.grad_clip, eps=o.eps,
        )
        ema_mu = self.config.model.ema_rate if self.config.model.ema else None
        use_pallas = self.train_impl == "pallas"
        if use_pallas and self.cp_axis is not None:
            logger.warning(
                "--train_impl pallas does not compose with context "
                "parallelism (the temporal K/V all-gather lives in the "
                "module forward); using the module train step")
            use_pallas = False
        if self.mesh is not None:
            from diffpose_tpu.parallel.sharding import make_sharded_video_train_step

            base_step = (
                self._pallas_train_step(optimizer, ema_mu, self.data_axis)
                if use_pallas else None)
            step_fn = make_sharded_video_train_step(
                self.model, optimizer, self.betas, self.mesh,
                data_axis=self.data_axis, cp_axis=self.cp_axis,
                ema_mu=ema_mu, mask=self.mask, base_step=base_step,
            )
        elif use_pallas:
            step_fn = jax.jit(
                self._pallas_train_step(optimizer, ema_mu),
                donate_argnums=(0,),
            )
        else:
            step_fn = jax.jit(
                make_video_train_step(
                    self.model, optimizer, self.betas, ema_mu=ema_mu, mask=self.mask
                ),
                donate_argnums=(0,),
            )
        return optimizer, self._maybe_exec_cache(step_fn)

    def train(self, resume: bool = False) -> Dict[str, list]:
        with jax.default_matmul_precision(self.train_matmul_precision):
            return self._train(resume=resume)

    def _train(self, resume: bool = False) -> Dict[str, list]:
        assert self.model is not None and self.train_data is not None
        loader = self._make_loader(self.train_data, shuffle=True)
        steps_per_epoch = len(loader)
        optimizer, step_fn = self._build_train_step(steps_per_epoch)

        if self.state is None:
            params = self._params_init
            ema = ema_register(params) if self.config.model.ema else None
            self.state = TrainState.create(params, optimizer.init(params), ema_params=ema)
        if resume and self.checkpointer is not None and self.checkpointer.latest_step() is not None:
            self.state, _ = self.checkpointer.restore(self.state)
            logger.info(
                "resumed from step %d (epoch %d)", int(self.state.step), int(self.state.epoch)
            )

        from diffpose_tpu.data.loader import prefetch_to_device
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = None
        if self.mesh is not None:
            # Windows shard over data AND frames over context; per-window
            # scalars only over data.
            pose_s = NamedSharding(self.mesh, P(self.data_axis, self.cp_axis))
            flat_s = NamedSharding(self.mesh, P(self.data_axis))
            sharding = lambda k: pose_s if k in ("poses_3d", "poses_2d_gmm") else flat_s

        history = {"loss": [], "p1": [], "p2": []}
        best_p1, best_epoch = float("inf"), -1
        start_epoch = int(self.state.epoch)
        for epoch in range(start_epoch, self.config.training.n_epochs):
            t0 = time.time()
            # async H2D staging on both paths — per-step synchronous
            # device_put is exactly the host stall docs/PERF.md measured
            batches = prefetch_to_device(loader.epoch(epoch), size=2, sharding=sharding)
            step_losses = []
            for batch in batches:
                self.state, metrics = step_fn(self.state, batch, self._next_key())
                step_losses.append(metrics["loss"])  # async; fetched at epoch end
            self.state = self.state.replace(epoch=jnp.asarray(epoch + 1, jnp.int32))
            epoch_loss = AverageMeter()
            epoch_loss.update(float(jnp.mean(jnp.stack(step_losses))), len(step_losses))
            history["loss"].append(epoch_loss.avg)
            logger.info(
                "| Epoch %04d | steps %d | loss %.6f | %.2fs |",
                epoch, steps_per_epoch, epoch_loss.avg, time.time() - t0,
            )
            if self.checkpointer is not None:
                self.checkpointer.save(int(self.state.step), self.state)
            if self.test_data is not None:
                p1, p2 = self.evaluate(is_train=True)
                history["p1"].append(p1)
                history["p2"].append(p2)
                if p1 < best_p1:
                    best_p1, best_epoch = p1, epoch
                logger.info(
                    "| Best Epoch: %04d MPJPE: %.2f | Epoch: %04d MPJPE: %.2f PA-MPJPE: %.2f |",
                    best_epoch, best_p1, epoch, p1, p2,
                )
        return history

    # ------------------------------------------------------------------

    def _get_denoise_override(self):
        """The fused-kernel video denoiser — built once; weights are
        runtime operands, so the one compiled program serves every epoch's
        weights (live or EMA).  ``--denoiser_impl pallas`` fuses the
        spatial blocks (``ops/pallas_video.py``); ``pallas_full`` runs the
        ENTIRE spatio-temporal forward as one kernel
        (``ops/pallas_video_full.py``; whole windows per kernel, so it
        does not compose with context parallelism)."""
        if self.denoiser_impl not in ("pallas", "pallas_st", "pallas_full"):
            return None
        if self._denoise_override is None:
            assert bool(np.all(np.asarray(self.mask) == 1)), (
                "--denoiser_impl pallas assumes the all-True joint mask")
            interpret = jax.default_backend() != "tpu"
            if self.denoiser_impl == "pallas_full":
                if self.cp_axis is not None:
                    raise ValueError(
                        "--denoiser_impl pallas_full owns whole windows; "
                        "it does not compose with context parallelism "
                        "(use --denoiser_impl pallas under a context mesh)")
                from diffpose_tpu.ops.pallas_video_full import (
                    make_pallas_video_full_fn,
                )

                self._denoise_override = make_pallas_video_full_fn(
                    self.model, precision=self.kernel_precision,
                    interpret=interpret,
                )
            else:
                from diffpose_tpu.ops.pallas_video import (
                    make_pallas_video_denoiser_fn,
                )

                if self.denoiser_impl == "pallas_st" and self.cp_axis is not None:
                    raise ValueError(
                        "--denoiser_impl pallas_st temporal kernels own "
                        "whole frame windows; they do not compose with "
                        "context parallelism (use --denoiser_impl pallas)")
                self._denoise_override = make_pallas_video_denoiser_fn(
                    self.model, precision=self.kernel_precision,
                    interpret=interpret,
                    temporal_impl=(
                        "pallas" if self.denoiser_impl == "pallas_st"
                        else "xla"),
                )
        return self._denoise_override

    def evaluate(self, is_train: bool = False, state: Optional[TrainState] = None) -> Tuple[float, float]:
        with jax.default_matmul_precision(self.eval_matmul_precision):
            return self._evaluate(is_train=is_train, state=state)

    def _evaluate(self, is_train: bool = False, state: Optional[TrainState] = None) -> Tuple[float, float]:
        assert self.model is not None and self.test_data is not None
        t_cfg = self.config.testing
        seq = make_skip_sequence(
            self.skip_type, t_cfg.test_timesteps, t_cfg.test_num_diffusion_timesteps
        )
        if state is None:
            if self.state is None:
                self.state = TrainState.create(self._params_init, opt_state=())
            state = self.state

        denoise_override = self._get_denoise_override()
        if self.mesh is not None:
            from diffpose_tpu.parallel.sharding import make_sharded_video_eval_step

            eval_fn = make_sharded_video_eval_step(
                self.model, self.betas, seq, self.mesh,
                frames_total=self.video_cfg.frames,
                data_axis=self.data_axis, cp_axis=self.cp_axis,
                test_times=t_cfg.test_times, eta=self.eta, mask=self.mask,
                use_ema=self.use_ema_eval, denoise_override=denoise_override,
            )
        else:
            core = make_video_eval_step(
                self.model, self.betas, seq,
                test_times=t_cfg.test_times, eta=self.eta, mask=self.mask,
                use_ema=self.use_ema_eval, denoise_override=denoise_override,
            )
            jitted = self._maybe_exec_cache(jax.jit(core))

            def eval_fn(st, batch, key):
                needed = {k: batch[k] for k in ("poses_2d_gmm", "poses_3d", "seeds")}
                return jitted(st, needed, key)

        loader = self._make_loader(self.test_data, shuffle=False)
        acc = ActionErrorAccumulator(
            self.test_data.actions,
            num_joints=self.config.model.n_pts,
            reference_compat=self.reference_compat,
        )
        self.inference_times = []

        for batch in loader.epoch(0):
            t0 = time.time()
            p1_b, p2_b, _ = eval_fn(state, batch, self._next_key())
            p1_b, p2_b = np.asarray(p1_b), np.asarray(p2_b)  # [B, F]
            self.inference_times.append(time.time() - t0)
            # per-frame errors flatten; each frame inherits its window action
            acc.add(batch, p1_b, p2_b, frames_per_item=p1_b.shape[1])

        self.eval_frames = acc.frames
        logger.info("MPJPE: %.4f | P-MPJPE: %.4f", acc.p1_meter.avg, acc.p2_meter.avg)
        return acc.summarize(print_table=not is_train)

    # ------------------------------------------------------------------

    def throughput_stats(self) -> Dict[str, float]:
        total = sum(self.inference_times)
        return {
            "eval_frames": self.eval_frames,
            "eval_seconds": total,
            "frames_per_second": self.eval_frames / total if total > 0 else 0.0,
        }
