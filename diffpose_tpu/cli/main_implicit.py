"""Implicit-pose CLI (capability parity with ``main_implicit_pose.py``).

Adds the implicit-solver flags on top of the frame CLI; the GPU-memory
chunking flags of the reference (``--process_chunk_size`` etc.) have no TPU
equivalent (static shapes + sharding) and are accepted-but-ignored with a
warning for drop-in compatibility.
"""

from __future__ import annotations

import argparse
import logging
import sys
import traceback

from diffpose_tpu.cli.common import (
    add_common_flags,
    make_mesh_if_requested,
    resolve_action_filter,
    setup_experiment,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--use_implicit", action="store_true",
                        help="use the IGCN fixed-point model instead of GCNDiff")
    parser.add_argument("--implicit_iters", type=int, default=None,
                        help="max fixed-point iterations")
    parser.add_argument("--implicit_tol", type=float, default=None,
                        help="fixed-point convergence tolerance")
    parser.add_argument("--min_iterations", type=int, default=None,
                        help="minimum iterations before convergence can trigger")
    parser.add_argument("--use_warm_start", action="store_true")
    parser.add_argument(
        "--detect_anomaly", action="store_true",
        help="enable jax_debug_nans — every jitted computation is re-run "
        "op-by-op when a NaN appears and raises at the producing op; the "
        "JAX equivalent of torch.autograd.set_detect_anomaly "
        "(main_implicit_pose.py:101-102, 232-234)")
    # accepted for reference-CLI compatibility; no-ops on TPU
    for flag in ("--use_memory_efficient", "--use_dynamic_chunks",
                 "--expandable_segments"):
        parser.add_argument(flag, action="store_true", help=argparse.SUPPRESS)
    for flag in ("--process_chunk_size", "--min_chunk_size", "--max_chunk_size"):
        parser.add_argument(flag, type=int, default=None, help=argparse.SUPPRESS)
    parser.add_argument("--target_memory_usage", type=float, default=None,
                        help=argparse.SUPPRESS)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    config = setup_experiment(args)

    from diffpose_tpu.config import ImplicitConfig
    if config.implicit is None:
        config.implicit = ImplicitConfig()
    if args.implicit_iters is not None:
        config.implicit.max_iterations = args.implicit_iters
    if args.implicit_tol is not None:
        config.implicit.tolerance = args.implicit_tol
    if args.min_iterations is not None:
        config.implicit.min_iterations = args.min_iterations
    if args.use_warm_start:
        config.implicit.use_warm_start = True
    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)
        logging.info("anomaly detection on: jax_debug_nans enabled")
    for noop in ("use_dynamic_chunks", "process_chunk_size", "target_memory_usage"):
        if getattr(args, noop, None):
            logging.warning("--%s has no TPU equivalent (static shapes); ignored", noop)

    from diffpose_tpu.train.implicit_runner import ImplicitRunner

    if args.use_implicit:
        # The fixed-point eval has no DDIM sweep to batch.
        # (--denoiser_impl pallas selects the fused fixed-point inference
        # kernels, ops/pallas_igcn.py; --train_impl pallas selects the
        # fused backprop-through-the-solve train step,
        # ops/pallas_igcn_train.py.)
        if args.eval_sweep > 1:
            logging.warning("--eval_sweep has no effect with --use_implicit")

    try:
        runner = ImplicitRunner(
            config,
            use_implicit=args.use_implicit,
            seed=args.seed,
            skip_type=args.skip_type,
            eta=args.eta,
            mesh=make_mesh_if_requested(args),
            log_dir=args.log_path,
            use_ema_eval=args.use_ema_eval,
            downsample=args.downsample,
            action_filter=resolve_action_filter(args),
            eval_sweep=args.eval_sweep,
            train_sweep=args.train_sweep,
            denoiser_impl=args.denoiser_impl,
            train_impl=args.train_impl,
            exec_cache=args.exec_cache,
            kernel_precision=args.kernel_precision,
            dropout_impl=args.dropout_impl,
            eval_matmul_precision=args.matmul_precision,
            train_matmul_precision=args.matmul_precision,
        )
        runner.create_diffusion_model(args.model_diff_path)
        runner.create_pose_model(args.model_pose_path)

        if args.synthetic_frames > 0:
            from diffpose_tpu.data import make_synthetic_dataset

            runner.set_data(
                make_synthetic_dataset(args.synthetic_frames, seed=args.seed),
                make_synthetic_dataset(max(args.synthetic_frames // 4, 1), seed=args.seed + 1),
            )
        else:
            runner.prepare_data()

        if args.train:
            runner.train(resume=args.resume)
        else:
            p1, p2 = runner.evaluate()
            logging.info("Final | MPJPE: %.2f mm | P-MPJPE: %.2f mm", p1, p2)
            if args.track_metrics and runner.fp_iterations:
                import numpy as np

                logging.info(
                    "fixed-point iterations: mean %.1f min %d max %d",
                    float(np.mean(runner.fp_iterations)),
                    min(runner.fp_iterations), max(runner.fp_iterations),
                )
    except Exception:
        logging.error(traceback.format_exc())
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
