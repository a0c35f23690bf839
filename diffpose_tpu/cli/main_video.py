"""Video-variant CLI: train/eval the spatio-temporal diffusion model.

The reference points users at an external repo for its video results
(``README.md:92-93``); this makes the family a first-class citizen with
the same CLI conventions as the frame model, plus mesh flags for
data/context parallelism (``--data_parallel``, ``--context_parallel``).
"""

from __future__ import annotations

import argparse
import logging
import sys
import traceback

from diffpose_tpu.cli.common import add_common_flags, setup_experiment


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    parser.add_argument("--frames", type=int, default=None,
                        help="override video.frames (window length, e.g. 81/243)")
    parser.add_argument("--context_parallel", type=int, default=0, metavar="N",
                        help="shard the frame axis over N devices (context mesh axis); "
                        "composes with --data_parallel on a 2-D mesh")
    parser.add_argument("--synthetic_windows", default=0, type=int,
                        help="use a synthetic dataset of N windows (smoke runs)")
    return parser.parse_args(argv)


def _make_video_mesh(args):
    """1-D data, 1-D context, or 2-D (data × context) mesh."""
    import jax

    from diffpose_tpu.parallel import make_mesh

    cp = args.context_parallel
    if args.data_parallel and cp > 0:
        n = len(jax.devices())
        assert n % cp == 0, f"{n} devices not divisible by context={cp}"
        return make_mesh((n // cp, cp), ("data", "context"))
    if args.data_parallel:
        return make_mesh()
    if cp > 0:
        return make_mesh((cp,), ("context",), devices=jax.devices()[:cp])
    return None


def main(argv=None) -> int:
    args = parse_args(argv)
    config = setup_experiment(args)

    from diffpose_tpu.config import VideoConfig
    if config.video is None:
        config.video = VideoConfig()
    if args.frames is not None:
        config.video.frames = args.frames

    from diffpose_tpu.train.video_runner import VideoRunner

    # Sweep knobs are frame-runner features; say so instead of silently
    # accepting them from the shared flag set.
    # (--denoiser_impl pallas applies at eval, ops/pallas_video.py;
    # --train_impl pallas + --dropout_impl apply in training,
    # ops/pallas_video_train.py.)
    for flag, default in (("eval_sweep", 1), ("train_sweep", 1)):
        if getattr(args, flag) != default:
            logging.warning("--%s is not supported by the video runner; ignored", flag)

    try:
        runner = VideoRunner(
            config,
            seed=args.seed,
            skip_type=args.skip_type,
            eta=args.eta,
            mesh=_make_video_mesh(args),
            data_axis="data",
            cp_axis="context" if args.context_parallel > 0 else None,
            log_dir=args.log_path,
            use_ema_eval=args.use_ema_eval,
            denoiser_impl=args.denoiser_impl,
            train_impl=args.train_impl,
            dropout_impl=args.dropout_impl,
            exec_cache=args.exec_cache,
            kernel_precision=args.kernel_precision,
            eval_matmul_precision=args.matmul_precision,
            train_matmul_precision=args.matmul_precision,
        )
        runner.create_video_model()

        if args.synthetic_windows > 0:
            from diffpose_tpu.data.video import synthetic_video_dataset

            runner.set_data(
                synthetic_video_dataset(
                    args.synthetic_windows, config.video.frames, seed=args.seed
                ),
                synthetic_video_dataset(
                    max(args.synthetic_windows // 4, 1), config.video.frames,
                    seed=args.seed + 1,
                ),
            )
        else:
            runner.prepare_data()

        if args.train:
            runner.train(resume=args.resume)
        else:
            p1, p2 = runner.evaluate()
            logging.info("Final | MPJPE: %.2f mm | P-MPJPE: %.2f mm", p1, p2)
            if args.track_metrics:
                stats = runner.throughput_stats()
                logging.info(
                    "eval throughput: %.0f frames/s (%d frames in %.2fs)",
                    stats["frames_per_second"], stats["eval_frames"],
                    stats["eval_seconds"],
                )
    except Exception:
        logging.error(traceback.format_exc())
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
