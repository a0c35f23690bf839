"""Shared CLI plumbing: logging, log directories, seeding, mesh setup.

Mirrors the reference main scripts' behavior
(``main_diffpose_frame.py:93-160``): log-dir create/overwrite with ``--ni``
non-interactive consent, dual stream+file logging handlers with de-dup,
config snapshot dump, and global seeding.
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil
import sys

import numpy as np


def add_common_flags(parser: argparse.ArgumentParser):
    parser.add_argument("--seed", type=int, default=19960903, help="Random seed")
    parser.add_argument("--config", type=str, required=True, help="Path to the config file")
    parser.add_argument("--exp", type=str, default="exp", help="Path for saving running related data.")
    parser.add_argument("--doc", type=str, required=True,
                        help="A string for documentation purpose. Will be the name of the log folder.")
    parser.add_argument("--verbose", type=str, default="info",
                        help="Verbose level: info | debug | warning | critical")
    parser.add_argument("--ni", action="store_true",
                        help="No interaction. Suitable for batch launchers")
    parser.add_argument("--actions", default="*", type=str, metavar="LIST",
                        help="actions to train/test on, separated by comma, or * for all")
    # diffusion process
    parser.add_argument("--skip_type", type=str, default="uniform",
                        help="skip according to (uniform or quad(quadratic))")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="eta used to control the variances of sigma")
    parser.add_argument("--downsample", default=1, type=int, metavar="FACTOR",
                        help="downsample frame rate by factor")
    # pretrained models
    parser.add_argument("--model_diff_path", default=None, type=str,
                        help="path of a pretrained diffusion model (.pth or orbax)")
    parser.add_argument("--model_pose_path", default=None, type=str,
                        help="path of a pretrained pose lifter")
    parser.add_argument("--train", action="store_true", help="train or evaluate")
    parser.add_argument("--resume", action="store_true", help="resume from the log dir checkpoint")
    # training hyperparameters (reference semantics: these ALWAYS override
    # the YAML — main_diffpose_frame.py:88-91)
    parser.add_argument("--batch_size", default=None, type=int, metavar="N")
    parser.add_argument("--n_epochs", default=None, type=int, metavar="N",
                        help="override training.n_epochs (TPU-native addition)")
    parser.add_argument("--lr_gamma", default=None, type=float, metavar="N")
    parser.add_argument("--lr", default=None, type=float, metavar="N")
    parser.add_argument("--decay", default=None, type=int, metavar="N")
    # test hyperparameters
    parser.add_argument("--test_times", default=None, type=int, metavar="N")
    parser.add_argument("--test_timesteps", default=None, type=int, metavar="N")
    parser.add_argument("--test_num_diffusion_timesteps", default=None, type=int, metavar="N")
    parser.add_argument("--track_metrics", action="store_true",
                        help="Log computational metrics (time, throughput, iterations)")
    # TPU-native additions
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batches over all local devices (data mesh axis)")
    parser.add_argument("--use_ema_eval", action="store_true",
                        help="evaluate the EMA shadow weights instead of the live weights")
    parser.add_argument("--synthetic_frames", default=0, type=int,
                        help="use a synthetic dataset of N frames instead of the npz files (smoke runs)")
    parser.add_argument("--eval_sweep", default=1, type=int, metavar="N",
                        help="eval batches per device dispatch (lax.map; identical results)")
    parser.add_argument("--train_sweep", default=1, type=int, metavar="N",
                        help="optimizer steps per device dispatch (device-resident "
                        "dataset + lax.scan over an index array; composes with "
                        "--data_parallel: data replicated, batch indices sharded)")
    parser.add_argument("--hypothesis_parallel", default=0, type=int, metavar="H",
                        help="shard test_times hypotheses over a second mesh axis "
                        "(2-D data×hypothesis mesh; psum'd hypothesis mean)")
    parser.add_argument("--train_impl", default="module",
                        choices=("module", "pallas"),
                        help="training fwd+bwd implementation: standard flax "
                        "module under XLA autodiff, or the fused whole-network "
                        "Pallas train kernels (custom VJP; single-chip, "
                        "batch_size %% 16 == 0)")
    parser.add_argument("--dropout_impl", default="masks",
                        choices=("masks", "prng"),
                        help="dropout for --train_impl pallas: explicit bf16 "
                        "masks drawn in XLA (exact flax semantics, works "
                        "everywhere) or in-kernel TPU PRNG (no mask HBM "
                        "traffic — statistically identical; TPU-only, falls "
                        "back to masks off-TPU)")
    parser.add_argument("--matmul_precision", default="float32",
                        choices=("float32", "BF16_BF16_F32_X3", "default"),
                        help="matmul passes for train AND module-eval: float32 "
                        "(strict parity), BF16_BF16_F32_X3 (3-pass bf16 — the "
                        "same decomposition the Pallas bf16x3 kernels use; "
                        "measured 50.3k vs 44.8k frames/s training, ΔP1 "
                        "~0.003 mm eval), or default (single-pass bf16; NOT "
                        "parity-grade, >1 mm P1)")
    parser.add_argument("--exec_cache", action="store_true",
                        help="cache COMPILED executables on disk "
                        "(.jax_cache_exec/): later processes skip the "
                        "40-480 s remote compile and deserialize in seconds "
                        "(this backend ignores JAX's persistent HLO cache)")
    parser.add_argument("--kernel_precision", default="bf16x3",
                        choices=("bf16x3", "bf16", "default"),
                        help="Pallas kernel matmul grade (applies to "
                        "--denoiser_impl pallas eval AND --train_impl pallas "
                        "training): bf16x3 (parity-grade emulated f32), bf16 "
                        "(bf16-resident activations + f32 accumulation -- "
                        "non-parity FAST tier), default (single-pass bf16 on "
                        "eval AND train kernels; NOT parity-grade -- train "
                        "warns loudly)")
    parser.add_argument("--denoiser_impl", default="module",
                        choices=("module", "pallas", "pallas_st", "pallas_full"),
                        help="eval forward implementation: standard module, or the "
                        "fused whole-network Pallas kernels (parity-grade bf16x3 "
                        "matmuls; single-chip eval only).  Video family only: "
                        "pallas_st adds per-layer temporal kernels next to the "
                        "spatial ones (every block kernel-resident; the "
                        "production all-kernel path); pallas_full is the "
                        "co-resident spatio-temporal kernel (compile-"
                        "pathological through this environment's remote-"
                        "compile service at 81 frames — see docs/PERF.md)")
    return parser


def setup_experiment(args):
    """Log dir + logging + config; returns the loaded Config."""
    from diffpose_tpu.config import load_config, save_config

    args.log_path = os.path.join(args.exp, args.doc)

    overrides = {}
    for k in ("batch_size", "lr", "lr_gamma", "decay"):
        v = getattr(args, k)
        if v is not None:
            overrides[k] = v
    config = load_config(args.config, cli_overrides=overrides)
    for k in ("test_times", "test_timesteps", "test_num_diffusion_timesteps"):
        v = getattr(args, k)
        if v is not None:
            setattr(config.testing, k, v)
    if args.n_epochs is not None:
        config.training.n_epochs = args.n_epochs

    if args.train and not args.resume:
        if os.path.exists(args.log_path):
            overwrite = args.ni or _ask_overwrite()
            if not overwrite:
                print("Folder exists. Program halted.")
                sys.exit(0)
            shutil.rmtree(args.log_path)
        os.makedirs(args.log_path, exist_ok=True)
        save_config(config, os.path.join(args.log_path, "config.yml"))
    else:
        os.makedirs(args.log_path, exist_ok=True)

    level = getattr(logging, args.verbose.upper(), None)
    if not isinstance(level, int):
        raise ValueError(f"level {args.verbose} not supported")
    handler1 = logging.StreamHandler()
    handler2 = logging.FileHandler(os.path.join(args.log_path, "stdout.txt"))
    formatter = logging.Formatter(
        "%(levelname)s - %(filename)s - %(asctime)s - %(message)s"
    )
    handler1.setFormatter(formatter)
    handler2.setFormatter(formatter)
    logger = logging.getLogger()
    for h in list(logger.handlers):
        logger.removeHandler(h)
    logger.addHandler(handler1)
    logger.addHandler(handler2)
    logger.setLevel(level)

    np.random.seed(args.seed)
    return config


def _ask_overwrite() -> bool:
    response = input("Folder already exists. Overwrite? (Y/N)")
    return response.upper() == "Y"


def make_mesh_if_requested(args):
    hyp = getattr(args, "hypothesis_parallel", 0)
    if not getattr(args, "data_parallel", False) and not hyp:
        return None
    from diffpose_tpu.parallel import make_mesh

    if hyp:
        import jax

        n = len(jax.devices())
        assert n % hyp == 0, f"{n} devices not divisible by hypothesis_parallel={hyp}"
        return make_mesh((n // hyp, hyp), ("data", "hypothesis"))
    return make_mesh()


def resolve_action_filter(args):
    return None if args.actions == "*" else args.actions.split(",")
