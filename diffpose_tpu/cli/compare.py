"""Side-by-side comparison driver (capability parity with
``compare_methods.py``): runs the standard diffusion eval and the implicit
direct-inference eval on the same data/config and reports both, plus
timing.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

from diffpose_tpu.cli.common import (
    add_common_flags,
    make_mesh_if_requested,
    resolve_action_filter,
    setup_experiment,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_flags(parser)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    config = setup_experiment(args)

    from diffpose_tpu.config import ImplicitConfig
    from diffpose_tpu.data import make_synthetic_dataset
    from diffpose_tpu.train import DiffposeRunner
    from diffpose_tpu.train.implicit_runner import ImplicitRunner

    if config.implicit is None:
        config.implicit = ImplicitConfig()

    def data_for(runner):
        if args.synthetic_frames > 0:
            runner.set_data(None, make_synthetic_dataset(args.synthetic_frames, seed=args.seed))
        else:
            runner.prepare_data()

    results = {}
    for name, cls, kwargs in (
        ("diffusion", DiffposeRunner, {}),
        ("implicit", ImplicitRunner, {"use_implicit": True}),
    ):
        runner = cls(
            config, seed=args.seed, skip_type=args.skip_type, eta=args.eta,
            mesh=make_mesh_if_requested(args),
            use_ema_eval=args.use_ema_eval,
            downsample=args.downsample,
            action_filter=resolve_action_filter(args), **kwargs,
        )
        runner.create_diffusion_model(args.model_diff_path if name == "diffusion" else None)
        runner.create_pose_model(args.model_pose_path)
        data_for(runner)
        t0 = time.time()
        p1, p2 = runner.evaluate()
        results[name] = {"p1": p1, "p2": p2, "seconds": time.time() - t0}
        logging.info("[%s] MPJPE %.2f | P-MPJPE %.2f | %.1fs", name, p1, p2, results[name]["seconds"])

    logging.info("comparison: %s", results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
