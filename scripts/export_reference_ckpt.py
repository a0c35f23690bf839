"""Export an Orbax training checkpoint to the reference's .pth ABI.

Models trained by this framework become loadable by the reference
implementation (``--model_diff_path`` / ``--model_pose_path`` on its
CLIs, strict ``load_state_dict``): the latest (or ``--step``) Orbax
checkpoint under ``LOG_PATH/checkpoints`` is converted with
``models/convert.py:params_to_torch_state`` and written as the
5-element state list (``[model, optim, epoch, step, ema]``,
``runners/diffpose_frame.py:248-255``).  The optimizer slot is left
``None`` — the reference never restores it.

Usage:
  python scripts/export_reference_ckpt.py LOG_PATH OUT.pth
      [--family frame|implicit] [--step N] [--hid_dim 96] [--layers 5]
  # the lifter saved alongside (pose_params):
  python scripts/export_reference_ckpt.py LOG_PATH OUT.pth --what pose
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_path", help="experiment dir (holding checkpoints/)")
    p.add_argument("out", help="output .pth path")
    p.add_argument("--what", choices=("diff", "pose"), default="diff")
    p.add_argument("--family", choices=("frame", "implicit"), default="frame")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--hid_dim", type=int, default=96)
    p.add_argument("--layers", type=int, default=5)
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp

    from diffpose_tpu.models.convert import (
        igcn_variables_to_torch_state,
        params_to_torch_state,
        save_torch_states,
    )

    ckpt_dir = os.path.join(os.path.abspath(args.log_path), "checkpoints")
    if not os.path.isdir(ckpt_dir):
        ckpt_dir = os.path.abspath(args.log_path)  # direct checkpoints dir
    mngr = ocp.CheckpointManager(ckpt_dir)
    step = args.step if args.step is not None else mngr.latest_step()
    if step is None:
        print(f"no checkpoint found under {ckpt_dir}", file=sys.stderr)
        return 1
    restored = mngr.restore(step)  # raw pytree (no template needed)
    state = restored["state"]

    to_np = lambda t: None if t is None else __import__("jax").tree_util.tree_map(
        np.asarray, t)
    epoch = int(np.asarray(state.get("epoch", 0)))
    gstep = int(np.asarray(state.get("step", step)))

    if args.what == "pose":
        pose_params = restored.get("pose_params")
        if pose_params is None:
            print("checkpoint holds no pose_params", file=sys.stderr)
            return 1
        sd = params_to_torch_state(
            to_np(pose_params), num_layers=args.layers, with_temb=False,
            hid_dim=args.hid_dim)
        save_torch_states(args.out, sd, epoch=epoch, step=gstep)
    else:
        params = to_np(state["params"])
        ema = to_np(state.get("ema_params"))
        if args.family == "implicit":
            variables = {"params": params,
                         "batch_stats": to_np(state.get("model_state")) or {}}
            sd = igcn_variables_to_torch_state(
                variables, num_layers=args.layers, hid_dim=args.hid_dim)
            ema_sd = None
            if ema is not None:
                ema_sd = igcn_variables_to_torch_state(
                    {"params": ema,
                     "batch_stats": to_np(state.get("model_state")) or {}},
                    num_layers=args.layers, hid_dim=args.hid_dim)
        else:
            sd = params_to_torch_state(
                params, num_layers=args.layers, with_temb=True,
                hid_dim=args.hid_dim)
            ema_sd = None if ema is None else params_to_torch_state(
                ema, num_layers=args.layers, with_temb=True,
                hid_dim=args.hid_dim)
        save_torch_states(args.out, sd, epoch=epoch, step=gstep,
                          ema_state=ema_sd)
    print(f"exported step {step} → {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
