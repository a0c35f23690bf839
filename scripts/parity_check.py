"""Real-data accuracy parity driver: reproduce the reference per-action table.

Given the H3.6M npz pair and the reference's pretrained checkpoints
(``gcn_xyz_{cpn,gt}.pth`` + ``diffpose_uvxyz_{cpn,gt}.pth``), run the full
eval protocol (2 uniform DDIM steps, η=0, hypothesis mean — matching
``runners/diffpose_frame.py:270-420``) and assert the per-action P1 table
matches the published numbers (``resources/table_1.png``, transcribed in
``BASELINE.md``) within a tolerance.

Neither the npz files nor the checkpoints exist in this build environment;
``--fabricated`` exercises the identical code path end-to-end on fabricated
data + randomly-initialized torch checkpoints so the real run is one
file-drop away (VERDICT r1 item 7).

Usage:
    scripts/parity.sh cpn DATA_DIR CKPT_DIR   # or: gt
    python scripts/parity_check.py --fabricated
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Published per-action P1 (mm) — BASELINE.md / resources/table_1.png Table 3.
PUBLISHED_P1 = {
    "cpn": {
        "Directions": 42.8, "Discussion": 49.1, "Eating": 45.2,
        "Greeting": 48.7, "Phoning": 52.1, "Photo": 63.5, "Posing": 46.3,
        "Purchases": 45.2, "Sitting": 58.6, "SittingDown": 66.3,
        "Smoking": 50.4, "Waiting": 47.6, "WalkDog": 52.0, "Walking": 37.6,
        "WalkTogether": 40.2, "__avg__": 49.7,
    },
    "gt": {
        "Directions": 28.8, "Discussion": 32.7, "Eating": 27.8,
        "Greeting": 30.9, "Phoning": 32.8, "Photo": 38.9, "Posing": 32.2,
        "Purchases": 28.3, "Sitting": 33.3, "SittingDown": 41.0,
        "Smoking": 31.0, "Waiting": 32.1, "WalkDog": 31.5, "Walking": 25.9,
        "WalkTogether": 27.5, "__avg__": 31.6,
    },
}


def run_eval(args):
    from diffpose_tpu.config import load_config
    from diffpose_tpu.train.trainer import DiffposeRunner

    config = load_config(args.config)
    if args.data_3d:
        config.data.dataset_path = args.data_3d
    if args.data_2d:
        config.data.dataset_path_train_2d = args.data_2d
        config.data.dataset_path_test_2d = args.data_2d
    runner = DiffposeRunner(
        config,
        seed=args.seed,
        eval_sweep=args.eval_sweep,
        denoiser_impl=args.denoiser_impl,
    )
    runner.create_diffusion_model(args.model_diff)
    runner.create_pose_model(args.model_pose)
    runner.prepare_data()
    p1, p2 = runner.evaluate()
    per_action = {
        a: acc["p1"].avg * 1000.0 for a, acc in runner.last_error_sum.items()
    }
    per_action["__avg__"] = p1
    return per_action, p2


def check(per_action, mode: str, tolerance: float) -> int:
    published = PUBLISHED_P1[mode]
    worst, ok = 0.0, True
    for action, want in published.items():
        got = per_action.get(action)
        if got is None:
            print(f"MISSING action {action}")
            ok = False
            continue
        delta = abs(got - want)
        worst = max(worst, delta)
        status = "ok" if delta <= tolerance else "FAIL"
        name = "average" if action == "__avg__" else action
        print(f"{name:>14}: got {got:6.2f} want {want:6.2f} |Δ| {delta:5.2f} mm  {status}")
        ok &= delta <= tolerance
    print(f"worst |ΔP1| = {worst:.2f} mm (tolerance {tolerance} mm)")
    return 0 if ok else 1


def run_fabricated() -> int:
    """Self-test: the identical pipeline on fabricated npz + random ckpts."""
    import tempfile

    import numpy as np
    import torch

    rng = np.random.default_rng(19960903)
    with tempfile.TemporaryDirectory() as td:
        # --- fabricated mini-H36M npz pair (TEST subjects only needed) ---
        # all TRAIN subjects must exist (prepare_h36m fetches S1..S8 like
        # the reference does) plus the TEST subjects S9/S11
        subjects = {s: ["Walking 1"] for s in ("S1", "S5", "S6", "S7", "S8")}
        subjects.update({"S9": ["Walking 1", "Eating"], "S11": ["Greeting"]})
        pos_3d = {
            s: {a: rng.normal(scale=0.3, size=(16, 32, 3)).astype(np.float32)
                for a in acts}
            for s, acts in subjects.items()
        }
        np.savez(f"{td}/data_3d.npz", positions_3d=np.array(pos_3d, dtype=object))
        kp = {}
        for s, acts in subjects.items():
            kp[s] = {}
            for a in acts:
                kp[s][a] = [
                    rng.uniform(0, 1000, size=(16, 17, 5, 5)).astype(np.float32)
                    for _ in range(4)
                ]
                for arr in kp[s][a]:
                    arr[..., 0] = 1.0 / 5
                    arr[..., 3:] = np.abs(arr[..., 3:]) / 1000.0
        np.savez(f"{td}/data_2d.npz", positions_2d=np.array(kp, dtype=object))

        # --- random reference-ABI checkpoints via the torch oracle ---
        sys.path.insert(0, "/root/reference")
        from types import SimpleNamespace

        from models.ChebConv import adj_mx_from_edges
        from models.gcndiff import GCNdiff
        from models.gcnpose import GCNpose

        torch.manual_seed(0)
        edges = torch.tensor(
            [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7], [7, 8],
             [8, 9], [9, 10], [8, 11], [11, 12], [12, 13], [8, 14], [14, 15],
             [15, 16]])
        adj = adj_mx_from_edges(17, edges, sparse=False)
        mc = SimpleNamespace(hid_dim=96, emd_dim=96, coords_dim=[5, 5],
                             num_layer=5, n_head=4, dropout=0.25, n_pts=17)
        diff = GCNdiff(adj, SimpleNamespace(model=mc))
        mc2 = SimpleNamespace(**{**vars(mc), "coords_dim": [2, 3]})
        pose = GCNpose(adj, SimpleNamespace(model=mc2))
        torch.save([diff.state_dict(), None, 0, 0, None], f"{td}/diff.pth")
        torch.save([pose.state_dict(), None, 0, 0, None], f"{td}/pose.pth")

        args = argparse.Namespace(
            config="configs/human36m_diffpose_uvxyz_gt.yml",
            data_3d=f"{td}/data_3d.npz", data_2d=f"{td}/data_2d.npz",
            model_diff=f"{td}/diff.pth", model_pose=f"{td}/pose.pth",
            seed=19960903, eval_sweep=1, denoiser_impl="module",
        )
        per_action, p2 = run_eval(args)
        assert np.isfinite(p2), p2
        assert np.isfinite(per_action["__avg__"])
        # fabricated data has 2 test actions (S9/S11) + the average
        assert len(per_action) >= 3, sorted(per_action)
        print(json.dumps({k: round(v, 2) for k, v in per_action.items()}))
        print("fabricated parity pipeline OK (accuracy not asserted: random "
              "weights / random data — drop the real npz+pth files in and "
              "run scripts/parity.sh for the 0.5 mm check)")
        return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=("cpn", "gt"), default="gt")
    p.add_argument("--config", default=None)
    p.add_argument("--data_3d", default=None)
    p.add_argument("--data_2d", default=None)
    p.add_argument("--model_diff", default=None)
    p.add_argument("--model_pose", default=None)
    p.add_argument("--tolerance", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=19960903)
    p.add_argument("--eval_sweep", type=int, default=1)
    p.add_argument("--denoiser_impl", default="module")
    p.add_argument("--fabricated", action="store_true",
                   help="self-test the pipeline on fabricated data")
    args = p.parse_args(argv)

    if args.fabricated:
        return run_fabricated()

    if args.config is None:
        args.config = f"configs/human36m_diffpose_uvxyz_{args.mode}.yml"
    for required in ("data_3d", "data_2d", "model_diff", "model_pose"):
        if getattr(args, required) is None:
            p.error(f"--{required} is required (or use --fabricated)")
    per_action, p2 = run_eval(args)
    print(f"P2 (P-MPJPE): {p2:.2f} mm (not published in the reference)")
    return check(per_action, args.mode, args.tolerance)


if __name__ == "__main__":
    sys.exit(main())
