#!/usr/bin/env bash
# Real-data accuracy parity vs the reference's published per-action table
# (BASELINE.md / resources/table_1.png): |ΔP1| ≤ 0.5 mm per action + average.
#
#   scripts/parity.sh cpn DATA_DIR CKPT_DIR
#   scripts/parity.sh gt  DATA_DIR CKPT_DIR
#   scripts/parity.sh fabricated          # self-test without real files
#
# DATA_DIR must hold data_3d_h36m.npz + data_2d_h36m_{cpn,gt}_gmm.npz;
# CKPT_DIR must hold gcn_xyz_{cpn,gt}.pth + diffpose_uvxyz_{cpn,gt}.pth
# (the reference's pretrained checkpoints, README.md:47-56).
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-fabricated}"
if [ "$MODE" = "fabricated" ]; then
  exec python scripts/parity_check.py --fabricated
fi

DATA_DIR="${2:?DATA_DIR required}"
CKPT_DIR="${3:?CKPT_DIR required}"
exec python scripts/parity_check.py \
  --mode "$MODE" \
  --data_3d "$DATA_DIR/data_3d_h36m.npz" \
  --data_2d "$DATA_DIR/data_2d_h36m_${MODE}_gmm.npz" \
  --model_pose "$CKPT_DIR/gcn_xyz_${MODE}.pth" \
  --model_diff "$CKPT_DIR/diffpose_uvxyz_${MODE}.pth" \
  --tolerance 0.5
