#!/bin/bash
# Canonical launch recipes (capability parity with the reference runner.sh).
# Usage: scripts/run.sh {traincpn|traingt|trainipose|testcpn|testgt|compare|smoke}
set -e
cd "$(dirname "$0")/.."

case "${1:?usage: run.sh <recipe>}" in
  traincpn)
    python -m diffpose_tpu.cli.main_frame --train --ni \
      --config configs/human36m_diffpose_uvxyz_cpn.yml --doc train_cpn \
      --batch_size 1024 --model_pose_path checkpoints/gcn_xyz_cpn.pth \
      --data_parallel
    ;;
  traingt)
    python -m diffpose_tpu.cli.main_frame --train --ni \
      --config configs/human36m_diffpose_uvxyz_gt.yml --doc train_gt \
      --batch_size 1024 --model_pose_path checkpoints/gcn_xyz_gt.pth \
      --data_parallel
    ;;
  trainipose)
    python -m diffpose_tpu.cli.main_implicit --train --ni --use_implicit \
      --config configs/human36m_ipose.yml --doc train_ipose \
      --batch_size 512 --track_metrics
    ;;
  testcpn)
    python -m diffpose_tpu.cli.main_frame --ni \
      --config configs/human36m_diffpose_uvxyz_cpn.yml --doc test_cpn \
      --model_diff_path checkpoints/diffpose_uvxyz_cpn.pth \
      --model_pose_path checkpoints/gcn_xyz_cpn.pth --track_metrics
    ;;
  testgt)
    python -m diffpose_tpu.cli.main_frame --ni \
      --config configs/human36m_diffpose_uvxyz_gt.yml --doc test_gt \
      --model_diff_path checkpoints/diffpose_uvxyz_gt.pth \
      --model_pose_path checkpoints/gcn_xyz_gt.pth --track_metrics
    ;;
  compare)
    python -m diffpose_tpu.cli.compare --ni \
      --config configs/human36m_ipose.yml --doc compare \
      --synthetic_frames 2048 --batch_size 512 --track_metrics
    ;;
  trainvideo)
    python -m diffpose_tpu.cli.main_video --train --ni \
      --config configs/human36m_video.yml --doc train_video \
      --track_metrics
    ;;
  testvideo)
    python -m diffpose_tpu.cli.main_video --ni \
      --config configs/human36m_video.yml --doc test_video --track_metrics
    ;;
  videosmoke)
    # synthetic windows over an 8-way 2-D (data × context) mesh
    python -m diffpose_tpu.cli.main_video --train --ni \
      --config configs/human36m_video.yml --doc video_smoke \
      --synthetic_windows 16 --frames 16 --batch_size 8 --n_epochs 2 \
      --lr 0.001 --data_parallel --context_parallel 2
    ;;
  smoke)
    python -m diffpose_tpu.cli.main_frame --train --ni \
      --config configs/human36m_diffpose_uvxyz_gt.yml --doc smoke \
      --synthetic_frames 1024 --batch_size 256 --lr 0.001
    ;;
  *)
    echo "unknown recipe: $1" >&2; exit 2
    ;;
esac
