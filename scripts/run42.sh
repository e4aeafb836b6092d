#!/bin/bash
# run_8-scale convergence driver: 4x2 drone scene, 14k steps, octree bake.
# Auto-resume wrapper: the TPU worker can wedge mid-run; each retry resumes
# from the latest common per-cell checkpoint.
cd "$(dirname "$0")/.."
mkdir -p .exp
for attempt in 1 2 3 4 5 6; do
  echo "=== attempt $attempt $(date -u +%H:%M:%S) ==="
  timeout 9000 python scripts/cell_convergence_run.py \
    --grid 4 2 --scene drone --hw 128 --n_train 48 --n_val 4 \
    --steps 14000 --ckpt_interval 1500 --val_interval 3500 \
    --workdir .exp/conv42_r3 --resume --bake
  rc=$?
  echo "=== attempt $attempt exited rc=$rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
