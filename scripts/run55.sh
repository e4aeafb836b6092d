#!/bin/bash
# 5x5-grid (25-submodule) short on-chip workflow: masks -> train_cells ->
# merge -> merged eval (+ bake smoke). Evidence that the reference's
# 25-submodule family (/root/reference/README.md:46) runs through the
# flagship cell-parallel path end to end. Auto-resume wrapper: the TPU
# worker can wedge mid-run. --batch_size 512: the vmapped one-chip mode
# materializes num_cells x batch x samples activations — 25 cells at the
# paper 1024 overflow the 16 GB v5e (the 4x2 grid fit).
cd "$(dirname "$0")/.."
mkdir -p .exp
for attempt in 1 2 3 4; do
  echo "=== attempt $attempt $(date -u +%H:%M:%S) ==="
  timeout 7200 python scripts/cell_convergence_run.py \
    --grid 5 5 --scene drone --hw 128 --n_train 60 --n_val 4 \
    --steps 800 --ckpt_interval 100 --batch_size 512 \
    --workdir .exp/conv55b_r5 --resume
  rc=$?
  echo "=== attempt $attempt exited rc=$rc ==="
  [ $rc -eq 0 ] && break
  sleep 60
done
