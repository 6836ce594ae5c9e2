#!/bin/bash
# Long-run unattended soak (VERDICT r4 item 8): a multi-hour synthetic-data
# pretrain on the real v5e with a mid-run kill + ELASTIC resume at a
# different topology (1 real TPU chip -> 8-virtual-device CPU dp mesh ->
# back to the TPU), exercising the reference's 200-epoch contract
# (reference train.py:122-137) at production length: checkpoint cadence,
# resume continuity, kNN-probe curve, step-time stability, leaks.
#
# Phases (each resumes from runs/soak_r05/checkpoints/checkpoint_latest):
#   A  TPU, batch 32, 500 steps/epoch, target 30 epochs — KILLED mid-run
#      by the driver (kill $(cat /tmp/soak.pid)) after ~45 min
#   B  CPU dp8 elastic hop: same params/optimizer state restored onto an
#      8-device mesh for one short epoch (batch 16, 8 steps — ViT-B on one
#      CPU core is ~1-2 min/step; the hop proves topology-changing resume,
#      not CPU throughput)
#   C  TPU again, resumed, runs to the target epoch count
#
# Usage: bash soak_r05.sh A|B|C
set -e
cd "$(dirname "$0")"
JOB="job_name=soak_r05 output_dir=runs data.synthetic=true"
COMMON="model.scan_layers=true model.remat=true opt.warmup_epochs=3 \
  log.save_freq=10 log.eval_freq=5 log.print_freq=100"
TPU_ARGS="$JOB $COMMON opt.batch_size=32 data.steps_per_epoch=500 opt.epochs=12"

case "$1" in
  A)
    exec python train.py $TPU_ARGS
    ;;
  B)
    # one elastic CPU epoch: the resume epoch is the last completed epoch
    # in train.log + 1; opt.epochs is set to exactly one more than that
    EP=$(python - <<'PYEOF'
import re
ep = -1
for line in open("runs/soak_r05/train.log"):
    m = re.search(r"\[Ep-(\d+)/\d+\] Total time", line)
    if m:
        ep = int(m.group(1))
print(ep + 2)   # resume starts at ep+1; run exactly one epoch
PYEOF
)
    echo "elastic CPU epoch: opt.epochs=$EP"
    exec env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python train.py $JOB $COMMON opt.batch_size=8 data.steps_per_epoch=4 \
      opt.epochs=$EP
    ;;
  C)
    exec python train.py $TPU_ARGS
    ;;
  *)
    echo "usage: bash soak_r05.sh A|B|C" >&2
    exit 2
    ;;
esac
