#!/usr/bin/env bash
# Round-4 endurance marathon: the paper's batch-8000 config
# (/root/reference/train_with_model_saving.py:16,23-24 — global batch
# 8000, 3:1 G:D) on ONE chip via --grad_accum 8, exercising the round-3/4
# surface end-to-end: FID eval (fixed-seed random classifier weights,
# eval/random_weights.py), auto-computed reference statistics, orbax
# checkpointing, and >=2 SIGKILL crash-recoveries.
#
# Crash injection waits for epoch lines in the log before killing — a kill
# mid-compile wedges the remote compile service (~30 min), so each leg
# only dies AFTER training steps are demonstrably running.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash examples/marathon_b8000.sh [RUN_DIR]
set -u
RUN_DIR="${1:-/tmp/otgan_marathon_r4}"
LOG_DIR="$RUN_DIR/logs"
WEIGHTS="$RUN_DIR/inception_rw.npz"
mkdir -p "$RUN_DIR" "$LOG_DIR"

COMMON_FLAGS=(
  --preset model_saving --synthetic_data --synthetic_size 10000
  --grad_accum 8 --remat --checkpoint_backend orbax
  --save_dir "$RUN_DIR" --log_every_steps 1
  --eval_every_epochs 15 --eval_fid --inception_batch 500
  --save_every_epochs 10 --max_checkpoints_to_keep 3
  --keep_checkpoint_every_n_hours 0.2
  --max_epochs 60
)

export OTGAN_INCEPTION_WEIGHTS="$WEIGHTS"

log() { echo "[marathon $(date -u +%H:%M:%S)] $*"; }

if [ ! -f "$WEIGHTS" ]; then
  log "writing fixed-seed random classifier weights -> $WEIGHTS"
  python -u -m otgan_tpu.eval.random_weights --out "$WEIGHTS" --seed 2024
fi

# wait_epoch LOGFILE N PID: block until "epoch=N" appears (compile done,
# steps flowing) or the process exits
wait_epoch() {
  local logfile="$1" epoch="$2" pid="$3"
  while kill -0 "$pid" 2>/dev/null; do
    if grep -q "epoch=${epoch}," "$logfile" 2>/dev/null; then return 0; fi
    sleep 10
  done
  return 1  # process exited on its own
}

run_leg() {
  local name="$1" kill_after_epoch="$2"; shift 2
  local logfile="$LOG_DIR/$name.log"
  log "leg $name starting (extra flags: $*) -> $logfile"
  python -u -m otgan_tpu.train "${COMMON_FLAGS[@]}" "$@" \
    > "$logfile" 2>&1 &
  local pid=$!
  if [ "$kill_after_epoch" -ge 0 ]; then
    if wait_epoch "$logfile" "$kill_after_epoch" "$pid"; then
      # past compile and past the target epoch: simulate session loss
      log "leg $name reached epoch $kill_after_epoch -> SIGKILL $pid"
      kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 0
    fi
    wait "$pid"; local rc=$?
    log "leg $name exited rc=$rc before epoch $kill_after_epoch"
    return $rc
  fi
  wait "$pid"; local rc=$?
  log "leg $name finished rc=$rc"
  return $rc
}

# leg 1: fresh start, die after the first eval event (epoch 15) at epoch 21
run_leg leg1 21
# leg 2: resume, die after the second eval (epoch 30) mid-training at 41
run_leg leg2 41 --load_params
# leg 3: resume, run to completion (epoch 60)
run_leg leg3 -1 --load_params
rc=$?

log "marathon complete rc=$rc; artifacts:"
ls -la "$RUN_DIR" "$RUN_DIR"/orbax 2>/dev/null
grep -h "inception\|FID\|fid" "$LOG_DIR"/*.log | tail -20
exit $rc
