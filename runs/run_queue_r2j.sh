#!/bin/bash
# Round-2 queue, part J: resume mount_10M (killed at epoch 262 by a
# tunnel outage, then every r2g retry was insta-killed by the stale
# log.csv stall-detector bug fixed below).  Resumes from the epoch-199
# checkpoint.  Waits for r2h, then a perf-session gate (<=60 min).
cd /root/repo
until grep -q QUEUE_R2H_DONE /tmp/queue_r2.log 2>/dev/null; do sleep 120; done
# leave the chip idle for an interactive profiling/bench session first:
# proceed when the gate opens, or after 60 min regardless so the run is
# never lost to an absent operator
GATE_T0=$(date +%s)
until [ -e /tmp/perf_gate_open ] || \
      [ $(( $(date +%s) - GATE_T0 )) -gt 3600 ]; do sleep 60; done

tunnel_up() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.arange(8.0).sum()) == 28.0
EOF
}
wait_tunnel() {
  until tunnel_up; do sleep 120; done
  echo "tunnel up (device probe) $(date -u +%H:%M)" >> /tmp/queue_r2.log
}
run() {
  local id=$1 script=$2 cfg=$3 envs=$4; shift 4
  local budget=4
  while [ "$budget" -gt 0 ]; do
    wait_tunnel
    RESUME=""
    [ -e "runs/$id/A1MoveGround/0/model/checkpoint" ] && RESUME="--resume"
    T0=$(date +%s)
    timeout 7200 python "$script" \
      --config "$cfg" --seed 0 --log_dir runs --id "$id" \
      --num_epochs 611 --num_envs "$envs" $RESUME "$@" \
      >> "/tmp/train_$id.log" 2>&1 &
    TPID=$!
    LOG="runs/$id/A1MoveGround/0/log.csv"
    while kill -0 $TPID 2>/dev/null; do
      sleep 120
      if [ -e "$LOG" ]; then
        M=$(stat -c %Y "$LOG")
        # clamp to attempt start: a log.csv left stale by a PREVIOUS
        # crashed attempt must not insta-kill the resume while it is
        # still compiling (this killed every mount_10M retry in r2g)
        [ "$M" -lt "$T0" ] && M=$T0
        AGE=$(( $(date +%s) - M ))
      else
        AGE=$(( $(date +%s) - T0 ))
      fi
      if [ "$AGE" -gt 900 ]; then
        echo "=== $id stalled ${AGE}s; killing ===" >> "/tmp/train_$id.log"
        kill $TPID 2>/dev/null; sleep 5; kill -9 $TPID 2>/dev/null
        break
      fi
    done
    wait $TPID && { echo "DONE $id" >> /tmp/queue_r2.log; return; }
    ELAPSED=$(( $(date +%s) - T0 ))
    [ "$ELAPSED" -ge 120 ] && budget=$(( budget - 1 ))
    echo "=== $id attempt ended rc!=0 after ${ELAPSED}s (budget $budget) ===" \
      >> "/tmp/train_$id.log"
    sleep 15
  done
  echo "FAILED $id" >> /tmp/queue_r2.log
}

run mount_10M starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/mountain.json 512 --overwrite
echo QUEUE_R2J_DONE >> /tmp/queue_r2.log
