#!/bin/bash
# Round-2 queue, part K: finish the two incomplete runs after the VM
# rebuild wiped the r2j session — mount_10M (438/610 epochs) and
# state_T16_r2 (488/610).  Both resume via the warm-start path
# (log.csv + best snapshot survive in git; orbax checkpoints do not).
cd /root/repo

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
    T0=$(date +%s)
    timeout 7200 python "$script" \
      --config "$cfg" --seed 0 --log_dir runs --id "$id" \
      --num_epochs 611 --num_envs "$envs" --resume "$@" \
      >> "/tmp/train_$id.log" 2>&1 &
    TPID=$!
    LOG="runs/$id/A1MoveGround/0/log.csv"
    while kill -0 $TPID 2>/dev/null; do
      sleep 120
      if [ -e "$LOG" ]; then
        M=$(stat -c %Y "$LOG")
        # clamp to attempt start: a log.csv left stale by a PREVIOUS
        # crashed attempt must not insta-kill the resume mid-compile
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
    config/rl/challenge/locotransformer/mountain.json 512
run state_T16_r2 starter/ppo_state.py \
    config/rl/static/state-only-baseline.json 1024
echo QUEUE_R2K_DONE >> /tmp/queue_r2.log
