#!/bin/bash
# Round-2 queue, part H: rerun state_T64 / state_T256, which burned all
# their r2g retry budget on the donation-on-axon crash (fixed in commit
# "agent: probe donation support").  Waits for r2g to drain first so
# only one training job holds the chip.
cd /root/repo
until grep -q QUEUE_R2G_DONE /tmp/queue_r2.log 2>/dev/null; do sleep 120; done

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
        AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
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

run state_T64 starter/ppo_state.py \
    config/rl/static/state-only-baseline.json 256 --overwrite
run state_T256 starter/ppo_state.py \
    config/rl/static/state-only-baseline.json 64 --overwrite
echo QUEUE_R2H_DONE >> /tmp/queue_r2.log
