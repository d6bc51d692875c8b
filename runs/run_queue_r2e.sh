#!/bin/bash
# Round-2 queue, part E.  Same run list as r2d, but gated on a tunnel
# watchdog: at ~19:05 UTC the axon loopback relay process died, leaving
# every device call (even jax.devices()) blocked forever — the r2d
# state_T64 attempt burned 11 s of CPU in 10 minutes waiting on a futex.
# Each run now starts only once the relay ports accept TCP again, and a
# per-attempt progress watchdog kills attempts whose log.csv stops
# growing for 15 minutes (a hung tunnel mid-run), letting the retry
# loop + --resume pick up from the last checkpoint.
cd /root/repo

tunnel_up() {
  python - <<'EOF'
import socket, sys
s = socket.socket(); s.settimeout(2)
try:
    s.connect(("127.0.0.1", 8082)); sys.exit(0)
except Exception:
    sys.exit(1)
finally:
    s.close()
EOF
}

wait_tunnel() {
  until tunnel_up; do sleep 60; done
  echo "tunnel up $(date -u +%H:%M)" >> /tmp/queue_r2.log
  sleep 10
}

run() {  # run <id> <script> <config> <num_envs> [extra args...]
  local id=$1 script=$2 cfg=$3 envs=$4; shift 4
  for i in $(seq 1 4); do
    wait_tunnel
    RESUME=""
    [ -e "runs/$id/A1MoveGround/0/model/checkpoint" ] && RESUME="--resume"
    timeout 7200 python "$script" \
      --config "$cfg" --seed 0 --log_dir runs --id "$id" \
      --num_epochs 611 --num_envs "$envs" $RESUME "$@" \
      >> "/tmp/train_$id.log" 2>&1 &
    TPID=$!
    # progress watchdog: kill the attempt if log.csv is stale >15 min
    LOG="runs/$id/A1MoveGround/0/log.csv"
    while kill -0 $TPID 2>/dev/null; do
      sleep 120
      if [ -e "$LOG" ]; then
        AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      else
        AGE=0   # not created yet: compile window, give it the stale cap
        [ -e "/proc/$TPID" ] && AGE=$(( $(date +%s) - $(stat -c %Y /proc/$TPID) ))
      fi
      if [ "$AGE" -gt 900 ]; then
        echo "=== $id attempt $i stalled ${AGE}s; killing ===" >> "/tmp/train_$id.log"
        kill $TPID 2>/dev/null; sleep 5; kill -9 $TPID 2>/dev/null
        break
      fi
    done
    wait $TPID && { echo "DONE $id" >> /tmp/queue_r2.log; return; }
    echo "=== $id attempt $i ended rc!=0; retrying ===" >> "/tmp/train_$id.log"
    sleep 15
  done
  echo "FAILED $id" >> /tmp/queue_r2.log
}

run state_T64 starter/ppo_state.py \
    config/rl/static/state-only-baseline.json 256 --overwrite
run state_T256 starter/ppo_state.py \
    config/rl/static/state-only-baseline.json 64 --overwrite
run thin_goal_T64 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 256 --overwrite
run thin_goal_T256 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 64 --overwrite
run mount_10M starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/mountain.json 512 --overwrite
echo QUEUE_R2E_DONE >> /tmp/queue_r2.log
