#!/bin/bash
# Round-3b queue (follows run_queue_r3.sh, which completed chair_desk_10M_r3
# [pre-spacing-fix geometry] and mount_10M_r3 [real wm_height_out.png terrain,
# eval max 2207.3]).  Two time-sliced runs on the now-fixed terrain code:
#
#   1. chair_desk_10M_r3b — re-run on the corrected geometry: the decoded
#      tipped-furniture world PLUS the reference's Poisson-disc >=1.1 m
#      minimum spacing (walkable gaps guaranteed; r3a's jittered sampling
#      let furniture fuse into walls).  Runs until its per-run deadline.
#   2. thin_goal_T64_s1 — second seed at the recommended T=64 regime
#      (VERDICT r2 #8); takes the rest of the window.
#
# HARD DEADLINES: each run has its own kill time, and the whole queue dies
# at QUEUE_END so the chip is idle when the driver benches at round end
# (the r2 headline bench was destroyed by a queue that outlived its round).
cd /root/repo || exit 1

CHAIR_END=$(date -u -d "today 12:45" +%s)
QUEUE_END=$(date -u -d "today 14:45" +%s)
QLOG=/tmp/queue_r3b.log
echo "queue r3b start $(date -u +%F\ %H:%M)" >> "$QLOG"

tunnel_up() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.arange(8.0).sum()) == 28.0
EOF
}

run() {
  local id=$1 script=$2 cfg=$3 envs=$4 seed=$5 end=$6
  local attempts=0 max_attempts=6 first=1
  while [ "$attempts" -lt "$max_attempts" ]; do
    local now=$(date +%s)
    [ "$now" -ge "$end" ] && { echo "window over for $id" >> "$QLOG"; return 1; }
    until tunnel_up; do
      [ "$(date +%s)" -ge "$end" ] && { echo "window over in wait_tunnel ($id)" >> "$QLOG"; return 1; }
      sleep 120
    done
    attempts=$(( attempts + 1 ))
    T0=$(date +%s)
    REMAIN=$(( end - T0 ))
    [ "$REMAIN" -le 300 ] && { echo "window too small for $id" >> "$QLOG"; return 1; }
    setsid timeout "$REMAIN" python "$script" \
      --config "$cfg" --seed "$seed" --log_dir runs --id "$id" \
      --num_epochs 611 --num_envs "$envs" --resume \
      >> "/tmp/train_$id.log" 2>&1 &
    TPID=$!
    LOG="runs/$id/A1MoveGround/$seed/log.csv"
    STALL=$(( first == 1 ? 1800 : 900 ))
    while kill -0 "$TPID" 2>/dev/null; do
      sleep 60
      NOW=$(date +%s)
      if [ "$NOW" -ge "$end" ]; then
        echo "=== $id hit window deadline; killing group ===" >> "/tmp/train_$id.log"
        kill -TERM -- -"$TPID" 2>/dev/null; sleep 10
        kill -KILL -- -"$TPID" 2>/dev/null
        echo "WINDOW END during $id" >> "$QLOG"; return 0
      fi
      if [ -e "$LOG" ]; then
        M=$(stat -c %Y "$LOG"); [ "$M" -lt "$T0" ] && M=$T0
        AGE=$(( NOW - M ))
      else
        AGE=$(( NOW - T0 ))
      fi
      if [ "$AGE" -gt "$STALL" ]; then
        echo "=== $id stalled ${AGE}s; killing group ===" >> "/tmp/train_$id.log"
        kill -TERM -- -"$TPID" 2>/dev/null; sleep 10
        kill -KILL -- -"$TPID" 2>/dev/null
        break
      fi
    done
    first=0
    if wait "$TPID"; then echo "DONE $id ($attempts attempts)" >> "$QLOG"; return 0; fi
    echo "=== $id attempt $attempts/$max_attempts rc!=0 after $(( $(date +%s) - T0 ))s ===" \
      >> "/tmp/train_$id.log"
    sleep 15
  done
  echo "FAILED $id after $max_attempts attempts" >> "$QLOG"
  return 1
}

run chair_desk_10M_r3b starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/chair_desk.json 256 0 "$CHAIR_END"
run thin_goal_T64_s1 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 256 1 "$QUEUE_END"
echo QUEUE_R3B_DONE >> "$QLOG"
