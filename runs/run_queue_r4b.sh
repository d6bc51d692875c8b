#!/bin/bash
# Round-4 queue, relaunch segment: the items run_queue_r4.sh didn't get
# to before its 08:30 deadline (external chip contention ate ~2h of the
# morning window).  Same mechanics as run_queue_r4.sh (setsid group
# kill, stall windows, attempt cap, hard deadline) plus:
#   - done_already(): skip a run whose log.csv already reached its
#     final epoch, so re-listing the full priority order costs nothing;
#   - runs launch with V4L_CKPT_SECS=120 so a contention stall-kill
#     replays at most ~2 min of progress (time-based resume points,
#     agent.py train loop).
cd /root/repo || exit 1

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 9 * 3600 ))}
QLOG=/tmp/queue_r4.log
echo "queue r4b start $(date -u +%F\ %H:%M) deadline $(date -u -d @"$DEADLINE" +%H:%M)" >> "$QLOG"

tunnel_up() {
  timeout 180 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.arange(8.0).sum()) == 28.0
PYEOF
}
wait_tunnel() {
  until tunnel_up; do
    [ "$(date +%s)" -ge "$DEADLINE" ] && return 1
    sleep 120
  done
  echo "tunnel up (device probe) $(date -u +%H:%M)" >> "$QLOG"
}

done_already() {
  # $1 = run id, $2 = seed, $3 = target num_epochs: true if any env
  # subdir's log.csv last row is the final epoch (EPOCH is 0-indexed)
  local last
  for log in runs/"$1"/*/"$2"/log.csv; do
    [ -e "$log" ] || continue
    last=$(tail -1 "$log" | cut -d, -f1)
    case "$last" in (*[!0-9]*|"") continue;; esac
    [ "$last" -ge $(( $3 - 1 )) ] && return 0
  done
  return 1
}

run() {
  local id=$1 script=$2 cfg=$3 envs=$4 seed=$5 epochs=$6; shift 6
  local attempts=0 max_attempts=6 first=1
  if done_already "$id" "$seed" "$epochs"; then
    echo "SKIP $id (already at final epoch)" >> "$QLOG"; return 0
  fi
  while [ "$attempts" -lt "$max_attempts" ]; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "DEADLINE before $id attempt $attempts" >> "$QLOG"; return 1
    fi
    wait_tunnel || { echo "DEADLINE in wait_tunnel ($id)" >> "$QLOG"; return 1; }
    attempts=$(( attempts + 1 ))
    T0=$(date +%s)
    REMAIN=$(( DEADLINE - T0 ))
    [ "$REMAIN" -le 300 ] && { echo "DEADLINE too close for $id" >> "$QLOG"; return 1; }
    setsid timeout "$REMAIN" env V4L_CKPT_SECS=120 "$@" python "$script" \
      --config "$cfg" --seed "$seed" --log_dir runs --id "$id" \
      --num_epochs "$epochs" --num_envs "$envs" --resume \
      >> "/tmp/train_$id.log" 2>&1 &
    TPID=$!
    LOG="runs/$id/A1MoveGround/$seed/log.csv"
    [ -e "runs/$id/A1MoveGroundMPC/$seed/log.csv" ] && LOG="runs/$id/A1MoveGroundMPC/$seed/log.csv"
    STALL=$(( first == 1 ? 1800 : 900 ))
    while kill -0 "$TPID" 2>/dev/null; do
      sleep 60
      NOW=$(date +%s)
      [ ! -e "$LOG" ] && [ -e "runs/$id/A1MoveGroundMPC/$seed/log.csv" ] \
        && LOG="runs/$id/A1MoveGroundMPC/$seed/log.csv"
      if [ "$NOW" -ge "$DEADLINE" ]; then
        echo "=== $id hit queue deadline; killing group ===" >> "/tmp/train_$id.log"
        kill -TERM -- -"$TPID" 2>/dev/null; sleep 10
        kill -KILL -- -"$TPID" 2>/dev/null
        echo "DEADLINE during $id" >> "$QLOG"; return 1
      fi
      if [ -e "$LOG" ]; then
        M=$(stat -c %Y "$LOG")
        [ "$M" -lt "$T0" ] && M=$T0
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
    if wait "$TPID"; then
      echo "DONE $id ($attempts attempts)" >> "$QLOG"; return 0
    fi
    echo "=== $id attempt $attempts/$max_attempts ended rc!=0 after $(( $(date +%s) - T0 ))s ===" \
      >> "/tmp/train_$id.log"
    sleep 15
  done
  echo "FAILED $id after $max_attempts attempts" >> "$QLOG"
  return 1
}

run thin_goal_T64_cvf_s1 starter/ppo_locotransformer.py \
    config/experiments/locotransformer/thin-goal-cvf.json 256 1 611
run mpc_thin_10M starter/ppo_locotransformer.py \
    config/mpc/locotransformer/thin.json 128 0 1221
run vision_only_thin_5M starter/ppo_locotransformer_vision_only.py \
    config/mpc_vision_only/locotransformer/thin.json 128 0 611
run bf16_thin_goal_T64 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 256 0 611 \
    V4L_BF16_COLLECT=1
run sim2sim_nature_2M starter/ppo_nature_cnn_sim2sim.py \
    config/rl/static/naive_baseline/thin-goal.json 256 0 122
run chair_desk_10M_r3 starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/chair_desk.json 256 0 1222
echo QUEUE_R4B_DONE >> "$QLOG"
