#!/bin/bash
# Round-4 queue, segment c: REORDERED after measuring the MPC env's real
# epoch cost (~31-49 s/epoch at 128 envs -> a 1221-epoch 10M run needs
# >10 h and was starving the four cheap VERDICT items queued behind it).
# Short, high-certainty runs go first; the two MPC-family runs take the
# tail of the window and are expected to be budget-capped partials
# (documented as such in PARITY.md).  New vs r4b:
#   - run() takes a per-item soft budget (seconds): the item's effective
#     deadline is min(QUEUE_DEADLINE, item_start + budget), so one slow
#     item cannot starve the rest; items that finish early donate their
#     leftover time to later items.
#   - log.csv discovery is a glob (works for every env subdir name).
# Same mechanics otherwise: setsid group kill, stall windows, attempt
# cap, done_already() skip, V4L_CKPT_SECS=120 bounded replay loss.
cd /root/repo || exit 1

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 9 * 3600 ))}
QLOG=/tmp/queue_r4.log
echo "queue r4c start $(date -u +%F\ %H:%M) deadline $(date -u -d @"$DEADLINE" +%H:%M)" >> "$QLOG"

tunnel_up() {
  timeout 180 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.arange(8.0).sum()) == 28.0
PYEOF
}
wait_tunnel() {
  # $1 = effective deadline for the current item
  until tunnel_up; do
    [ "$(date +%s)" -ge "$1" ] && return 1
    sleep 120
  done
  echo "tunnel up (device probe) $(date -u +%H:%M)" >> "$QLOG"
}

done_already() {
  # $1 = run id, $2 = seed, $3 = target num_epochs (EPOCH is 0-indexed)
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
  local id=$1 budget=$2 script=$3 cfg=$4 envs=$5 seed=$6 epochs=$7; shift 7
  local attempts=0 max_attempts=6 first=1
  if done_already "$id" "$seed" "$epochs"; then
    echo "SKIP $id (already at final epoch)" >> "$QLOG"; return 0
  fi
  local EDL=$(( $(date +%s) + budget ))
  [ "$EDL" -gt "$DEADLINE" ] && EDL=$DEADLINE
  echo "ITEM $id budget ${budget}s edl $(date -u -d @"$EDL" +%H:%M)" >> "$QLOG"
  while [ "$attempts" -lt "$max_attempts" ]; do
    if [ "$(date +%s)" -ge "$EDL" ]; then
      echo "ITEM-DEADLINE before $id attempt $attempts" >> "$QLOG"; return 1
    fi
    wait_tunnel "$EDL" || { echo "ITEM-DEADLINE in wait_tunnel ($id)" >> "$QLOG"; return 1; }
    attempts=$(( attempts + 1 ))
    T0=$(date +%s)
    REMAIN=$(( EDL - T0 ))
    [ "$REMAIN" -le 240 ] && { echo "ITEM-DEADLINE too close for $id" >> "$QLOG"; return 1; }
    setsid timeout "$REMAIN" env V4L_CKPT_SECS=120 "$@" python "$script" \
      --config "$cfg" --seed "$seed" --log_dir runs --id "$id" \
      --num_epochs "$epochs" --num_envs "$envs" --resume \
      >> "/tmp/train_$id.log" 2>&1 &
    TPID=$!
    STALL=$(( first == 1 ? 1800 : 900 ))
    while kill -0 "$TPID" 2>/dev/null; do
      sleep 60
      NOW=$(date +%s)
      LOG=$(ls runs/"$id"/*/"$seed"/log.csv 2>/dev/null | head -1)
      if [ "$NOW" -ge "$EDL" ]; then
        echo "=== $id hit item deadline; killing group ===" >> "/tmp/train_$id.log"
        kill -TERM -- -"$TPID" 2>/dev/null; sleep 10
        kill -KILL -- -"$TPID" 2>/dev/null
        echo "ITEM-DEADLINE during $id" >> "$QLOG"; return 1
      fi
      if [ -n "$LOG" ]; then
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

# Short, certain items first (warm compile caches for the thin-goal and
# nature families); MPC-family partials take the tail.
run sim2sim_nature_2M 1500 starter/ppo_nature_cnn_sim2sim.py \
    config/rl/static/naive_baseline/thin-goal.json 256 0 122
run bf16_thin_goal_T64 1800 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 256 0 611 \
    V4L_BF16_COLLECT=1
run chair_desk_10M_r3 2100 starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/chair_desk.json 256 0 1222
run vision_only_thin_5M 2400 starter/ppo_locotransformer_vision_only.py \
    config/mpc_vision_only/locotransformer/thin.json 128 0 611
run mpc_thin_10M 99999 starter/ppo_locotransformer.py \
    config/mpc/locotransformer/thin.json 128 0 1221
echo QUEUE_R4C_DONE >> "$QLOG"
