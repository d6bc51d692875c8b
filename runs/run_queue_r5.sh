#!/bin/bash
# Round-5 queue.  Changes vs r4c (both r4 postmortem items):
#   - COMPILE-AWARE stall windows: first attempt 3600 s, retries 1800 s
#     (r4's vision_only item was stall-killed at 1801 s while still
#     compiling its first epoch; the persistent jax cache makes retries
#     cheaper but a window tighter than one compile can loop forever).
#   - HARD deadline default 7.5 h so the chip is provably idle well
#     before the driver-bench window (r4's queue ran straight through
#     it and BENCH_r04 timed out).
# Items (warm-started MPC solver makes the two MPC-family runs feasible
# for the first time: 608 -> 2,338 env-steps/s):
#   1. mpc_thin_10M        resume from epoch 27 -> 1221 (VERDICT #3)
#   2. vision_only_thin_5M 611 epochs           (VERDICT #2)
#   3. bf16_thin_goal_T64_s1  seed-1 confirmation (VERDICT #4)
#   4. chair_desk_20M_ent  +10M warm-start continuation with the
#      entropy-floor exploration aid (VERDICT #6; dir pre-seeded from
#      chair_desk_10M_r3's best snapshot + log)
cd /root/repo || exit 1

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 27000 ))}
QLOG=/tmp/queue_r5.log
echo "queue r5 start $(date -u +%F\ %H:%M) deadline $(date -u -d @"$DEADLINE" +%H:%M)" >> "$QLOG"

tunnel_up() {
  timeout 180 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.arange(8.0).sum()) == 28.0
PYEOF
}
wait_tunnel() {
  until tunnel_up; do
    [ "$(date +%s)" -ge "$1" ] && return 1
    sleep 120
  done
  echo "tunnel up (device probe) $(date -u +%H:%M)" >> "$QLOG"
}

done_already() {
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
    # compile-aware: the first attempt's window must cover a cold jax
    # compile of the full train program (observed up to ~45 min for the
    # MPC-env families on this host)
    STALL=$(( first == 1 ? 3600 : 1800 ))
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

# r5 session-2 reorder: vision_only first — it is the only family with
# ZERO epochs ever (VERDICT Missing #2) and the VM rebuild wiped the
# compile cache, so both MPC-family items pay a cold compile either way;
# if the wall clock truncates the queue, vision_only evidence is worth
# more than extending mpc_thin's existing 196-epoch curve.
run vision_only_thin_5M 10800 starter/ppo_locotransformer_vision_only.py \
    config/mpc_vision_only/locotransformer/thin.json 128 0 611
run mpc_thin_10M 12600 starter/ppo_locotransformer.py \
    config/mpc/locotransformer/thin.json 128 0 1221
run bf16_thin_goal_T64_s1 2700 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 256 1 611 \
    V4L_BF16_COLLECT=1
run chair_desk_20M_ent 99999 starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/chair_desk_ent.json 256 0 1222
echo QUEUE_R5_DONE >> "$QLOG"
