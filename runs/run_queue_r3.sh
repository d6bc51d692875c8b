#!/bin/bash
# Round-3 queue: the runs VERDICT r2 asks for, in priority order —
#   1. chair_desk_10M_r3: re-run on the DECODED reference geometry
#      (tipped-over furniture, 50+30 joint sampling, fences, no
#      subgoals — see PARITY.md round-3 chair_desk root cause) at the
#      recommended T=64 regime (256 envs).
#   2. mount_10M_r3: re-train on the REAL wm_height_out.png terrain
#      (r2's 1295 was earned on the procedural stand-in), 256 envs.
#   3. thin_goal_T64_s1: second seed at the recommended regime so the
#      seed-variance claim rests on T=64 (VERDICT r2 #8).
#
# ADVICE r2 fixes carried in:
#   * cd is checked (ADVICE: silent wrong-cwd).
#   * attempts are launched with setsid and the whole PROCESS GROUP is
#     SIGKILLed (ADVICE: SIGKILL to the timeout wrapper never reached a
#     TERM-stuck python child, orphaning a trainer that then contended
#     with the next attempt).
#   * a hard per-run attempt cap counts EVERY attempt (ADVICE: sub-120s
#     crashes never decremented the budget -> infinite retry).
#   * the no-log-progress stall threshold is 1800 s for a run's first
#     attempt (cold remote compile can exceed 15 min), 900 s after the
#     persistent compile cache is warm (ADVICE: legit first compiles
#     were killed at 900 s).
#   * a QUEUE DEADLINE kills everything: the driver benches the chip at
#     round end, and r2's headline number was destroyed by a queue that
#     outlived its round (VERDICT r2 weak #1).  Default 8 h.
cd /root/repo || exit 1

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 8 * 3600 ))}
QLOG=/tmp/queue_r3.log
echo "queue r3 start $(date -u +%F\ %H:%M) deadline $(date -u -d @"$DEADLINE" +%H:%M)" >> "$QLOG"

tunnel_up() {
  timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.arange(8.0).sum()) == 28.0
EOF
}
wait_tunnel() {
  until tunnel_up; do
    [ "$(date +%s)" -ge "$DEADLINE" ] && return 1
    sleep 120
  done
  echo "tunnel up (device probe) $(date -u +%H:%M)" >> "$QLOG"
}

run() {
  local id=$1 script=$2 cfg=$3 envs=$4 seed=$5; shift 5
  local attempts=0 max_attempts=6 first=1
  while [ "$attempts" -lt "$max_attempts" ]; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "DEADLINE before $id attempt $attempts" >> "$QLOG"; return 1
    fi
    wait_tunnel || { echo "DEADLINE in wait_tunnel ($id)" >> "$QLOG"; return 1; }
    attempts=$(( attempts + 1 ))
    T0=$(date +%s)
    REMAIN=$(( DEADLINE - T0 ))
    [ "$REMAIN" -le 300 ] && { echo "DEADLINE too close for $id" >> "$QLOG"; return 1; }
    setsid timeout "$REMAIN" python "$script" \
      --config "$cfg" --seed "$seed" --log_dir runs --id "$id" \
      --num_epochs 611 --num_envs "$envs" --resume "$@" \
      >> "/tmp/train_$id.log" 2>&1 &
    TPID=$!
    LOG="runs/$id/A1MoveGround/$seed/log.csv"
    STALL=$(( first == 1 ? 1800 : 900 ))
    while kill -0 "$TPID" 2>/dev/null; do
      sleep 60
      NOW=$(date +%s)
      if [ "$NOW" -ge "$DEADLINE" ]; then
        echo "=== $id hit queue deadline; killing group ===" >> "/tmp/train_$id.log"
        kill -TERM -- -"$TPID" 2>/dev/null; sleep 10
        kill -KILL -- -"$TPID" 2>/dev/null
        echo "DEADLINE during $id" >> "$QLOG"; return 1
      fi
      if [ -e "$LOG" ]; then
        M=$(stat -c %Y "$LOG")
        [ "$M" -lt "$T0" ] && M=$T0   # stale log from a prior attempt
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

run chair_desk_10M_r3 starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/chair_desk.json 256 0
run mount_10M_r3 starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/mountain.json 256 0
run thin_goal_T64_s1 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 256 1
echo QUEUE_R3_DONE >> "$QLOG"
