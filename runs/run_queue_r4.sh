#!/bin/bash
# Round-4 queue: the training evidence VERDICT r3 asks for, in priority
# order —
#   1-2. thin_goal_T64_cvf{,_s1}: 10M thin-goal at the recommended T=64
#        regime with ppo.clipped_value_loss=true (the shipped-but-
#        unmeasured oscillation lever, VERDICT r3 next-round #1), seeds
#        0 and 1, against the committed thin_goal_T64{,_s1} baselines.
#   3.   mpc_thin_10M: first-ever training run for the MPC env family
#        (VERDICT #2) — config/mpc/locotransformer/thin.json, 8192-frame
#        epochs, 10M frames.
#   4.   vision_only_thin_5M: first training evidence for
#        ppo_locotransformer_vision_only (VERDICT #5).
#   5.   bf16_thin_goal_T64: reward-neutrality check for bf16 collection
#        vs the committed f32 thin_goal_T64 (VERDICT #7).
#   6.   sim2sim_nature_2M: short confirmation for the (now real)
#        sim2sim transfer eval starter (VERDICT #5).
#   7.   chair_desk_10M_r3 continuation +10M (VERDICT #6): --resume with
#        a doubled epoch budget keeps the same run dir and log.
#
# Mechanics carried from run_queue_r3.sh: cd check, setsid + process-
# group kill, attempt cap, cold-compile-aware stall windows, and a hard
# QUEUE DEADLINE so the driver's end-of-round bench gets an idle chip.
cd /root/repo || exit 1

DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 9 * 3600 ))}
QLOG=/tmp/queue_r4.log
echo "queue r4 start $(date -u +%F\ %H:%M) deadline $(date -u -d @"$DEADLINE" +%H:%M)" >> "$QLOG"

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

run() {
  local id=$1 script=$2 cfg=$3 envs=$4 seed=$5 epochs=$6; shift 6
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
    setsid timeout "$REMAIN" env "$@" python "$script" \
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
      # MPC env paths log under A1MoveGroundMPC
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

run thin_goal_T64_cvf starter/ppo_locotransformer.py \
    config/experiments/locotransformer/thin-goal-cvf.json 256 0 611
run thin_goal_T64_cvf_s1 starter/ppo_locotransformer.py \
    config/experiments/locotransformer/thin-goal-cvf.json 256 1 611
# 128 envs x 8192-frame epochs = T=64 exactly (the recommended regime)
# and half the HBM of 256 (the MPC env carries QP state per env)
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
echo QUEUE_R4_DONE >> "$QLOG"
