#!/bin/bash
# Round-2 queue, part D.  Replaces the tail of run_queue_r2c.sh with the
# wall-clock-aware order: the VERDICT-mandated horizon-ablation points
# (state T64/T256 are fast; thin_goal T64/T256 next) BEFORE the breadth
# extra (mount), since the state family can complete a full {16,64,256}
# ablation curve inside the remaining round time while mount is ~2h of
# single-point breadth the hill_10M_r2 run already evidences.
cd /root/repo

# wait for the in-flight state_T16_r2 left running by the killed r2c queue
INFLIGHT=${1:-0}
while [ "$INFLIGHT" != 0 ] && [ -e "/proc/$INFLIGHT" ]; do
  sleep 30
done

run() {  # run <id> <script> <config> <num_envs> [extra args...]
  local id=$1 script=$2 cfg=$3 envs=$4; shift 4
  for i in $(seq 1 4); do
    RESUME=""
    [ -e "runs/$id/A1MoveGround/0/model/checkpoint" ] && RESUME="--resume"
    timeout 7200 python "$script" \
      --config "$cfg" --seed 0 --log_dir runs --id "$id" \
      --num_epochs 611 --num_envs "$envs" $RESUME "$@" \
      >> "/tmp/train_$id.log" 2>&1 && { echo "DONE $id" >> /tmp/queue_r2.log; return; }
    echo "=== $id attempt $i crashed; retrying ===" >> "/tmp/train_$id.log"
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
echo QUEUE_R2D_DONE >> /tmp/queue_r2.log
