#!/bin/bash
# Round-2 queue, part B (launched after hill_10M_r2 completed): the
# remainder of run_queue_r2.sh reordered so VERDICT-mandated evidence
# (mmdr_heightfield completion, the horizon ablation + eval-collapse
# rerun) lands before breadth extras (mount, T256 tails).
cd /root/repo

run() {  # run <id> <config> <num_envs> [extra args...]
  local id=$1 cfg=$2 envs=$3; shift 3
  for i in $(seq 1 12); do
    RESUME=""
    [ -e "runs/$id/A1MoveGround/0/model/checkpoint" ] && RESUME="--resume"
    timeout 7200 python starter/ppo_locotransformer.py \
      --config "$cfg" --seed 0 --log_dir runs --id "$id" \
      --num_epochs 611 --num_envs "$envs" $RESUME "$@" \
      >> "/tmp/train_$id.log" 2>&1 && { echo "DONE $id" >> /tmp/queue_r2.log; return; }
    echo "=== $id attempt $i crashed; retrying ===" >> "/tmp/train_$id.log"
    sleep 15
  done
  echo "FAILED $id" >> /tmp/queue_r2.log
}

run_state() {
  local id=$1 envs=$2; shift 2
  for i in $(seq 1 12); do
    RESUME=""
    [ -e "runs/$id/A1MoveGround/0/model/checkpoint" ] && RESUME="--resume"
    timeout 7200 python starter/ppo_state.py \
      --config config/rl/static/state-only-baseline.json \
      --seed 0 --log_dir runs --id "$id" \
      --num_epochs 611 --num_envs "$envs" $RESUME "$@" \
      >> "/tmp/train_$id.log" 2>&1 && { echo "DONE $id" >> /tmp/queue_r2.log; return; }
    echo "=== $id attempt $i crashed; retrying ===" >> "/tmp/train_$id.log"
    sleep 15
  done
  echo "FAILED $id" >> /tmp/queue_r2.log
}

run mmdr_heightfield_10M config/rl/static/frame_extract4_random_delay/thin-heightfield.json 512 --overwrite
run thin_goal_T16_r2 config/rl/static/locotransformer/thin-goal.json 1024 --overwrite
run thin_goal_T64 config/rl/static/locotransformer/thin-goal.json 256 --overwrite
run_state state_T16_r2 1024 --overwrite
run_state state_T64 256 --overwrite
run mount_10M config/rl/challenge/locotransformer/mountain.json 512 --overwrite
run_state state_T256 64 --overwrite
run thin_goal_T256 config/rl/static/locotransformer/thin-goal.json 64 --overwrite
echo QUEUE_R2B_DONE >> /tmp/queue_r2.log
