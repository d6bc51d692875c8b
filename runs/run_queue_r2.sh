#!/bin/bash
# Round-2 serial training queue.
#   1. hill rerun on the re-calibrated terrain (r2 fix: slopes were 27/50
#      deg mean/p90 — unwalkable; now ~7/13 deg like the reference's
#      0.2-z-scale ground0.txt),
#   2. mount 10M (BASELINE config-5 family breadth),
#   3. rollout-horizon ablation (VERDICT r1 item 5): same 16384
#      frames/epoch as {1024x16, 256x64, 64x256} on thin-goal and
#      state-baseline.  thin_goal_T16_r2 doubles as the eval-collapse
#      diagnosis rerun (new per-epoch telemetry: obs-norm drift,
#      terminal rate, episode length),
#   4. completion of mmdr_heightfield_10M (r1 snapshot caught it mid-run).
# Each run retries: the axon tunnel intermittently faults long compiles
# with UNAVAILABLE; --resume continues from the save_interval checkpoint.
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

run_state() {  # state-only starter variant
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

run hill_10M_r2 config/rl/challenge/locotransformer/hill.json 512 --overwrite
run mount_10M config/rl/challenge/locotransformer/mountain.json 512 --overwrite
run thin_goal_T16_r2 config/rl/static/locotransformer/thin-goal.json 1024 --overwrite
run thin_goal_T64 config/rl/static/locotransformer/thin-goal.json 256 --overwrite
run_state state_T16_r2 1024 --overwrite
run_state state_T64 256 --overwrite
run_state state_T256 64 --overwrite
run thin_goal_T256 config/rl/static/locotransformer/thin-goal.json 64 --overwrite
run mmdr_heightfield_10M config/rl/static/frame_extract4_random_delay/thin-heightfield.json 512 --overwrite
echo QUEUE_R2_DONE >> /tmp/queue_r2.log
