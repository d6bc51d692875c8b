#!/bin/bash
# Round-2 queue, part C. Replaces the tail of run_queue_r2b.sh after
# mmdr_heightfield_10M FAILED 12x with deterministic HBM OOM at 512 envs
# (the vmapped reset render of the boxes+heightfield terrain; probed
# boundary: 384 envs OK, 448 OOM).  Reordered for the remaining wall
# clock: the VERDICT-mandated heightfield completion reruns at 256 envs
# (T=64 per 16384-frame epoch), then the horizon-ablation points, then
# breadth extras.  Waits for the in-flight thin_goal_T16_r2 first.
cd /root/repo

# wait for the run the killed r2b queue left in flight (pid recorded at
# launch time by the session that started this queue)
INFLIGHT=$(cat /tmp/thin_goal_T16_r2.pid 2>/dev/null || echo 0)
while [ "$INFLIGHT" != 0 ] && [ -e "/proc/$INFLIGHT" ]; do
  sleep 60
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

run mmdr_heightfield_10M starter/ppo_locotransformer.py \
    config/rl/static/frame_extract4_random_delay/thin-heightfield.json 256 --overwrite
run state_T16_r2 starter/ppo_state.py \
    config/rl/static/state-only-baseline.json 1024 --overwrite
run state_T64 starter/ppo_state.py \
    config/rl/static/state-only-baseline.json 256 --overwrite
run thin_goal_T64 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 256 --overwrite
run mount_10M starter/ppo_locotransformer.py \
    config/rl/challenge/locotransformer/mountain.json 512 --overwrite
run state_T256 starter/ppo_state.py \
    config/rl/static/state-only-baseline.json 64 --overwrite
run thin_goal_T256 starter/ppo_locotransformer.py \
    config/rl/static/locotransformer/thin-goal.json 64 --overwrite
echo QUEUE_R2C_DONE >> /tmp/queue_r2.log
