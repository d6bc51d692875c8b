#!/bin/bash
# Serial training queue (one TPU chip): hill rerun (post camera-OOM fix)
# and a second thin-goal seed for seed-variance evidence.
cd /root/repo
set -x
python starter/ppo_locotransformer.py \
  --config config/rl/challenge/locotransformer/hill.json \
  --seed 0 --log_dir runs --id hill_10M \
  --num_epochs 611 --num_envs 1024 --overwrite \
  > /tmp/train_hill.log 2>&1
python starter/ppo_locotransformer.py \
  --config config/rl/static/locotransformer/thin-goal.json \
  --seed 1 --log_dir runs --id thin_goal_10M \
  --num_epochs 611 --num_envs 1024 --overwrite \
  > /tmp/train_thin_seed1.log 2>&1
echo QUEUE_DONE
