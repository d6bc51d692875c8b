#!/bin/bash
# Serial training queue for the remaining BASELINE.json configs (one TPU chip).
cd /root/repo
set -x
python starter/ppo_locotransformer.py \
  --config config/rl/challenge/locotransformer/hill.json \
  --seed 0 --log_dir runs --id hill_10M \
  --num_epochs 611 --num_envs 1024 --overwrite \
  > /tmp/train_hill.log 2>&1
python starter/ppo_nature_cnn.py \
  --config config/rl/static/naive_baseline/thin-goal.json \
  --seed 0 --log_dir runs --id nature_naive_10M \
  --num_epochs 611 --num_envs 1024 --overwrite \
  > /tmp/train_nature_naive.log 2>&1
python starter/ppo_nature_cnn.py \
  --config config/rl/static/frame_extract4_fixed_delay/thin-goal.json \
  --seed 0 --log_dir runs --id nature_fixed_delay_10M \
  --num_epochs 611 --num_envs 1024 --overwrite \
  > /tmp/train_nature_fixed.log 2>&1
echo QUEUE_DONE
