#!/bin/bash
# The axon TPU tunnel intermittently faults long-compile programs with
# UNAVAILABLE; train with automatic retry (+--resume once checkpoints
# exist at save_interval epochs).
cd /root/repo
for i in $(seq 1 20); do
  RESUME=""
  [ -e runs/hill_10M/A1MoveGround/0/model/checkpoint ] && RESUME="--resume"
  python starter/ppo_locotransformer.py \
    --config config/rl/challenge/locotransformer/hill.json \
    --seed 0 --log_dir runs --id hill_10M \
    --num_epochs 611 --num_envs 512 $RESUME \
    >> /tmp/train_hill.log 2>&1 && break
  echo "=== attempt $i crashed; retrying ===" >> /tmp/train_hill.log
  sleep 20
done
echo HILL_DONE >> /tmp/train_hill.log
