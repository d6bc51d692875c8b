#!/bin/bash
# Serial training queue: breadth runs across remaining terrain families.
cd /root/repo
set -x
python starter/ppo_locotransformer.py \
  --config config/rl/challenge/locotransformer/stairs.json \
  --seed 0 --log_dir runs --id stairs_10M \
  --num_epochs 611 --num_envs 1024 --overwrite \
  > /tmp/train_stairs.log 2>&1
python starter/ppo_locotransformer.py \
  --config config/rl/challenge/locotransformer/chair_desk.json \
  --seed 0 --log_dir runs --id chair_desk_10M \
  --num_epochs 611 --num_envs 1024 --overwrite \
  > /tmp/train_chair.log 2>&1
python starter/ppo_locotransformer.py \
  --config config/rl/static/frame_extract4_random_delay/thin-heightfield.json \
  --seed 0 --log_dir runs --id mmdr_heightfield_10M \
  --num_epochs 611 --num_envs 512 --overwrite \
  > /tmp/train_hf.log 2>&1
echo QUEUE_DONE
