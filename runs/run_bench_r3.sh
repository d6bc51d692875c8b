#!/bin/bash
# Round-3 bench battery, run FIRST on the idle chip (before the training
# queue takes it):
#   1. f32 bench (the headline capture) -> runs/bench_r3_f32.json
#   2. bf16-collection A/B (VERDICT r2 #6) -> runs/bench_r3_bf16.json
#   3. attention micro-bench incl. the update-path VJP ceiling
#      (VERDICT r2 #9) -> runs/attention_bench.json
cd /root/repo || exit 1

wait_tunnel() {
  until timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert float(jnp.arange(8.0).sum()) == 28.0
EOF
  do sleep 120; done
}

wait_tunnel
echo "=== f32 bench $(date -u +%H:%M) ===" >> /tmp/bench_r3.log
V4L_BENCH_BF16=0 timeout 3600 python bench.py 2>>/tmp/bench_r3.log \
  | tail -1 > runs/bench_r3_f32.json

wait_tunnel
echo "=== bf16 bench $(date -u +%H:%M) ===" >> /tmp/bench_r3.log
V4L_BENCH_BF16=1 timeout 3600 python bench.py 2>>/tmp/bench_r3.log \
  | tail -1 > runs/bench_r3_bf16.json

wait_tunnel
echo "=== attention bench $(date -u +%H:%M) ===" >> /tmp/bench_r3.log
timeout 3600 python tools/bench_attention.py >> /tmp/bench_r3.log 2>&1

echo BENCH_R3_DONE >> /tmp/bench_r3.log
