#!/bin/bash
# Round-5 end-of-queue watcher: the moment the training queue signals
# QUEUE_R5_DONE (or its process group is gone past the deadline), capture
# ONE clean idle-chip bench so the round has a fresh uncontended
# reference even if the driver's own bench window hits trouble
# (VERDICT r4 #1: r4 ended with no captured perf number at all).
cd /root/repo || exit 1
QLOG=/tmp/queue_r5.log
OUT=runs/bench_idle_r5.json
DEADLINE=${WATCH_DEADLINE:-$(( $(date +%s) + 26100 ))}

while true; do
  grep -q QUEUE_R5_DONE "$QLOG" 2>/dev/null && break
  [ "$(date +%s)" -ge "$DEADLINE" ] && break
  sleep 120
done
# settle: let any straggler process group drain its last epoch
sleep 60
echo "bench watcher firing $(date -u +%H:%M)" >> "$QLOG"
V4L_BENCH_DEADLINE_S=1100 timeout 1200 python bench.py > "$OUT.tmp" 2>/tmp/bench_r5_stderr.log
if [ -s "$OUT.tmp" ] && tail -1 "$OUT.tmp" | python -c "import sys,json; json.loads(sys.stdin.readlines()[-1])" 2>/dev/null; then
  tail -1 "$OUT.tmp" > "$OUT"
  rm -f "$OUT.tmp"
  echo "bench watcher captured: $(cat "$OUT")" >> "$QLOG"
else
  echo "bench watcher FAILED (see /tmp/bench_r5_stderr.log)" >> "$QLOG"
fi
