#!/bin/bash
# Round-5 queue, phase 8: post-bgp-column endgame — the cornell walk-length
# ablation on the r5 pattern payload (the resume-guard bug had blessed the
# r4 artifact), then remaining columns by value.
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  qlog "=== PHASE 8: waiting for pid $WAIT_PID ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi
qlog "=== PHASE 8 ==="
qrun 1800 python scripts/ablation_length.py cornell 10 1000
qrun 1200 $R -data cornell -e 1000 -r 10 --resume
qrun 600  $R -data cornell -e 1000 -r 10 --model mlp --resume
qrun 3600 python scripts/comparison_table.py Electronics 2 500
for d in texas wisconsin; do
  qrun 1200 $R -data $d -e 1000 -r 10 --resume
  qrun 600  $R -data $d -e 1000 -r 10 --model mlp --resume
done
qrun 1800 python scripts/ablation_length.py Nba 10 1000
qrun 3600 python scripts/comparison_table.py Nba 10 1000
qrun 3600 python scripts/comparison_table.py cornell 10 1000
qrun 3600 python scripts/comparison_table.py Dblp 2 500
qrun 1200 python scripts/render_comparison.py || true
qlog "PHASE8 DONE"
