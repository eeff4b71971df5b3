#!/bin/bash
# Round-5 queue, phase 5: consolidated priority order for the remaining
# wall budget (phases 3/4 were merged after re-estimating item costs; the
# phase-3 driver was stopped between items, its in-flight Electronics
# protocol left to finish — this queue first waits for that PID).
#
#   tier 1 (flagship criteria): Electronics + Nba protocols on the r5
#           pattern payloads; cornell walk-length ablation (rise-to-peak)
#   tier 2 (comparison matrix): bgp + Electronics columns (never run),
#           small-tier protocols
#   tier 3: Nba ablation, remaining columns, mid-tier protocols
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  qlog "=== PHASE 5: waiting for pid $WAIT_PID ==="
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi
qlog "=== PHASE 5 ==="

# tier 1
qrun 2400 $R -data Electronics -e 1000 -r 10 -hid 32 --dtype bfloat16 --microbatch 8192 --resume
qrun 900  $R -data Electronics -e 1000 -r 10 --model mlp --resume
qrun 1200 $R -data Nba -e 1000 -r 10 -hid 256 --resume
qrun 600  $R -data Nba -e 1000 -r 10 -hid 256 --model mlp --resume
qrun 1800 python scripts/ablation_length.py cornell 10 1000

# tier 2
qrun 2700 python scripts/comparison_table.py bgp 2 500
for d in cornell texas wisconsin; do
  qrun 1200 $R -data $d -e 1000 -r 10 --resume
  qrun 600  $R -data $d -e 1000 -r 10 --model mlp --resume
done
qrun 3600 python scripts/comparison_table.py Electronics 2 500

# tier 3
qrun 1800 python scripts/ablation_length.py Nba 10 1000
qrun 3600 python scripts/comparison_table.py Nba 10 1000
qrun 3600 python scripts/comparison_table.py cornell 10 1000
qrun 3600 python scripts/comparison_table.py Dblp 2 500
for d in chameleon film squirrel; do
  qrun 2400 $R -data $d -e 1000 -r 10 --resume
  qrun 900  $R -data $d -e 1000 -r 10 --model mlp --resume
done
qrun 1200 $R -data cornell -e 1000 -r 10 --quirk-compat --resume
qrun 1800 $R -data Nba -e 1000 -r 10 -hid 256 --quirk-compat --resume
qrun 5400 python scripts/comparison_table.py pubmed 10 1000
qrun 5400 python scripts/comparison_table.py film 10 1000

qrun 1200 python scripts/render_comparison.py || true
qmanifest \
  results/comparison_bgp.json results/comparison_Electronics.json \
  results/comparison_Nba.json results/comparison_cornell.json \
  results/ablation_length_Nba.json results/ablation_length_cornell.json
qlog "PHASE5 DONE rc=$?"
