#!/bin/bash
# Round-5 queue, phase 4: runs after phase 3 exits (wait-for-pid wrapper).
#   1. Nba protocol on the decode-probe-selected payload (frac .60 smooth 2)
#   2. pubmed/film comparison columns to the full 10-round protocol
#      (VERDICT r4 weak #7)
#   3. remaining mid-tier comparison columns on the r5 payloads
#   4. re-render COMPARISON.md / RESULTS.md
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"

qlog "=== PHASE 4 ==="

qrun 1200 $R -data Nba -e 1000 -r 10 -hid 256 --resume
qrun 600  $R -data Nba -e 1000 -r 10 -hid 256 --model mlp --resume
qrun 2400 python scripts/ablation_length.py Nba 10 1000

qrun 5400 python scripts/comparison_table.py pubmed 10 1000
qrun 5400 python scripts/comparison_table.py film 10 1000
qrun 4800 python scripts/comparison_table.py chameleon 10 1000
qrun 4800 python scripts/comparison_table.py squirrel 10 1000
qrun 3600 python scripts/comparison_table.py texas 10 1000
qrun 3600 python scripts/comparison_table.py wisconsin 10 1000

qrun 1200 python scripts/render_comparison.py || true
qrun 600  python scripts/summarize_results.py || true
qlog "PHASE4 DONE"
