#!/bin/bash
# Round-5 queue, phase 7: phase-6 tail after the Electronics protocol
# completed (the two spare bounded-hang invocations are dropped; ordering
# otherwise unchanged).
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"

qlog "=== PHASE 7 ==="

qrun 900  $R -data Electronics -e 1000 -r 10 --model mlp --resume

qrun 1200 $R -data Nba -e 1000 -r 10 -hid 256 --resume
qrun 600  $R -data Nba -e 1000 -r 10 -hid 256 --model mlp --resume

qrun 1800 python scripts/ablation_length.py cornell 10 1000

qrun 2700 python scripts/comparison_table.py bgp 2 500
qrun 3600 python scripts/comparison_table.py Electronics 2 500

for d in cornell texas wisconsin; do
  qrun 1200 $R -data $d -e 1000 -r 10 --resume
  qrun 600  $R -data $d -e 1000 -r 10 --model mlp --resume
done

qrun 1800 python scripts/ablation_length.py Nba 10 1000
qrun 3600 python scripts/comparison_table.py Nba 10 1000
qrun 3600 python scripts/comparison_table.py cornell 10 1000
qrun 3600 python scripts/comparison_table.py Dblp 2 500
for d in chameleon film squirrel; do
  qrun 2400 $R -data $d -e 1000 -r 10 --resume
  qrun 900  $R -data $d -e 1000 -r 10 --model mlp --resume
done
qrun 1200 $R -data cornell -e 1000 -r 10 --quirk-compat --resume
qrun 5400 python scripts/comparison_table.py pubmed 10 1000
qrun 5400 python scripts/comparison_table.py film 10 1000

qrun 1200 python scripts/render_comparison.py || true
qmanifest \
  results/comparison_bgp.json results/comparison_Electronics.json \
  results/ablation_length_cornell.json
qlog "PHASE7 DONE rc=$?"
