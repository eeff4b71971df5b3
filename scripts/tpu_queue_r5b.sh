#!/bin/bash
# Round-5 queue, phase 2: remaining protocols (recalibrated payloads),
# ablation shapes, then comparison columns by value until the round ends.
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"

qlog "=== PHASE 2 ==="

# Nba on the final payload (smooth-3 bits, global blend, aligned measure)
qrun 2400 $R -data Nba -e 1000 -r 10 -hid 256 --resume
qrun 1200 $R -data Nba -e 1000 -r 10 -hid 256 --model mlp --resume

# Electronics full 10-round protocol (VERDICT #3) + MLP
qrun 10000 $R -data Electronics -e 1000 -r 10 -hid 32 --dtype bfloat16 --microbatch 8192 --resume
qrun 2400 $R -data Electronics -e 1000 -r 10 --model mlp --resume

# small tier (pattern payloads)
for d in cornell texas wisconsin; do
  qrun 1800 $R -data $d -e 1000 -r 10 --resume
  qrun 900 $R -data $d -e 1000 -r 10 --model mlp --resume
done

# walk-length ablation shape on two pattern datasets (cheap tier)
qrun 3600 python scripts/ablation_length.py Nba 10 1000
qrun 3600 python scripts/ablation_length.py cornell 10 1000

# comparison columns by value: the two never-run large columns first
qrun 7200 python scripts/comparison_table.py bgp 2 500
qrun 7200 python scripts/comparison_table.py Electronics 2 500
qrun 5400 python scripts/comparison_table.py Nba 10 1000
qrun 5400 python scripts/comparison_table.py cornell 10 1000
qrun 7200 python scripts/comparison_table.py Dblp 2 500

# mid tier protocols
for d in chameleon film squirrel; do
  qrun 4800 $R -data $d -e 1000 -r 10 --resume
  qrun 1800 $R -data $d -e 1000 -r 10 --model mlp --resume
done

# quirk companions on the new payloads
qrun 2400 $R -data cornell -e 1000 -r 10 --quirk-compat --resume
qrun 2400 $R -data Nba -e 1000 -r 10 -hid 256 --quirk-compat --resume

qrun 3000 python bench.py
qrun 1200 python scripts/render_comparison.py || true

qmanifest \
  results/comparison_bgp.json results/comparison_Electronics.json \
  results/comparison_Nba.json results/comparison_cornell.json \
  results/ablation_length_Nba.json results/ablation_length_cornell.json
qlog "PHASE2 DONE rc=$?"
