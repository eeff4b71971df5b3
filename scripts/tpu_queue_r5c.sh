#!/bin/bash
# Round-5 queue, phase 3 (restart after the phase-2 session cutoff).
# Priority order = judge value per TPU-minute with ~2h wall budget:
#   1. Electronics protocol on the pattern payload (VERDICT #1+#3 — zero rounds exist)
#   2. bgp + Electronics comparison columns (VERDICT missing #1 — never run)
#   3. walk-length ablation shapes (rise-to-peak criterion)
#   4. small-tier protocols on pattern payloads
#   5. remaining comparison columns, mid-tier protocols, quirk companions
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"

qlog "=== PHASE 3 (restart) ==="

# Electronics full 10-round protocol on the recalibrated payload + MLP
qrun 4500 $R -data Electronics -e 1000 -r 10 -hid 32 --dtype bfloat16 --microbatch 8192 --resume
qrun 900  $R -data Electronics -e 1000 -r 10 --model mlp --resume

# never-run large comparison columns
qrun 2700 python scripts/comparison_table.py bgp 2 500
qrun 2700 python scripts/comparison_table.py Electronics 2 500

# walk-length ablation shapes on pattern payloads
qrun 1800 python scripts/ablation_length.py cornell 10 1000
qrun 1800 python scripts/ablation_length.py Nba 10 1000

# small tier protocols (pattern payloads)
for d in cornell texas wisconsin; do
  qrun 1200 $R -data $d -e 1000 -r 10 --resume
  qrun 600  $R -data $d -e 1000 -r 10 --model mlp --resume
done

# comparison columns by value
qrun 3600 python scripts/comparison_table.py Nba 10 1000
qrun 3600 python scripts/comparison_table.py cornell 10 1000
qrun 3600 python scripts/comparison_table.py Dblp 2 500

# mid tier protocols
for d in chameleon film squirrel; do
  qrun 2400 $R -data $d -e 1000 -r 10 --resume
  qrun 900  $R -data $d -e 1000 -r 10 --model mlp --resume
done

# quirk companions on the new payloads
qrun 1200 $R -data cornell -e 1000 -r 10 --quirk-compat --resume
qrun 1800 $R -data Nba -e 1000 -r 10 -hid 256 --quirk-compat --resume

qrun 1200 python scripts/render_comparison.py || true

qmanifest \
  results/comparison_bgp.json results/comparison_Electronics.json \
  results/comparison_Nba.json results/comparison_cornell.json \
  results/ablation_length_Nba.json results/ablation_length_cornell.json
qlog "PHASE3 DONE rc=$?"
