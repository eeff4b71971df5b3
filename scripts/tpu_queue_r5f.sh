#!/bin/bash
# Round-5 queue, phase 6: bounded-hang restructure.
#
# Long bf16 protocol runs on the axon tunnel stall intermittently after a
# few rounds (observed three times this round: bgp phase-1 attempt 1 froze
# after 2 rounds; Electronics phase-2 froze after 2; Electronics phase-5
# froze after 6 with utime flat).  Per-round checkpoints make re-invocation
# cheap, so the mitigation is MANY SHORT qruns of the same resumable
# command — a hang now costs <=~20 min, not the item's whole timeout.
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"
EL="$R -data Electronics -e 1000 -r 10 -hid 32 --dtype bfloat16 --microbatch 8192 --resume"

qlog "=== PHASE 6 (bounded-hang) ==="

# Electronics: ~4 rounds remain; each invocation = setup (~4 min) + up to
# ~3 rounds (306 s each) inside a 1300 s window; extras no-op via resume.
qrun 1300 $EL
qrun 1300 $EL
qrun 1300 $EL
qrun 900  $R -data Electronics -e 1000 -r 10 --model mlp --resume

# Nba on the decode-probe payload (flagship)
qrun 1200 $R -data Nba -e 1000 -r 10 -hid 256 --resume
qrun 600  $R -data Nba -e 1000 -r 10 -hid 256 --model mlp --resume

# walk-length ablation shape (rise-to-peak criterion)
qrun 1800 python scripts/ablation_length.py cornell 10 1000

# never-run comparison columns
qrun 2700 python scripts/comparison_table.py bgp 2 500
qrun 3600 python scripts/comparison_table.py Electronics 2 500

# small tier protocols on pattern payloads
for d in cornell texas wisconsin; do
  qrun 1200 $R -data $d -e 1000 -r 10 --resume
  qrun 600  $R -data $d -e 1000 -r 10 --model mlp --resume
done

# tier 3 — by value until the round ends
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
qlog "PHASE6 DONE rc=$?"
