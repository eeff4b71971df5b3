#!/bin/bash
# Round-5 TPU queue (relaunch after blend-v2 recalibration): pattern-channel
# payloads end-to-end.  Order = priority; each item is resumable and
# crash-retried once (scripts/queue_runner.sh); all TPU work serialized.
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"

qlog "=== RELAUNCH (blend v2) ==="

# --- 1: heterophily protocols on the r5 payloads + MLP companions
qrun 6000 $R -data Dblp -e 1000 -r 10 --resume
qrun 1800 $R -data Dblp -e 1000 -r 10 --model mlp --resume
qrun 4000 $R -data Nba -e 1000 -r 10 -hid 256 --resume
qrun 1200 $R -data Nba -e 1000 -r 10 -hid 256 --model mlp --resume
qrun 9000 $R -data bgp -e 1000 -r 10 --dtype bfloat16 --microbatch 8192 --resume
qrun 2400 $R -data bgp -e 1000 -r 10 --model mlp --resume

# --- 2: comparison columns for the recalibrated large tier (PathNet/mlp
# seeded from the protocol rows; reduced rounds disclosed in the header)
qrun 7200 python scripts/comparison_table.py Nba 10 1000
qrun 7200 python scripts/comparison_table.py Dblp 3 1000
qrun 7200 python scripts/comparison_table.py bgp 3 1000

# --- 3: Electronics (its calibration lands later; items re-read the registry)
qrun 9000 $R -data Electronics -e 1000 -r 10 -hid 32 --dtype bfloat16 --microbatch 8192 --resume
qrun 2400 $R -data Electronics -e 1000 -r 10 --model mlp --resume
qrun 7200 python scripts/comparison_table.py Electronics 2 500

# --- 4: walk-length ablations (reference shape: rise to the generative
# length — the channel spans 3 steps, so wl=4 sees it whole)
qrun 4800 python scripts/ablation_length.py Dblp 5 1000
qrun 4800 python scripts/ablation_length.py Nba 5 1000

# --- 5: remaining heterophily family on v2 payloads (protocols + MLP)
for d in cornell texas wisconsin; do
  qrun 1800 $R -data $d -e 1000 -r 10 --resume
  qrun 900 $R -data $d -e 1000 -r 10 --model mlp --resume
done
for d in chameleon film squirrel; do
  qrun 4800 $R -data $d -e 1000 -r 10 --resume
  qrun 1800 $R -data $d -e 1000 -r 10 --model mlp --resume
done
qrun 2400 $R -data cornell -e 1000 -r 10 --quirk-compat --resume
qrun 2400 $R -data Nba -e 1000 -r 10 -hid 256 --quirk-compat --resume

# --- 6: comparison columns for the recalibrated small/mid tier
qrun 3600 python scripts/comparison_table.py cornell 10 1000
qrun 3600 python scripts/comparison_table.py texas 10 1000
qrun 3600 python scripts/comparison_table.py wisconsin 10 1000
qrun 7200 python scripts/comparison_table.py chameleon 10 500
qrun 7200 python scripts/comparison_table.py squirrel 10 500
qrun 10000 python scripts/comparison_table.py film 10 1000

# --- 7: pubmed full-protocol lift (payload unchanged since r4)
qrun 14000 python scripts/comparison_table.py pubmed 10 1000

# --- 8: bench + render
qrun 3000 python bench.py
qrun 1200 python scripts/render_comparison.py || true

qmanifest \
  results/comparison_Nba.json results/comparison_Dblp.json \
  results/comparison_bgp.json results/comparison_Electronics.json \
  results/ablation_length_Dblp.json results/ablation_length_Nba.json \
  results/comparison_cornell.json results/comparison_chameleon.json \
  results/comparison_squirrel.json
qlog "QUEUE DONE rc=$?"
