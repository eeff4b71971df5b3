#!/bin/bash
# Round-5 TPU queue: pattern-channel payloads end-to-end.
#
# Order encodes priority (VERDICT r4 next #1-#3): if the round ends mid-
# queue, the highest-value artifacts are already committed by the driver.
#   0. trainability sanity (Dblp 2 rounds: PathNet must clear MLP)
#   1. heterophily protocols on the r5 payloads (10x1000) + MLP companions
#   2. comparison columns for the four recalibrated datasets (incl. the
#      never-run bgp + Electronics columns)
#   3. walk-length ablations (rise-to-peak shape on pattern payloads)
#   4. finish truncated r4 columns (squirrel/chameleon) + pubmed/film lift
#   5. bench
# All TPU work is serialized through this one script (concurrent TPU
# processes crash the worker — axon hazard notes).
set -u
cd /root/repo
source scripts/queue_runner.sh
export QLOG=results/tpu_queue_r5.log
R="python -m pathnet_tpu.run"

# --- 0: sanity (cheap; a failure here means the payload needs rework, but
# the queue continues — the protocol rows themselves are the evidence)
qrun 2400 $R -data Dblp -e 1000 -r 2 --resume
qrun 1200 $R -data Dblp -e 1000 -r 2 --model mlp --resume

# --- 1: protocols (reference configs; bf16 for the two largest — r4
# measured 25% faster at identical accuracy bands)
qrun 4000 $R -data Nba -e 1000 -r 10 -hid 256 --resume
qrun 1200 $R -data Nba -e 1000 -r 10 -hid 256 --model mlp --resume
qrun 6000 $R -data Dblp -e 1000 -r 10 --resume
qrun 1800 $R -data Dblp -e 1000 -r 10 --model mlp --resume
qrun 9000 $R -data bgp -e 1000 -r 10 --dtype bfloat16 --microbatch 8192 --resume
qrun 2400 $R -data bgp -e 1000 -r 10 --model mlp --resume

# --- 2: comparison columns (PathNet/mlp seeded from the protocol rows
# above; large tier at reduced rounds, disclosed in the artifact header)
qrun 7200 python scripts/comparison_table.py Nba 10 1000
qrun 7200 python scripts/comparison_table.py Dblp 3 1000
qrun 7200 python scripts/comparison_table.py bgp 3 1000

# Electronics last of the large tier: its calibration lands after the
# others (8669-dim probe cost); each queue item re-reads the registry
qrun 9000 $R -data Electronics -e 1000 -r 10 -hid 32 --dtype bfloat16 --microbatch 8192 --resume
qrun 2400 $R -data Electronics -e 1000 -r 10 --model mlp --resume
qrun 7200 python scripts/comparison_table.py Electronics 2 500

# --- 3: walk-length ablations on pattern payloads (reference shape:
# rise to the generative length, draw_figs/length.py:49-53)
qrun 4800 python scripts/ablation_length.py Dblp 5 1000
qrun 4800 python scripts/ablation_length.py Nba 5 1000

# --- 4: remaining comparison-matrix work (r4 crash remnants + full-
# protocol lifts)
qrun 7200 python scripts/comparison_table.py squirrel 10 500
qrun 7200 python scripts/comparison_table.py chameleon 10 500
qrun 10000 python scripts/comparison_table.py film 10 1000
qrun 14000 python scripts/comparison_table.py pubmed 10 1000

# --- 5: khop-at-scale probe (VERDICT #6) + bench + render
qrun 2400 python scripts/khop_scale_probe.py
qrun 3000 python bench.py
JAX_PLATFORMS=cpu qrun 1200 python scripts/render_comparison.py || true

qmanifest \
  results/comparison_Nba.json results/comparison_Dblp.json \
  results/comparison_bgp.json results/comparison_Electronics.json \
  results/ablation_length_Dblp.json results/ablation_length_Nba.json \
  results/comparison_squirrel.json results/comparison_chameleon.json
qlog "QUEUE DONE rc=$?"
