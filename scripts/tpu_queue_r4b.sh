#!/bin/bash
# Round-4 TPU queue, part B (rebalanced continuation after phase A of
# tpu_queue_r4.sh): quirk companions, cornell TPU walk-length ablation,
# large-dataset protocol rows (PathNet + MLP) in priority order with
# 4-round checkpoints before extending to 10, per-dataset comparison
# columns (PathNet/MLP seeded from the protocol rows; comparisons at 3
# rounds x 1000 epochs for the large tier, logged as reduced), the
# bgp-scale walk-length ablation, and bench.
set -x
cd /root/repo
R="python -m pathnet_tpu.run"
log() { echo "--- $* ($(date +%H:%M:%S))" >> results/tpu_queue_r4.log; }
run() { log "$*"; timeout 14000 "$@" 2>&1 | grep -vE "WARNING:2026|not all JAX" | tail -4 >> results/tpu_queue_r4.log; }

# quirk companions (reference hetero index quirks)
run $R -data cornell -e 1000 -r 10 --quirk-compat --resume
run $R -data Nba -e 1000 -r 10 -hid 256 --quirk-compat --resume

# cornell walk-length ablation on TPU (r3 artifact was CPU-only)
run python scripts/ablation_length.py cornell 10 1000

# Nba model-gap sweep (VERDICT #3): PathNet trails GCN by ~9 on the dense
# stand-in while its own oracle is 75 — test aggregation and sampling
# breadth as the levers (deg~107: 40 walks sample a sliver of the 2-hop
# neighborhood that GCN aggregates exactly)
run $R -data Nba -e 1000 -r 5 -hid 256 --agg mean --resume
run $R -data Nba -e 1000 -r 5 -hid 256 --agg sum --resume
run $R -data Nba -e 1000 -r 5 -hid 256 -nw 160 --resume
run $R -data Nba -e 1000 -r 5 -hid 256 -nw 160 --agg mean --resume
run $R -data Nba -e 1000 -r 5 -hid 256 -dr 0.3 --resume

# path-pattern synthetic (gen_cora_syn semantics) at the scale where the
# plug-in ceiling shows the peak-at-3 (CPU run demonstrated wl2 62.6 ->
# wl3 68.7 before timing out; TPU reruns all lengths in minutes)
run python scripts/ablation_pattern.py

# distance-selective signal experiment on the real Nba structure: the
# payload family where path/distance machinery is provably required
run python scripts/distance_selective.py 5 1000

# PathNet-Mean ablation rows on the attention-sensitive datasets (the
# paper's own PathNet-Mean table row)
run $R -data cora -e 1000 -r 10 --agg mean --resume
run $R -data cora -e 1000 -r 5 -nw 160 --agg mean --resume
run $R -data cornell -e 1000 -r 10 --agg mean --resume
run $R -data citeseer -e 1000 -r 10 --agg mean --resume

# pubmed: resume to 10 rounds + MLP + comparison
run $R -data pubmed -e 1000 -r 10 --microbatch 8192 --resume
run $R -data pubmed -e 1000 -r 10 --model mlp --resume
run python scripts/comparison_table.py pubmed 3 1000

# film / squirrel / Dblp protocol+MLP rows were produced at 10x1000 on the
# current payloads by the surviving r3 extension queue (fingerprints
# verified) — only the comparison columns remain
run python scripts/comparison_table.py film 3 1000
run python scripts/comparison_table.py squirrel 3 1000
run python scripts/comparison_table.py Dblp 3 1000

# Electronics: 4-round checkpoint first, then extend to 10
run $R -data Electronics -e 1000 -r 4 -hid 32 --microbatch 4096 --resume
run $R -data Electronics -e 1000 -r 10 -hid 32 --microbatch 4096 --resume
run $R -data Electronics -e 1000 -r 10 -hid 32 --model mlp --resume
run python scripts/comparison_table.py Electronics 3 1000

# bgp: 4-round checkpoint first, then extend to 10
run $R -data bgp -e 1000 -r 4 --microbatch 8192 --resume
run $R -data bgp -e 1000 -r 10 --microbatch 8192 --resume
run $R -data bgp -e 1000 -r 10 --model mlp --resume
run python scripts/comparison_table.py bgp 3 1000

# bgp-scale walk-length ablation (wl=5 exercises the k-hop distance
# backend on device) — reduced protocol, logged as such
run python scripts/ablation_length.py bgp 2 500

log "bench"
timeout 3000 python bench.py >> results/tpu_queue_r4.log 2>&1
log "QUEUE-B DONE"
