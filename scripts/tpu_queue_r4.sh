#!/bin/bash
# Round-4 TPU queue: refreshed protocol rows on the r4-recalibrated payloads
# (PathNet + MLP companions everywhere), the full 18-model comparison table
# per dataset (PathNet/MLP seeded from the protocol rows), quirk companions,
# the TPU walk-length ablation (incl. wl=5 k-hop at bgp scale), and bench.
# Every step is resumable: run.py --resume keys checkpoints by payload
# fingerprint + config, comparison_table resumes per model keyed on
# (platform, rounds, epochs), ablation_length resumes per length.
set -x
cd /root/repo
R="python -m pathnet_tpu.run"
log() { echo "--- $* ($(date +%H:%M:%S))" >> results/tpu_queue_r4.log; }

run() { log "$*"; timeout 14000 "$@" 2>&1 | grep -vE "WARNING:2026|not all JAX" | tail -4 >> results/tpu_queue_r4.log; }

# Phase A: small/medium datasets — protocol (pathnet+mlp) then comparison
for spec in "cornell 64" "texas 64" "wisconsin 64" "Nba 256" "cora 64" \
            "citeseer 64" "chameleon 64"; do
  set -- $spec
  run $R -data $1 -e 1000 -r 10 -hid $2 --resume
  run $R -data $1 -e 1000 -r 10 -hid 64 --model mlp --resume
  run python scripts/comparison_table.py $1 10 1000
done

# quirk companions (reference hetero index quirks)
run $R -data cornell -e 1000 -r 10 --quirk-compat --resume
run $R -data Nba -e 1000 -r 10 -hid 256 --quirk-compat --resume

# Phase B: cornell walk-length ablation on TPU (r3 artifact was CPU-only)
run python scripts/ablation_length.py cornell 10 1000

# Phase C: large datasets — protocol rows first (the scarce artifacts)
run $R -data film -e 1000 -r 10 --resume
run $R -data film -e 1000 -r 10 --model mlp --resume
run $R -data squirrel -e 1000 -r 10 --resume
run $R -data squirrel -e 1000 -r 10 --model mlp --resume
run $R -data Dblp -e 1000 -r 10 --microbatch 8192 --resume
run $R -data Dblp -e 1000 -r 10 --model mlp --resume
run $R -data pubmed -e 1000 -r 10 --microbatch 8192 --resume
run $R -data pubmed -e 1000 -r 10 --model mlp --resume
run $R -data Electronics -e 1000 -r 10 -hid 32 --microbatch 4096 --resume
run $R -data Electronics -e 1000 -r 10 -hid 32 --model mlp --resume
run $R -data bgp -e 1000 -r 10 --microbatch 8192 --resume
run $R -data bgp -e 1000 -r 10 --model mlp --resume

# Phase D: comparisons for the large datasets (PathNet/MLP rows seed from
# the protocol runs above; the 16 remaining baselines are sparse-op cheap)
for d in film squirrel Dblp pubmed Electronics bgp; do
  run python scripts/comparison_table.py $d 10 1000
done

# Phase E: bgp-scale walk-length ablation (wl=5 exercises the k-hop
# distance backend on device) — reduced protocol, logged as such
run python scripts/ablation_length.py bgp 2 500

# Phase F: refresh bench numbers (post bf16-gather change)
log "bench"
timeout 3000 python bench.py >> results/tpu_queue_r4.log 2>&1

log "QUEUE DONE"
