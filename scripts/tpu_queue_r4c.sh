#!/bin/bash
# Round-4 TPU queue, part C (final tail, time-boxed): pubmed MLP +
# comparison, bgp 10-round protocol in bfloat16 (halves epoch time vs
# f32 — row labeled via the recorded dtype; f32 vs bf16 logits validated
# close in tests/test_model_dtypes.py), Electronics fresh 4-round row,
# reduced-round comparison columns for the six large datasets, and the
# bgp walk-length ablation (wl=5 exercises the k-hop distance backend).
set -x
cd /root/repo
R="python -m pathnet_tpu.run"
log() { echo "--- $* ($(date +%H:%M:%S))" >> results/tpu_queue_r4.log; }
run() { log "$*"; timeout 14000 "$@" 2>&1 | grep -vE "WARNING:2026|not all JAX" | tail -4 >> results/tpu_queue_r4.log; }

run $R -data pubmed -e 1000 -r 10 --microbatch 8192 --resume
run $R -data pubmed -e 1000 -r 10 --model mlp --resume

run $R -data bgp -e 1000 -r 4 --microbatch 8192 --dtype bfloat16 --resume
run $R -data bgp -e 1000 -r 10 --microbatch 8192 --dtype bfloat16 --resume
run $R -data bgp -e 1000 -r 10 --model mlp --resume

run $R -data Electronics -e 1000 -r 4 -hid 32 --microbatch 4096 --resume
run $R -data Electronics -e 1000 -r 4 -hid 32 --model mlp --resume

run python scripts/comparison_table.py pubmed 3 500
run python scripts/comparison_table.py film 3 500
run python scripts/comparison_table.py squirrel 3 500
run python scripts/comparison_table.py Dblp 3 500
run python scripts/comparison_table.py Electronics 2 500
run python scripts/comparison_table.py bgp 2 500

run python scripts/ablation_length.py bgp 2 500

run $R -data Electronics -e 1000 -r 10 -hid 32 --microbatch 4096 --resume

log "QUEUE-C DONE"
