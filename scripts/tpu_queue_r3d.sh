#!/bin/bash
# Round-3 extension queue: the comparison table (performance.jpg analog) on
# TPU, small datasets first; then fresh PathNet+MLP pairs for the GeomGCN-
# family stand-ins; then remaining bgp/pubmed protocol rounds via resume.
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
echo "=== tpu_queue_r3d start $(date) ==="
run() { echo "--- $* ($(date +%H:%M:%S))"; timeout 7200 "$@"; }

for d in cornell texas wisconsin Nba chameleon cora citeseer; do
  run python scripts/comparison_table.py "$d" 10 500
done

for d in chameleon film squirrel Dblp; do
  run python -m pathnet_tpu.run -data "$d" -e 1000 -r 10 -hid 64
  run python -m pathnet_tpu.run -data "$d" --model mlp -e 1000 -r 10 -hid 64
done

# finish the big-protocol rows (resume: completed rounds load instantly)
run python -m pathnet_tpu.run -data pubmed -e 1000 -r 10 -hid 64 --microbatch 8192 --resume
run python -m pathnet_tpu.run -data bgp -e 1000 -r 10 -hid 64 \
    --microbatch 8192 --scan-chunk 20 --remat on --resume

# walk-length ablation on TPU
for d in cornell texas; do
  run python scripts/ablation_length.py "$d" 10 1000
done

run python bench.py
echo "=== tpu_queue_r3d done $(date) ==="
