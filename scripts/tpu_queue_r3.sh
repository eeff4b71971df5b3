#!/bin/bash
# Round-3 serialized TPU workload.  One python process per item — the TPU
# is single-process, and per-item processes pick up registry edits and
# survive individual failures.  Order: headline-first, cheap-first within
# tiers, so an early kill still leaves a complete artifact trail.
cd /root/repo
# prepend, never clobber: the ambient PYTHONPATH carries the axon
# TPU plugin site (/root/.axon_site)
export PYTHONPATH=/root/repo:${PYTHONPATH}
R=${ROUNDS:-10}
E=${EPOCHS:-1000}
echo "=== tpu_queue_r3 start $(date) rounds=$R epochs=$E ==="

run() { echo "--- $* ($(date +%H:%M:%S))"; timeout 14400 "$@"; }

# tier 0: bgp first — its payload calibration is final before the small
# datasets' is, and it is the longest single run
run python scripts/run_protocol_all.py bgp --epochs "$E" --rounds "$R"
# retry once with remat forced on if the first attempt crashed the worker
[ -f results/result_for_bgp.txt ] ||   run python scripts/run_protocol_all.py bgp --epochs "$E" --rounds "$R" --remat on

# tier 1: small headline datasets + quirk-compat pairs (minutes each)
for d in cornell Nba texas wisconsin; do
  hid=64; [ "$d" = Nba ] && hid=256
  run python -m pathnet_tpu.run -data "$d" -e "$E" -r "$R" -hid "$hid"
  run python -m pathnet_tpu.run -data "$d" --model mlp -e "$E" -r "$R" -hid "$hid"
done
run python -m pathnet_tpu.run -data cornell --quirk-compat -e "$E" -r "$R" -hid 64
run python -m pathnet_tpu.run -data Nba --quirk-compat -e "$E" -r "$R" -hid 256

# tier 2: Electronics (hid=32 per the reference config)
run python scripts/run_protocol_all.py Electronics --epochs "$E" --rounds "$R"
run python -m pathnet_tpu.run -data Electronics --model mlp -e "$E" -r "$R" -hid 64

# tier 3: remaining headline + geomgcn datasets (PathNet + MLP rows)
for d in cora citeseer chameleon film Dblp squirrel pubmed; do
  mb=""
  case "$d" in pubmed|Dblp|squirrel) mb="--microbatch 8192";; esac
  run python -m pathnet_tpu.run -data "$d" -e "$E" -r "$R" -hid 64 $mb
  run python -m pathnet_tpu.run -data "$d" --model mlp -e "$E" -r "$R" -hid 64
done

# tier 4: comparison table (500 epochs x 18 models per dataset, small first)
for d in cornell texas wisconsin Nba chameleon cora citeseer film Dblp squirrel pubmed bgp Electronics; do
  run python scripts/comparison_table.py "$d" "$R" 500
done

# tier 5: walk-length ablation (2-5) on four datasets
for d in cornell texas wisconsin Nba; do
  run python scripts/ablation_length.py "$d" "$R" "$E"
done

# tier 6: bench twice — second run must show compile_cache_hit
run python bench.py
run python bench.py

echo "=== tpu_queue_r3 done $(date) ==="
