#!/bin/bash
# Round-3 follow-up TPU queue: close whatever tpu_queue_r3.sh left open.
#
# 1. bgp PathNet crashed the TPU worker twice (r2 at 218s, r3 at 359s —
#    results/protocol_all_status.json).  The main queue's retry guard was
#    wrong: it tested for result_for_bgp.txt, which the bgp *MLP* row had
#    already created, so the remat retry never ran.  Retry ladder here:
#    (a) remat on (shrinks grad-phase temps, grad_probe2.json),
#    (b) smaller device executions (scan_chunk 20) + microbatch 4096 —
#        if the crash is the experimental axon tunnel dropping long-running
#        executions, shorter chunks bound each RPC;
#    each attempt resumes at round granularity from orbax checkpoints.
# 2. Electronics retry with the same ladder (same gen_epoch tier).
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
R=${ROUNDS:-10}
E=${EPOCHS:-1000}
echo "=== tpu_queue_r3b start $(date) rounds=$R epochs=$E ==="

run() { echo "--- $* ($(date +%H:%M:%S))"; timeout 10800 "$@"; }

has_row() { # dataset model — a full-protocol row exists in results.jsonl
  python3 - "$1" "$2" <<'EOF'
import json, sys
name, model = sys.argv[1], sys.argv[2]
ok = False
for line in open("results/results.jsonl"):
    r = json.loads(line)
    c = r["config"]
    if (r["name"] == name and c.get("model", "pathnet") == model
            and not c.get("quirk_compat")
            and c.get("round", 0) >= 10 and c.get("epoch", 0) >= 1000
            and c.get("remat") is not None):  # remat key = round-3 row
        ok = True
sys.exit(0 if ok else 1)
EOF
}

bgp_try() {
  has_row bgp pathnet && return 0
  run python -m pathnet_tpu.run -data bgp -e "$E" -r "$R" -hid 64 \
      --microbatch "$1" --scan-chunk "$2" --remat "$3" --resume
}
# Nba's tier-1 run raced an intermediate version of the probability-column
# recovery (asymmetric recovered weights); rerun on the final product-based
# recovery so the committed row reflects the shipped code.
run python -m pathnet_tpu.run -data Nba -e "$E" -r "$R" -hid 256
run python -m pathnet_tpu.run -data Nba --model mlp -e "$E" -r "$R" -hid 256

bgp_try 8192 20 on
bgp_try 4096 10 on
bgp_try 2048 5 on

el_try() {
  has_row Electronics pathnet && return 0
  run python -m pathnet_tpu.run -data Electronics -e "$E" -r "$R" -hid 32 \
      --microbatch "$1" --scan-chunk "$2" --remat "$3" --resume
}
el_try 4096 20 on
el_try 2048 10 on

echo "=== tpu_queue_r3b done $(date) ==="
