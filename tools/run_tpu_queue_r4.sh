#!/bin/bash
# Round-4 sequential TPU measurement queue (one chip; STRICTLY one job at a
# time — two processes contending for the axon grant can crash the shared
# worker, see .claude/skills/verify/SKILL.md).
#
# Produces the round-4 evidence artifacts:
#   artifacts/tpu_queue/bench_r4_flagship.json   flagship sanity + cache warm
#   artifacts/quality_femur.json                 VERDICT r3 item 2
#   artifacts/pod_chains_tpu.json                VERDICT r3 items 1/8
#   artifacts/tpu_queue/bench_sweep.jsonl        VERDICT r3 item 3 (median-of-3,
#                                                per-rank anchors, every cell)
#   artifacts/quality_bfm.json                   VERDICT r3 item 7
set -u
cd /root/repo
Q=artifacts/tpu_queue
mkdir -p "$Q"

echo "=== 1. flagship bench sanity (warms caches) ===" >&2
timeout 1800 env BENCH_VERBOSE=1 python bench.py \
    >"$Q/bench_r4_flagship.json" 2>"$Q/bench_r4_flagship.err"
echo "bench rc=$?" >&2

echo "=== 2. femur quality run (10k x 16 chains, flagship+hybrid+rw) ===" >&2
timeout 10800 python tools/quality_run.py >"$Q/quality_run_r4.log" 2>&1
echo "quality rc=$?" >&2

echo "=== 3. pod chains, real chip (state-trace diagnostics + path field) ===" >&2
timeout 3600 python -m icp_proposal_tpu.apps.pod_chains --chains 1024 --steps 1000 \
    --segment-steps 100 --out artifacts/pod_chains_tpu.json \
    >"$Q/pod_chains_r4.log" 2>&1
echo "pod rc=$?" >&2

echo "=== 4. bench sweep: chains x components, median-of-3 per cell ===" >&2
: >"$Q/bench_sweep.jsonl"
for comp in 50 100 200; do
  for ch in 64 256 1024 2048; do
    line=$(timeout 1800 env BENCH_VERBOSE=0 BENCH_COMPONENTS=$comp BENCH_CHAINS=$ch python bench.py 2>>"$Q/bench_sweep.err")
    rc=$?
    # a crashed/empty bench must still produce VALID JSON (ADVICE r2 item 2)
    if [ -z "$line" ]; then
      line="{\"error\": \"bench produced no output (rc=$rc)\"}"
    fi
    echo "{\"components\": $comp, \"chains\": $ch, \"result\": $line}" >>"$Q/bench_sweep.jsonl"
    echo "comp=$comp chains=$ch -> $line" >&2
  done
done

echo "=== 5. BFM quality (10k x 16, complete + partial) ===" >&2
timeout 10800 python tools/quality_bfm.py >"$Q/quality_bfm_r4.log" 2>&1
echo "bfm rc=$?" >&2

echo "QUEUE R4 DONE" >&2
