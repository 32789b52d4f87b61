#!/bin/bash
# Sequential TPU measurement queue for round-2 evidence (one chip, serialize).
# Writes artifacts/tpu_queue/*.log + refreshed artifacts/mixing_sweep.json.
set -u
cd /root/repo
mkdir -p artifacts/tpu_queue
Q=artifacts/tpu_queue

echo "=== 1. mixing sweep (incl. MALA rows) ===" >&2
timeout 3600 python tools/mixing_sweep.py --components 50 --chains 64 --steps 2000 \
    --out artifacts/mixing_sweep.json >"$Q/mixing_sweep.log" 2>&1
echo "mixing_sweep rc=$?" >&2

echo "=== 2. per-component profile, B=2048 GPMM-100 ===" >&2
timeout 1800 env B=2048 N=50 python tools/profile_scan.py >"$Q/profile_scan_2048.log" 2>&1
echo "profile_scan rc=$?" >&2

echo "=== 3. bench sweep: chains x components ===" >&2
: >"$Q/bench_sweep.jsonl"
for comp in 50 100 200; do
  for ch in 64 256 1024 2048; do
    line=$(timeout 900 env BENCH_VERBOSE=0 BENCH_COMPONENTS=$comp BENCH_CHAINS=$ch python bench.py 2>>"$Q/bench_sweep.err")
    rc=$?
    # a crashed/empty bench must still produce VALID JSON (ADVICE r2 item 2:
    # a kernel fault at comp=200,ch=2048 spliced '"result": }' into the file)
    if [ -z "$line" ]; then
      line="{\"error\": \"bench produced no output (rc=$rc)\"}"
    fi
    echo "{\"components\": $comp, \"chains\": $ch, \"result\": $line}" >>"$Q/bench_sweep.jsonl"
    echo "comp=$comp chains=$ch -> $line" >&2
  done
done

echo "=== 4. culling A/B at flagship size ===" >&2
for mode in 0 1; do
  line=$(timeout 900 env BENCH_VERBOSE=0 ICP_TPU_CULLING=$mode BENCH_CHAINS=2048 python bench.py 2>>"$Q/culling.err")
  echo "{\"culling\": $mode, \"result\": $line}" >>"$Q/culling.jsonl"
  echo "culling=$mode -> $line" >&2
done

echo "QUEUE DONE" >&2
