#!/bin/bash
# Round-5 TPU measurement queue (one chip; STRICTLY one TPU job at a time —
# .claude/skills/verify/SKILL.md).  Phase-based so the orchestrator can
# sequence phases and overlap CPU-only work with non-timing-critical phases.
#
#   bash tools/run_tpu_queue_r5.sh quality    # femur rows rw,rw-adapt,mala
#   bash tools/run_tpu_queue_r5.sh sweep      # full bench grid, median-of-3
#   bash tools/run_tpu_queue_r5.sh crossimpl  # 16-port-chain comparison
#   bash tools/run_tpu_queue_r5.sh bfm        # BFM quality rows
#
# Lessons applied from VERDICT r4 weak 5: ordered by evidence value, every
# artifact committed the moment it lands, no redundant sanity bench.
set -u
cd /root/repo
Q=artifacts/tpu_queue
mkdir -p "$Q"

commit() {  # commit <msg> <paths...>
  local msg="$1"; shift
  git add "$@" 2>/dev/null
  git commit -m "$msg" >/dev/null 2>&1 && echo "[queue r5] committed: $msg" >&2
}

case "${1:?phase required: quality|sweep|crossimpl|bfm}" in

quality)
  echo "=== femur quality rows: rw (fairness re-run), rw-adapt, mala ===" >&2
  timeout 7200 env QUALITY_ROWS=rw,rw-adapt,mala python tools/quality_run.py \
      >"$Q/quality_rows_r5.log" 2>&1
  echo "quality rows rc=$?" >&2
  commit "quality_femur: measure rw-adapt and MALA-only rows (ess/wall-second decision data)" \
      artifacts/quality_femur.json "$Q/quality_rows_r5.log"
  ;;

sweep)
  echo "=== bench sweep: chains x components, median-of-3 per cell ===" >&2
  : >"$Q/bench_sweep.jsonl"
  for comp in 50 100 200; do
    for ch in 64 256 1024 2048; do
      # ADVICE r4 item 2: keep only the final stdout line and validate it is
      # JSON before embedding — stray output must not corrupt the JSONL
      line=$(timeout 2700 env BENCH_VERBOSE=0 BENCH_COMPONENTS=$comp BENCH_CHAINS=$ch \
             python bench.py 2>>"$Q/bench_sweep.err" | tail -n 1)
      rc=$?
      if ! python -c "import json,sys; json.loads(sys.argv[1])" "$line" 2>/dev/null; then
        line="{\"error\": \"bench produced no valid JSON (rc=$rc)\"}"
      fi
      echo "{\"components\": $comp, \"chains\": $ch, \"result\": $line}" >>"$Q/bench_sweep.jsonl"
      echo "comp=$comp chains=$ch -> $line" >&2
      commit "bench sweep: cell comp=$comp chains=$ch" "$Q/bench_sweep.jsonl" "$Q/bench_sweep.err"
    done
  done
  ;;

crossimpl)
  echo "=== cross-impl comparison at 16 port chains (cache is warm) ===" >&2
  timeout 7200 python tools/crossimpl_parity.py --components 50 --steps 20000 \
      --port-chains 16 --jax-chains 64 \
      --out artifacts/posterior_parity_crossimpl.json \
      >"$Q/crossimpl_r5.log" 2>&1
  echo "crossimpl rc=$?" >&2
  commit "cross-impl parity: re-run comparison at 16 independent port chains" \
      artifacts/posterior_parity_crossimpl.json artifacts/crossimpl_port_moments.npz \
      "$Q/crossimpl_r5.log"
  ;;

bfm)
  echo "=== BFM quality (10k x 16, complete + partial) ===" >&2
  timeout 10800 python tools/quality_bfm.py >"$Q/quality_bfm_r5.log" 2>&1
  echo "bfm rc=$?" >&2
  commit "quality_bfm: first committed BFM quality artifact (complete + partial rows)" \
      artifacts/quality_bfm.json "$Q/quality_bfm_r5.log"
  ;;

*) echo "unknown phase: $1" >&2; exit 2 ;;
esac
echo "PHASE $1 DONE" >&2
