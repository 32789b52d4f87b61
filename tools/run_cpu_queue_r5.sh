#!/bin/bash
# Round-5 CPU (virtual-mesh) measurement queue.  Run reniced and ONLY while
# no timing-critical TPU phase is measuring (2 physical cores — CPU load
# inflates TPU wall-times; .claude/skills/verify/SKILL.md round-4 notes).
#
#   nice -n 19 bash tools/run_cpu_queue_r5.sh converged
#   nice -n 19 bash tools/run_cpu_queue_r5.sh podv8
set -u
cd /root/repo
Q=artifacts/tpu_queue
mkdir -p "$Q"

commit() {
  local msg="$1"; shift
  git add "$@" 2>/dev/null
  git commit -m "$msg" >/dev/null 2>&1 && echo "[cpu queue r5] committed: $msg" >&2
}

case "${1:?phase required: converged|podv8}" in

converged)
  echo "=== converged femur run on the virtual 8-device mesh ===" >&2
  REC=$(python -c "
import json
d = json.load(open('artifacts/quality_femur.json'))
print(d.get('recommended_by_ess_per_wall_second', 'rw'))" 2>/dev/null || echo rw)
  echo "recommended setup: $REC" >&2
  timeout 14400 env JAX_PLATFORMS=cpu \
      python tools/converged_run.py --setup "$REC" \
      >"$Q/converged_run_r5.log" 2>&1
  echo "converged rc=$?" >&2
  commit "converged run: overdispersed chains to pooled split-Rhat < 1.1 on the virtual 8-device mesh (collectives path)" \
      artifacts/converged_run_virtual8.json "$Q/converged_run_r5.log"
  ;;

podv8)
  echo "=== pod chains, virtual 8-device mesh (state-trace regen) ===" >&2
  timeout 7200 env JAX_PLATFORMS=cpu \
      XLA_FLAGS="--xla_force_host_platform_device_count=8" \
      python -m icp_proposal_tpu.apps.pod_chains --chains 1024 --steps 1000 \
      --segment-steps 250 --out artifacts/pod_chains_virtual8.json \
      >"$Q/pod_chains_virtual8_r5.log" 2>&1
  echo "pod virtual8 rc=$?" >&2
  commit "pod chains: regenerate virtual-8 artifact with state-trace diagnostics (replaces stale candidate-trace output)" \
      artifacts/pod_chains_virtual8.json "$Q/pod_chains_virtual8_r5.log"
  ;;

*) echo "unknown phase: $1" >&2; exit 2 ;;
esac
echo "CPU PHASE $1 DONE" >&2
