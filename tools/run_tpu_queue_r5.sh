#!/bin/bash
# Round-5 sequential measurement queue.  Run ONLY when the round-4 queue has
# exited (one TPU job at a time — .claude/skills/verify/SKILL.md).
#
# Lessons applied from VERDICT r4 weak 5: jobs ordered by evidence value,
# every artifact committed the moment it lands, no redundant sanity bench.
#
# Produces / commits:
#   artifacts/quality_femur.json         + rw-adapt & mala rows (VERDICT item 4)
#   artifacts/posterior_parity_crossimpl.json  16 port chains (VERDICT item 5)
#   artifacts/converged_run_virtual8.json      (VERDICT items 1d/8; CPU mesh)
#   artifacts/pod_chains_virtual8.json         state-trace regen (VERDICT item 2)
set -u
cd /root/repo
Q=artifacts/tpu_queue
mkdir -p "$Q"

commit() {  # commit <msg> <paths...>
  local msg="$1"; shift
  git add "$@" 2>/dev/null
  git commit -m "$msg" >/dev/null 2>&1 && echo "[queue r5] committed: $msg" >&2
}

echo "=== 0. retry failed bench-sweep cells (compile stalls) ===" >&2
python - <<'EOF' 2>>"$Q/bench_sweep.err"
import json, os, subprocess
path = "artifacts/tpu_queue/bench_sweep.jsonl"
lines = [json.loads(l) for l in open(path)] if os.path.exists(path) else []
changed = False
for i, row in enumerate(lines):
    if "error" not in row.get("result", {}):
        continue
    comp, ch = row["components"], row["chains"]
    print(f"[retry] comp={comp} chains={ch}", flush=True)
    env = dict(os.environ, BENCH_VERBOSE="0",
               BENCH_COMPONENTS=str(comp), BENCH_CHAINS=str(ch))
    try:
        out = subprocess.run(
            ["timeout", "2700", "python", "bench.py"],
            env=env, capture_output=True, text=True,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        result = json.loads(line)
    except Exception as e:  # keep the cell a valid JSON error object
        result = {"error": f"retry failed: {e}"}
    lines[i] = {"components": comp, "chains": ch, "result": result}
    changed = True
    print(f"[retry] -> {json.dumps(result)}", flush=True)
if changed:
    with open(path, "w") as f:
        for row in lines:
            f.write(json.dumps(row) + "\n")
EOF
commit "bench sweep: retry cells lost to server-side compile stalls" \
    "$Q/bench_sweep.jsonl" "$Q/bench_sweep.err" || true

echo "=== 1. femur quality rows: rw (fairness re-run), rw-adapt, mala ===" >&2
timeout 7200 env QUALITY_ROWS=rw,rw-adapt,mala python tools/quality_run.py \
    >"$Q/quality_rows_r5.log" 2>&1
echo "quality rows rc=$?" >&2
commit "quality_femur: measure rw-adapt and MALA-only rows (ess/wall-second decision data)" \
    artifacts/quality_femur.json "$Q/quality_rows_r5.log"

echo "=== 2. cross-impl comparison at 16 port chains (cache is warm) ===" >&2
timeout 7200 python tools/crossimpl_parity.py --components 50 --steps 20000 \
    --port-chains 16 --jax-chains 64 \
    --out artifacts/posterior_parity_crossimpl.json \
    >"$Q/crossimpl_r5.log" 2>&1
echo "crossimpl rc=$?" >&2
commit "cross-impl parity: re-run comparison at 16 independent port chains" \
    artifacts/posterior_parity_crossimpl.json artifacts/crossimpl_port_moments.npz \
    "$Q/crossimpl_r5.log"

# ---- TPU timing artifacts done; CPU-mesh jobs may now use the cores ----

echo "=== 3. converged femur run on the virtual 8-device mesh ===" >&2
REC=$(python -c "
import json
d = json.load(open('artifacts/quality_femur.json'))
print(d.get('recommended_by_ess_per_wall_second', 'rw'))" 2>/dev/null || echo rw)
echo "recommended setup: $REC" >&2
timeout 14400 env JAX_PLATFORMS=cpu \
    python tools/converged_run.py --setup "$REC" \
    >"$Q/converged_run_r5.log" 2>&1
echo "converged rc=$?" >&2
commit "converged run: 64 overdispersed chains to pooled split-Rhat < 1.1 on the virtual 8-device mesh (collectives path)" \
    artifacts/converged_run_virtual8.json "$Q/converged_run_r5.log"

echo "=== 4. pod chains, virtual 8-device mesh (state-trace regen) ===" >&2
timeout 7200 env JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m icp_proposal_tpu.apps.pod_chains --chains 1024 --steps 1000 \
    --segment-steps 250 --out artifacts/pod_chains_virtual8.json \
    >"$Q/pod_chains_virtual8_r5.log" 2>&1
echo "pod virtual8 rc=$?" >&2
commit "pod chains: regenerate virtual-8 artifact with state-trace diagnostics (replaces stale candidate-trace output)" \
    artifacts/pod_chains_virtual8.json "$Q/pod_chains_virtual8_r5.log"

echo "QUEUE R5 DONE" >&2
