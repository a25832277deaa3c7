#!/bin/bash
# Round-2 continuation chip battery (session 3, Aug 18 ~23:50).
# Prioritized for ~50 min of live tunnel: the steps the driver's final
# bench.py run can NOT capture come first (class D, roofline, sb160,
# graphs); class A/C are banked by the driver's own ladder run.
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-tools/out3}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/session.log"; }

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name (cap ${tmo}s)"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

log "probing device"
timeout 240 python - <<'EOF' > "$OUT/probe.log" 2>&1
import os, jax
print(jax.devices()); import jax.numpy as jnp
jax.block_until_ready(jnp.ones(8)+1); print("warm ok"); os._exit(0)
EOF
if [ $? -ne 0 ]; then log "DEVICE UNREACHABLE - aborting battery"; exit 1; fi
log "device up"

# 1. class D — the headline rung round 1 measured at 98.2s (22.2x) that
# round 2 has not yet captured. Cold caches: ~260s native plan build +
# makea + cold compile; give it room.
step class_D 1300 env LILAC_BENCH_CLASS=D LILAC_BENCH_BUDGET_S=1200 python bench.py

# 2. honest roofline, gather vs routed (verdict #2)
step roofline 800 python -m lilac_tpu.bench spmv-roofline --sizes 20,40,60 --kernels auto,routed

# 3. SparseBench size-160 BiCG routed (verdict #3) — waits for the host
# prebuild (tools/prebuild_one.py, bl=2^16 only) to land in data/
for i in $(seq 60); do
  ls data/plan_sb160*65536* >/dev/null 2>&1 && break
  compgen -G "data/plan_sb160*" >/dev/null && break
  sleep 10
done
step sb160_sigma 1200 env LILAC_HIER_GMAX=3 python - <<'EOF'
import os
from lilac_tpu.workloads import sparsebench as sb
r = sb.benchmark(160, dtype="df64", kernel="routed", sigma_relabel=True)
print(r); os._exit(0)
EOF

# 4. graph workloads, relabeled routed plans (round-1: 0.659s / 2.35s)
step graph_pagerank 600 python -m lilac_tpu.bench graph-scale --n 1000000 --iters 128 --kernels auto,routed
step graph_bfs 600 python -m lilac_tpu.bench graph-scale --n 1000000 --workload bfs --kernels auto,routed

# 5. extras if the window is still open
step marshall 500 python -m lilac_tpu.bench marshall --size 30
step spgemm 500 python -m lilac_tpu.bench spgemm --sizes 16,24,32

# 6. warm the ladder caches for the driver's final bench.py run
step bench_ladder 480 python bench.py

log "battery complete"
