#!/bin/bash
# Full TPU measurement battery for round 2 — run when the axon tunnel is up.
# Each step logs to tools/out/<step>.log and failures don't stop the rest.
# Usage: bash tools/chip_session.sh [outdir]
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-tools/out}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/session.log"; }

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

# 0. gate: is the chip reachable? (3 min probe)
log "probing device"
timeout 240 python - <<'EOF' > "$OUT/probe.log" 2>&1
import os, jax
print(jax.devices()); import jax.numpy as jnp
jax.block_until_ready(jnp.ones(8)+1); print("warm ok"); os._exit(0)
EOF
if [ $? -ne 0 ]; then log "DEVICE UNREACHABLE - aborting battery"; exit 1; fi
log "device up"

# 1. the round's gating deliverable: bench ladder within budget
step bench_ladder 900 python bench.py

# 2. class C breakdown (verdict item 4)
step profile_C 1500 python tools/profile_classC.py C

# 2b. class C at f32: expected to FAIL zeta (documents the df64 floor,
# verdict item 4's accepted alternative) while banking the f32 wall time
# -> quantifies what df64's two-plane arithmetic costs on the same path
step bench_C_f32 900 env LILAC_BENCH_CLASS=C LILAC_BENCH_DTYPE=f32 LILAC_BENCH_BUDGET_S=800 python bench.py

# 2c. class C net-schedule A/B: monotone (default, 68 stages) vs the
# round-1 Benes schedule (88 stages) — both plan caches are on disk
step bench_C_benes 900 env LILAC_BENCH_CLASS=C LILAC_NET_MODE=benes LILAC_BENCH_BUDGET_S=800 python bench.py

# 3. roofline table at 3+ sizes, gather vs routed (verdict item 2)
step roofline 3600 python -m lilac_tpu.bench spmv-roofline --sizes 20,40,60,100 --kernels auto,routed

# 4. SparseBench size-160 BiCG, routed, sigma relabel ON (verdict item 3).
# g=3 matches the NPB routed2 cache config; plans pre-built on host by
# tools/prebuild_sb160.py land in data/ under the same cache key.
step sb160_sigma 5400 env LILAC_HIER_GMAX=3 python - <<'EOF'
import os
from lilac_tpu.workloads import sparsebench as sb
r = sb.benchmark(160, dtype="df64", kernel="routed", sigma_relabel=True)
print(r); os._exit(0)
EOF

# 4b. same bench at bl=2^15/g=3 (PLAN stage-count lever: fewer outer
# passes for df64 hier plans)
step sb160_bl15 5400 env LILAC_HIER_BL=32768 LILAC_HIER_GMAX=3 python - <<'EOF'
import os
from lilac_tpu.workloads import sparsebench as sb
r = sb.benchmark(160, dtype="df64", kernel="routed", sigma_relabel=True)
print(r); os._exit(0)
EOF

# 4c. NPB class D re-measured (meta sidecar kills the regen wall; the
# default-budget ladder stops at C)
step class_D 1500 env LILAC_BENCH_CLASS=D LILAC_BENCH_BUDGET_S=1400 python bench.py

# 4d. NPB class E (plans must be pre-built in data/ by the host job)
step class_E 3600 env LILAC_BENCH_CLASS=E LILAC_BENCH_BUDGET_S=3500 python bench.py

# 5. marshalling probe incl. routed plans (verdict item 8 check)
step marshall 1200 python -m lilac_tpu.bench marshall --size 30

# 5a. graph workloads at 1M nodes: routed plans now run relabeled (no
# un-permute network) — re-measure vs round-1's 0.659s / 2.35s
step graph_pagerank 2400 python -m lilac_tpu.bench graph-scale --n 1000000 --iters 128 --kernels auto,routed
step graph_bfs 2400 python -m lilac_tpu.bench graph-scale --n 1000000 --workload bfs --kernels auto,routed

# 5b. SpGEMM paths on device
step spgemm 1200 python -m lilac_tpu.bench spgemm --sizes 16,24,32,48

# 5c. weak-scaling measurement path (1 real chip: validates the harness)
step weak_scaling 900 python -m lilac_tpu.bench weak-scaling --devices 1

# 6. autotune collection (resumable; bounded to ~50 min) + train
step autotune_collect 3300 python -m lilac_tpu.bench autotune-collect --budget-s 3000 --reps 10
step autotune_train 300 python -m lilac_tpu.bench autotune-train

log "battery complete"
