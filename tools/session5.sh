#!/bin/bash
# Round-3 final chip battery (~100 min of wall left in the round).
# Runs the cheap captures first; the class-E probe is launched separately
# so its budget can be trimmed to whatever wall remains.
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-tools/out5}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/session.log"; }

step() { # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name (cap ${tmo}s)"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  log "END $name rc=$rc ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' '))"
}

# wait for the already-running pagerank capture (launched by hand)
for i in $(seq 150); do
  pgrep -f "graph-scale --n 1000000 --iters 128" >/dev/null 2>&1 || break
  sleep 5
done

step graph_bfs 700 python -m lilac_tpu.bench graph-scale --n 1000000 \
  --workload bfs --kernels auto,routed

# autotune v2 collection (verdict #5): budgeted + resumable; rows land in
# data/autotune_rows.jsonl, training happens host-side afterwards
step autotune_collect 800 python -m lilac_tpu.bench autotune-collect \
  --budget-s 650

# class C f32 floor (verdict #4): same solve, f32 values — bounds the df64
# arithmetic penalty by measurement
step classC_f32 700 env LILAC_BENCH_CLASS=C LILAC_BENCH_DTYPE=f32 \
  LILAC_BENCH_BUDGET_S=600 python bench.py

log "battery complete"
