#!/bin/bash
# Follow-on to capture_graphs.py: autotune collection then class-C f32.
cd "$(dirname "$0")/.." || exit 1
OUT=tools/out5
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/session.log"; }

# wait for the graph capture (pid passed as $1) to finish
while kill -0 "$1" 2>/dev/null; do sleep 5; done
log "graph capture done"

log "START autotune_collect"
timeout 800 python -m lilac_tpu.bench autotune-collect --budget-s 650 \
  > "$OUT/autotune_collect.log" 2>&1
log "END autotune_collect rc=$? ($(tail -c 150 "$OUT/autotune_collect.log" | tr '\n' ' '))"

log "START autotune_train (host)"
timeout 300 python -m lilac_tpu.bench autotune-train \
  > "$OUT/autotune_train.log" 2>&1
log "END autotune_train rc=$?"

log "START classC_f32"
timeout 700 env LILAC_BENCH_CLASS=C LILAC_BENCH_DTYPE=f32 \
  LILAC_BENCH_BUDGET_S=620 python bench.py > "$OUT/classC_f32.log" 2>&1
log "END classC_f32 rc=$? ($(tail -c 200 "$OUT/classC_f32.log" | tr '\n' ' '))"

log "battery 5b complete"
