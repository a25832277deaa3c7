#!/bin/bash
# Follow-on to session5b: SpGEMM crossover probe + stage-roofline capture.
cd "$(dirname "$0")/.." || exit 1
OUT=tools/out5
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/session.log"; }

while kill -0 "$1" 2>/dev/null; do sleep 5; done
log "5b done, starting 5c"

log "START spgemm"
timeout 600 python -m lilac_tpu.bench spgemm --sizes 16,24,32,48 \
  > "$OUT/spgemm.log" 2>&1
log "END spgemm rc=$? ($(tail -c 150 "$OUT/spgemm.log" | tr '\n' ' '))"

log "START roofline (stage column)"
timeout 700 python -m lilac_tpu.bench spmv-roofline --sizes 20,40,60 \
  --kernels auto,routed > "$OUT/roofline.log" 2>&1
log "END roofline rc=$?"

log "battery 5c complete"
