#!/bin/bash
# Watch for the axon TPU tunnel to come back; fire the measurement battery
# (tools/chip_session.sh) the moment a probe succeeds. Gives up after CAP_S.
# Logs to tools/out/watch.log. Usage: bash tools/tunnel_watch.sh [cap_seconds]
cd "$(dirname "$0")/.." || exit 1
mkdir -p tools/out
CAP_S=${1:-32400}   # 9h default
T0=$(date +%s)
log() { echo "[$(date +%H:%M:%S)] $*" >> tools/out/watch.log; }
log "watcher start, cap ${CAP_S}s"
while true; do
  now=$(date +%s)
  if [ $((now - T0)) -ge "$CAP_S" ]; then
    log "cap reached, giving up"
    exit 2
  fi
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import os, jax
jax.devices()
import jax.numpy as jnp
jax.block_until_ready(jnp.ones(8)+1)
os._exit(0)
EOF
  rc=$?
  if [ $rc -eq 0 ]; then
    log "DEVICE UP after $((now - T0))s blocked - firing battery"
    bash tools/chip_session.sh tools/out
    log "battery done rc=$?"
    exit 0
  fi
  log "probe rc=$rc (down), sleeping 240s"
  sleep 240
done
