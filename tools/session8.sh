#!/bin/bash
# Round-5 battery #3: wait out the tunnel outage, then the remaining
# chip work: sb160 bl=2^17 A/B, class-A routed capture, corpus growth.
cd "$(dirname "$0")/.."
mkdir -p tools/out7

probe() {
  timeout 360 python - <<'EOF' > /dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
a = jnp.ones((4096, 4096), jnp.float32)
b = jax.jit(lambda x: x @ x)(a)
assert float(np.asarray(b[0, 0])) == 4096.0
EOF
}

echo "watch start $(date -u +%H:%M:%S)"
until probe; do
  echo "tunnel down $(date -u +%H:%M:%S)"
  sleep 300
done
echo "tunnel RECOVERED $(date -u +%H:%M:%S)"

step() {
  name=$1; tmo=$2; shift 2
  echo "=== step $name (timeout ${tmo}s) $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "tools/out7/${name}.log" 2>&1
  echo "=== step $name rc=$? $(date -u +%H:%M:%S)"
}

step sb160_bl17b 3000 env LILAC_HIER_BL=131072 LILAC_HIER_GMAX=3 \
  python tools/run_sb160_once.py

step classA_routed 900 env LILAC_BENCH_CLASS=A LILAC_BENCH_BUDGET_S=800 \
  python bench.py

step autotune_more3 10800 python -m lilac_tpu.bench autotune-collect --budget-s 10500

step autotune_retrain 600 python -m lilac_tpu.bench autotune-train
