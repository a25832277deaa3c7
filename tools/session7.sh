#!/bin/bash
# Round-5 recovery battery: poll the wedged axon tunnel with short probes;
# when a real program executes again, run the remaining chip work:
# the full default ladder (BENCH_r05 dress rehearsal) then corpus growth.
cd "$(dirname "$0")/.."
mkdir -p tools/out7

probe() {
  timeout 120 python - <<'EOF' > /dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
a = jnp.ones((4096, 4096), jnp.float32)
b = jax.jit(lambda x: x @ x)(a)
assert float(np.asarray(b[0, 0])) == 4096.0
EOF
}

echo "watch start $(date -u +%H:%M:%S)"
until probe; do
  echo "tunnel still wedged $(date -u +%H:%M:%S)"
  sleep 300
done
echo "tunnel RECOVERED $(date -u +%H:%M:%S)"

step() {
  name=$1; tmo=$2; shift 2
  echo "=== step $name (timeout ${tmo}s) $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "tools/out7/${name}.log" 2>&1
  echo "=== step $name rc=$? $(date -u +%H:%M:%S)"
}

step ladder_full_r5b 600 python bench.py
step sb160_floor 3600 python tools/sb160_floor.py
step autotune_more2 7200 python -m lilac_tpu.bench autotune-collect --budget-s 7000
