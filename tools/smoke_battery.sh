#!/bin/bash
# CPU smoke of every chip_session.sh step at tiny scale: the battery fires
# unattended on a possibly-brief tunnel window, so every code path must be
# proven crash-free here first. Forces the CPU platform inside each python
# (env vars do NOT override the axon sitecustomize registration).
cd "$(dirname "$0")/.." || exit 1
OUT=${1:-tools/out/smoke}
mkdir -p "$OUT"
FAIL=0
step() { # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[smoke] START $name"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then FAIL=1; fi
  echo "[smoke] END $name rc=$rc"
}

CPU='import jax; jax.config.update("jax_platforms","cpu")'

# 2. class profile (class S)
step profile 600 python -c "$CPU
import runpy, sys
sys.argv = ['profile_classC.py', 'S']
runpy.run_path('tools/profile_classC.py', run_name='__main__')"

# 3. roofline
step roofline 600 python -c "$CPU
from lilac_tpu.bench.__main__ import main
main(['spmv-roofline', '--sizes', '8,10', '--kernels', 'auto,routed'])"

# 4. sparsebench benchmark (routed + relabel, tiny, few iterations)
step sb_bench 600 python -c "$CPU
from lilac_tpu.workloads import sparsebench as sb
r = sb.benchmark(10, dtype='df64', kernel='routed', sigma_relabel=True, maxit=8)
print(r)"

# 4b. same at bl=2^15 path (bl must divide tiny nets: exercise env wiring)
step sb_bench_bl 600 env LILAC_HIER_BL=32768 LILAC_HIER_GMAX=3 python -c "$CPU
from lilac_tpu.workloads import sparsebench as sb
r = sb.benchmark(10, dtype='df64', kernel='routed', sigma_relabel=True, maxit=8)
print(r)"

# 5. marshalling probe
step marshall 600 python -c "$CPU
from lilac_tpu.bench.__main__ import main
main(['marshall', '--size', '10'])"

# 5b. spgemm paths
step spgemm 600 python -c "$CPU
from lilac_tpu.bench.__main__ import main
main(['spgemm', '--sizes', '8,12'])"

# 5c. weak scaling on the virtual mesh
step weak 600 python -c "
import os
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=8'
$CPU
from lilac_tpu.bench.__main__ import main
main(['weak-scaling', '--per-dev-n', '4096', '--mean-nnz', '6', '--devices', '1,2', '--reps', '3'])"

# 6. autotune collect + train
step autotune 900 python -c "$CPU
from lilac_tpu.bench.__main__ import main
main(['autotune-collect', '--rows', '/tmp/smoke_rows.jsonl', '--max-n', '3000',
      '--budget-s', '60', '--reps', '2'])
main(['autotune-train', '--rows', '/tmp/smoke_rows.jsonl', '--out', '/tmp/smoke_model.json'])"

# 7. class E path = bench.py internals with a tiny class (S) forced;
# bench.py itself needs the chip, but npb_cg.run is its whole body
step npb_run 600 python -c "$CPU
from lilac_tpu.workloads import npb_cg
r = npb_cg.run('S', dtype='df64')
assert r.verified, r
print('S verified', r.time_s)"

echo "[smoke] overall FAIL=$FAIL"
exit $FAIL
