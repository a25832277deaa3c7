#!/bin/bash
# Round-5 battery #2: runs AFTER the class-E capture frees the chip.
# Each step is timeboxed; logs land in tools/out7. Steps are independent:
# a failure moves on (the banked-rung discipline, bench.py style).
cd "$(dirname "$0")/.."
mkdir -p tools/out7

# wait for any running bench.py (the class-E capture) to exit
while pgrep -f "python bench.py" > /dev/null; do sleep 60; done

step() {
  name=$1; tmo=$2; shift 2
  echo "=== step $name (timeout ${tmo}s) $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "tools/out7/${name}.log" 2>&1
  echo "=== step $name rc=$? $(date -u +%H:%M:%S)"
}

# 1. sb160 BiCG through the Benes-reverse adjoint (one plan, both
#    directions). Cached F plan key needs g=3.
step sb160_adj 4800 env LILAC_HIER_GMAX=3 python - <<'EOF'
import os
from lilac_tpu.workloads import sparsebench as sb
r = sb.benchmark(160, dtype="df64", kernel="routed", sigma_relabel=True)
print(f"sb160 adj: {r.time_s:.2f}s its={r.iterations} mflop={r.mflop_rate:.0f} "
      f"kernel={r.kernel} rec_res={r.residual:.3e} gap={r.true_residual_rel_gap:.2e} "
      f"validated={r.validated}", flush=True)
os._exit(0)
EOF

# 2. class C A/B: dedicated VT plan vs adjoint (same session)
step classC_plan 1200 env LILAC_BENCH_CLASS=C LILAC_FACTORED_VT=plan \
  LILAC_BENCH_BUDGET_S=1100 python bench.py
step classC_adj 1200 env LILAC_BENCH_CLASS=C LILAC_FACTORED_VT=adj \
  LILAC_BENCH_BUDGET_S=1100 python bench.py

# 2b. class C with the fused df64 mul+reduce kernel (round-4 attempt hit
#     a cold 640 s compile budget; retry warm with a real budget)
step classC_fused 1800 env LILAC_BENCH_CLASS=C LILAC_DF_FUSED=1 \
  LILAC_BENCH_BUDGET_S=1700 python bench.py

# 3. SpGEMM re-measure after the super-chunk residency fix (verdict #7)
step spgemm_r5 2400 python -m lilac_tpu.bench spgemm --sizes 16,24,32,48

# 4. roofline with the replay-based stage floor (verdict #10)
step roofline_r5 2400 python -m lilac_tpu.bench spmv-roofline \
  --sizes 20,40,60 --kernels auto,routed

# 5. resume autotune corpus collection with the remaining window
step autotune_more 9000 python -m lilac_tpu.bench autotune-collect --budget-s 8800
