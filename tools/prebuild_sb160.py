#!/usr/bin/env python
"""Pre-build the SparseBench size-160 routed plan disk caches on the host.

Builds both chip-battery variants (bl=2^16 and bl=2^15, g=3) so the TPU
session loads plans from data/ instead of spending its window on ~10 min
of single-core network construction. Forces the CPU platform first: plan
construction is pure host work and must not touch (or hang on) the axon
tunnel. Containers are saved as numpy arrays, so a CPU-built cache loads
fine on the TPU later.
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lilac_tpu.workloads import sparsebench as sb  # noqa: E402

SIZE = int(os.environ.get("SB_SIZE", "160"))

for bl in (1 << 16, 1 << 15):
    os.environ["LILAC_HIER_BL"] = str(bl)
    os.environ["LILAC_HIER_GMAX"] = "3"
    t0 = time.time()
    plan, plan_t, n, _csr = sb.build_bench_plans(
        SIZE, dtype="df64", kernel="routed", sigma_relabel=True
    )
    print(
        f"sb{SIZE} bl={bl}: built+cached in {time.time() - t0:.0f}s "
        f"(n={n}, nnz={plan.nnz}, kernel={plan.kernel})",
        flush=True,
    )
print("done")
