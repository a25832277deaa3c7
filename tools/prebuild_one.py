#!/usr/bin/env python
"""Pre-build ONLY the bl=2^16/g=3 sb160 routed plan cache (host CPU).

Trimmed variant of prebuild_sb160.py for short live-tunnel windows: one
variant (~7 min single-core) instead of two (~17 min), run at nice 19 so
the concurrent chip battery's host phases keep the core.
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["LILAC_HIER_BL"] = str(1 << 16)
os.environ["LILAC_HIER_GMAX"] = "3"

from lilac_tpu.workloads import sparsebench as sb  # noqa: E402

t0 = time.time()
plan, plan_t, n, _csr = sb.build_bench_plans(
    160, dtype="df64", kernel="routed", sigma_relabel=True
)
print(
    f"sb160 bl=65536: built+cached in {time.time() - t0:.0f}s "
    f"(n={n}, nnz={plan.nnz}, kernel={plan.kernel})",
    flush=True,
)
