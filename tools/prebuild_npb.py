#!/usr/bin/env python
"""Pre-build NPB factored routed-plan caches (data/routed2_*) on host CPU.

Usage: python tools/prebuild_npb.py [CLASS ...]   (default: D)

Forces the CPU platform (plan construction must not touch the axon
tunnel) and the routed factored layout (the CPU default is 'single', but
the caches being primed are for the chip run). Containers save as numpy,
so a CPU-built cache loads fine on the TPU later.
"""

import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["LILAC_FACTORED_SEGMODE"] = "routed"

from lilac_tpu.plan import FactoredNPBPlan  # noqa: E402

for cls in sys.argv[1:] or ["D"]:
    t0 = time.time()
    plan = FactoredNPBPlan(cls, dtype="df64")
    print(
        f"npb class {cls}: factored routed caches built in "
        f"{time.time() - t0:.0f}s (nnz={plan.nnz})",
        flush=True,
    )
