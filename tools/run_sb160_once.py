"""One timed sb160 BiCG run with the ambient hier knobs (A/B driver)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lilac_tpu.workloads import sparsebench as sb  # noqa: E402

r = sb.benchmark(160, dtype="df64", kernel="routed", sigma_relabel=True)
print(
    f"sb160 bl={os.environ.get('LILAC_HIER_BL', 'default')}: {r.time_s:.2f}s "
    f"its={r.iterations} mflop={r.mflop_rate:.0f} kernel={r.kernel} "
    f"gap={r.true_residual_rel_gap:.2e} validated={r.validated}",
    flush=True,
)
os._exit(0)
