"""sb160 pass-sweep floor vs full matvec (verdict #5's 'measured
breakdown showing the new floor').

Loads the cached sb160 F plan (hier, df64), measures:
  (a) the pure pass-sweep floor (replay of every group's schedule on
      synthetic planes, profiling.measure_plan_stage_time),
  (b) the full forward matvec,
  (c) the full adjoint matvec (A^T through the same plan),
and prints the attribution. The gap (b)-(a) is glue (vals multiply +
chunk reduce + unperm); (c)/(b) is the adjoint's add-merge premium.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("LILAC_HIER_GMAX", "3")  # the cached plan's key

import jax  # noqa: E402

from lilac_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

from lilac_tpu.workloads import sparsebench as sb  # noqa: E402

t0 = time.perf_counter()
plan, _pt, n, _csr = sb.build_bench_plans(
    160, dtype="df64", kernel="routed", sigma_relabel=True
)
print(f"plan loaded in {time.perf_counter()-t0:.0f}s kernel={plan.kernel}",
      flush=True)

from lilac_tpu.utils.profiling import measure_plan_stage_time  # noqa: E402

REPS = 20
floor = measure_plan_stage_time(plan, reps=REPS)
print(f"pass-sweep floor: {floor*1e3:.2f} ms/matvec-equivalent", flush=True)

x = plan.vec_in(np.random.default_rng(0).normal(size=n))


def timed(f, tag):
    import jax.numpy as jnp

    @jax.jit
    def chain(A, v):
        def body(_, vv):
            return f(A, vv)

        return jax.lax.fori_loop(0, REPS, body, v)

    y = chain(plan.A, x)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[0])
    t0 = time.perf_counter()
    y = chain(plan.A, x)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[0])
    t = (time.perf_counter() - t0) / REPS
    print(f"{tag}: {t*1e3:.2f} ms/matvec", flush=True)
    return t


fwd = timed(plan.matvec_with, "forward matvec")
adj = timed(plan.matvec_t_with, "adjoint matvec")
print(
    f"attribution: floor {floor/fwd:.1%} of forward; glue {1-floor/fwd:.1%};"
    f" adjoint premium {adj/fwd:.2f}x", flush=True,
)
os._exit(0)
