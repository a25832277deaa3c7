#!/usr/bin/env python
"""Class-C time breakdown on the real chip (round-2 verdict item 4).

Answers "where do the 6.79 s go" by timing, with the chained-reps
two-point-slope protocol (per-dispatch tunnel overhead ~60 ms dominates
naive timings):

  1. V routed apply alone          (the forward gather network)
  2. VT routed apply alone         (the transpose-side network)
  3. full factored matvec          (V + scale + VT + diag)
  4. one power-method iteration    (matvec + dots + normalize)
  5. whole class-C run             (reference protocol, ladder metric)

Usage: python tools/profile_classC.py [CLASS]   (default C)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CLASS = sys.argv[1] if len(sys.argv) > 1 else "C"


def slope_time(fn, x, reps_lo=4, reps_hi=16):
    """Two-point slope: wall(r_hi) - wall(r_lo) / (r_hi - r_lo), chained."""
    import jax

    def chain(reps):
        def run(v):
            for _ in range(reps):
                v = fn(v)
            return v

        g = jax.jit(run)
        y = g(x)
        jax.block_until_ready(y)  # warm-up/compile
        t0 = time.perf_counter()
        y = g(x)
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    lo = chain(reps_lo)
    hi = chain(reps_hi)
    return (hi - lo) / (reps_hi - reps_lo)


def main():
    import jax

    from lilac_tpu.config import enable_compile_cache

    enable_compile_cache()
    # min_compile_time/min_entry_size zeros matter here: each chained-rep
    # probe is its own program, and the round-1 session lost its window
    # re-compiling probes that a prior run had already built
    t0 = time.time()
    print(f"device: {jax.devices()[0]}  (init {time.time()-t0:.1f}s)",
          flush=True)

    import numpy as np

    from lilac_tpu.kernels import factored as F
    from lilac_tpu.ops import dfloat as df
    from lilac_tpu.plan import FactoredNPBPlan
    from lilac_tpu.workloads import npb_cg

    plan = FactoredNPBPlan(CLASS, dtype="df64")
    n = plan.shape[0]
    print(f"class {CLASS}: n={n} nnz_eff={plan.nnz}", flush=True)
    A = plan.A
    x = plan.vec_in(np.ones(n))

    t_v = slope_time(lambda v: F._spmv_any_df(A.V, v), x)
    print(f"V apply:        {t_v*1e3:8.3f} ms "
          f"({t_v/ (plan.nnz/2) * 1e9:.3f} ns/elem)", flush=True)
    t_vt = slope_time(lambda v: F._spmv_any_df(A.VT, v), x)
    print(f"VT apply:       {t_vt*1e3:8.3f} ms "
          f"({t_vt/(plan.nnz/2)*1e9:.3f} ns/elem)", flush=True)
    t_mv = slope_time(lambda v: F.factored_spmv_df(A, v), x)
    print(f"full matvec:    {t_mv*1e3:8.3f} ms "
          f"(overhead vs V+VT: {(t_mv-t_v-t_vt)*1e3:.3f} ms)", flush=True)

    from lilac_tpu.solvers.algebra import get_algebra
    from lilac_tpu.solvers.cg import npb_power_method

    alg = get_algebra("df64")
    cls = npb_cg.CLASSES[CLASS.upper()]

    def one_iter(v):
        zs, rs, xn = npb_power_method(plan.matvec_with, alg, A, v, cls.shift, 1)
        return xn

    t_it = slope_time(one_iter, x, reps_lo=2, reps_hi=6)
    # one power iteration = 26 matvecs (25 CG + 1 residual) + dots
    print(f"power iter:     {t_it*1e3:8.3f} ms "
          f"(= {t_it/26*1e3:.3f} ms/matvec-equivalent; "
          f"non-matvec share {(t_it-26*t_mv)/t_it:.1%})", flush=True)

    t0 = time.time()
    res = npb_cg.run(CLASS, dtype="df64", kernel="factored", plan=plan)
    print(f"full class {CLASS}: {res.time_s:.3f}s verified={res.verified} "
          f"(wall {time.time()-t0:.1f}s)", flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
