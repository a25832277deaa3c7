#!/usr/bin/env python
"""Class-C df64-floor profile (round-2 verdict #4).

Times, on chip, for NPB class C (n=150k, single-table routed factored):
  - the full factored matvec at df64 and f32 (chained, fenced),
  - V apply alone, VT apply alone, the s-scale alone, per dtype,
  - one full CG chunk (25 CG iters) per dtype,
so the df64-vs-f32 gap can be attributed: kernels (V/VT stage work
doubles: two planes) vs df64 scalar arithmetic (TwoProd/compensated
reductions in dots/axpys). Expert bar: SNU-OCL 3.46 s
(/root/reference/results/ics/all.csv:11).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lilac_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lilac_tpu.kernels.factored import _spmv_any, _spmv_any_df, factored_spmv, factored_spmv_df  # noqa: E402
from lilac_tpu.ops import dfloat as df  # noqa: E402
from lilac_tpu.plan import FactoredNPBPlan  # noqa: E402

REPS = 30
CLS = os.environ.get("LILAC_PROFILE_CLASS", "C")


def fence(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timeit(fn, *args):
    y = fn(*args)
    fence(y)
    t0 = time.perf_counter()
    y = fn(*args)
    fence(y)
    return (time.perf_counter() - t0) / REPS


for dtype in ("df64", "f32"):
    plan = FactoredNPBPlan(CLS, dtype=dtype)
    A = plan.A
    n = plan.shape[0]
    x = plan.vec_in(np.random.default_rng(0).normal(size=n))
    isdf = dtype == "df64"

    def chain(body, v0):
        @jax.jit
        def run(A, v):
            def step(_, vv):
                return body(A, vv)

            return jax.lax.fori_loop(0, REPS, step, v)

        return run

    mv = factored_spmv_df if isdf else factored_spmv
    t_mv = timeit(chain(mv, x), A, x)

    # V alone: x -> t (slot space, shape m != n) — chain in slot space
    def v_only(A, v):
        return (_spmv_any_df if isdf else _spmv_any)(A.V, v)

    t_slots = v_only(A, x)

    def v_loop(A, v):
        # V output lives in row space [n]; feed back directly
        return v_only(A, v)

    t_v = timeit(chain(v_loop, x), A, x)

    def vt_only(A, u):
        return (_spmv_any_df if isdf else _spmv_any)(A.VT, u)

    t_vt = timeit(chain(vt_only, t_slots), A, t_slots)

    def s_only(A, u):
        if isdf:
            s = df.DF(A.s[..., 0], A.s[..., 1])
            return df.mul(s, u)
        return A.s * u

    t_s = timeit(chain(s_only, t_slots), A, t_slots)

    # one CG chunk (25 CG iterations + zeta update)
    from lilac_tpu.generate.npb import CLASSES
    from lilac_tpu.solvers.algebra import get_algebra
    from lilac_tpu.solvers.cg import npb_power_method

    cls = CLASSES[CLS]
    alg = get_algebra(dtype)

    @jax.jit
    def one_outer(A, v):
        return npb_power_method(plan.matvec_with, alg, A, v, cls.shift, 1)

    y = one_outer(A, x)
    fence(y)
    t0 = time.perf_counter()
    y = one_outer(A, x)
    fence(y)
    t_outer = time.perf_counter() - t0

    mv_in_outer = 26 * t_mv  # 25 CG its + 1 residual matvec
    print(
        f"class {CLS} {dtype}: matvec {t_mv * 1e3:.3f} ms "
        f"(V {t_v * 1e3:.3f} + VT {t_vt * 1e3:.3f} + s {t_s * 1e3:.3f}); "
        f"outer-iter {t_outer * 1e3:.1f} ms, 26x matvec = "
        f"{mv_in_outer * 1e3:.1f} ms -> CG scalar ops "
        f"{(t_outer - mv_in_outer) * 1e3:.1f} ms "
        f"({(t_outer - mv_in_outer) / t_outer:.0%} of outer); "
        f"projected wall (75 outers) {75 * t_outer:.2f} s",
        flush=True,
    )

os._exit(0)
