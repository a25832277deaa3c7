"""NPB CG benchmark workload (flagship end-to-end slice).

Reproduces the NAS CG benchmark semantics exactly
(/root/reference/NPB3.3.1/CG/cg.f:53-439): makea matrix, one untimed warm-up
power iteration, then `niter` timed iterations of (25-step CG + ζ update),
verified against the per-class ζ constants to 1e-10 relative (cg.f:363-368).
MOp/s uses NPB's closed-form flop count (cg.f:395-402).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import numpy as np

from lilac_tpu.generate.npb import CLASSES, make_cg_matrix
from lilac_tpu.plan import SpmvPlan
from lilac_tpu.solvers.algebra import get_algebra
from lilac_tpu.solvers.cg import npb_power_method


@dataclasses.dataclass
class NPBCGResult:
    class_name: str
    zeta: float
    zeta_verify: float
    verified: bool
    rel_err: float
    time_s: float
    mops: float
    niter: int
    nnz: int
    dtype: str
    kernel: str
    rnorm_last: float


def nnz_per_row_flops(cls) -> float:
    """NPB's flop model term (cg.f:398-399): nonzer*(nonzer+1) per row."""
    return float(cls.nonzer * (cls.nonzer + 1))


def run(
    class_name: str = "S",
    *,
    dtype: str = "f64",
    kernel: str = "auto",
    niter: Optional[int] = None,
    plan: Optional[SpmvPlan] = None,
    verbose: bool = False,
    steps_per_dispatch: Optional[int] = None,
) -> NPBCGResult:
    cls = CLASSES[class_name.upper()]
    n_it = niter if niter is not None else cls.niter
    if steps_per_dispatch is None:
        from lilac_tpu.config import cfg

        env = cfg().steps_per_dispatch
        if env is not None:
            steps_per_dispatch = int(env)
        elif cls.na <= 20000:
            # small classes are tunnel-latency-bound: run the whole loop as
            # one program (seconds — far under the worker watchdog)
            steps_per_dispatch = n_it
        elif cls.na <= 200000:
            steps_per_dispatch = 15  # ~5s programs on classes B/C
        elif cls.na <= (1 << 21):
            steps_per_dispatch = 3  # class D: keep programs under ~1 min
        else:
            # class E: 26 matvecs/outer-step at ~0.5-1 s each — 3 steps
            # per dispatch exceeded the TPU runtime watchdog and crashed
            # the worker (2026-08-20); one outer step per dispatch stays
            # ~15-30 s
            steps_per_dispatch = 1

    if plan is None:
        if kernel == "factored":
            from lilac_tpu.plan import FactoredNPBPlan

            plan = FactoredNPBPlan(class_name, dtype=dtype)
        else:
            indptr, indices, data, _ = make_cg_matrix(class_name)
            plan = SpmvPlan(
                indptr, indices, data, (cls.na, cls.na), dtype=dtype, kernel=kernel
            )
    alg = get_algebra(dtype)

    # Dispatch in chunks of outer power iterations rather than one giant
    # program: a multi-minute single execution can exceed the TPU runtime's
    # watchdog (observed as worker crashes on classes B/C), and chunking
    # costs only ~ms of launch overhead per chunk. Each chunk is still a
    # fully fused scan(fori_loop) XLA program.
    chunk = max(1, min(steps_per_dispatch, n_it))

    @jax.jit
    def run_chunk(A, x):
        return npb_power_method(plan.matvec_with, alg, A, x, cls.shift, chunk)

    x0 = plan.vec_in(np.ones(cls.na, dtype=np.float64))

    def full_run(x):
        zs, rs = [], []
        x_cur = x
        done = 0
        while done < n_it:
            zetas, rnorms, x_cur = run_chunk(plan.A, x_cur)
            # chunks chain through x_cur, so execution is already strictly
            # sequential; keep histories as device futures and fetch once
            # at the end (one host readback fences everything — under the
            # axon tunnel block_until_ready can return early, D2H cannot)
            zs.append(zetas)
            rs.append(rnorms)
            done += chunk
        zh = np.concatenate([_scalars_to_f64(z, dtype) for z in zs])[:n_it]
        rh = np.concatenate([_scalars_to_f64(r, dtype) for r in rs])[:n_it]
        return zh, rh, x_cur

    # untimed warm-up iteration (cg.f:233-272) doubles as compile warm-up
    _ = run_chunk(plan.A, x0)
    _scalars_to_f64(_[0], dtype)

    t0 = time.perf_counter()
    zeta_hist, rnorm_hist_arr, xf = full_run(x0)
    t = time.perf_counter() - t0

    rnorm_hist = rnorm_hist_arr
    zeta = float(zeta_hist[-1])
    rel_err = abs(zeta - cls.zeta_verify) / cls.zeta_verify
    verified = rel_err <= 1e-10

    term = nnz_per_row_flops(cls)
    mflops = (
        2.0 * n_it * cls.na * (3.0 + term + 25.0 * (5.0 + term) + 3.0) / t / 1e6
    )

    if verbose:
        for i, (zv, rv) in enumerate(zip(zeta_hist, rnorm_hist)):
            print(f"  it {i + 1:4d}  rnorm {rv:.14e}  zeta {zv:.13f}")

    return NPBCGResult(
        class_name=cls.name,
        zeta=zeta,
        zeta_verify=cls.zeta_verify,
        verified=verified,
        rel_err=rel_err,
        time_s=t,
        mops=mflops,
        niter=n_it,
        nnz=plan.nnz,
        dtype=dtype,
        kernel=plan.kernel,
        rnorm_last=float(rnorm_hist[-1]),
    )


def _scalars_to_f64(arr, dtype: str) -> np.ndarray:
    from lilac_tpu.ops import dfloat as df

    if dtype == "df64":
        return df.to_f64(arr)
    return np.asarray(arr, dtype=np.float64)


def print_report(r: NPBCGResult) -> str:
    """The NPB report card (common/print_results.f layout)."""
    card = f"""
 CG Benchmark Completed (lilac_tpu)
 Class           =             {r.class_name:>12s}
 Size            =             {r.niter and CLASSES[r.class_name].na:>12d}
 Iterations      =             {r.niter:>12d}
 Time in seconds =             {r.time_s:>12.2f}
 Mop/s total     =             {r.mops:>12.2f}
 Operation type  =   floating point ({r.dtype})
 Verification    =             {"SUCCESSFUL" if r.verified else "UNSUCCESSFUL":>12s}
 Zeta            =             {r.zeta:>20.13E}
 Kernel          =             {r.kernel:>12s}
"""
    print(card)
    return card
