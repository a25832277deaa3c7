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
) -> NPBCGResult:
    cls = CLASSES[class_name.upper()]
    n_it = niter if niter is not None else cls.niter

    if plan is None:
        indptr, indices, data, _ = make_cg_matrix(class_name)
        plan = SpmvPlan(indptr, indices, data, (cls.na, cls.na), dtype=dtype)
    alg = get_algebra(dtype)

    def full_run(A, x0):
        return npb_power_method(plan.matvec_with, alg, A, x0, cls.shift, n_it)

    runner = jax.jit(full_run)

    x0 = plan.vec_in(np.ones(cls.na, dtype=np.float64))

    # untimed warm-up iteration (cg.f:233-272) doubles as compile warm-up.
    # Timing forces a host readback of the scalar history: under the axon
    # TPU tunnel block_until_ready can return before execution completes,
    # so device->host transfer is the only trustworthy completion fence.
    zetas, rnorms, xf = runner(plan.A, x0)
    _scalars_to_f64(zetas, dtype)

    t0 = time.perf_counter()
    zetas, rnorms, xf = runner(plan.A, x0)
    zeta_hist = _scalars_to_f64(zetas, dtype)
    t = time.perf_counter() - t0

    rnorm_hist = _scalars_to_f64(rnorms, dtype)
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
