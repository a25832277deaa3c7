"""SparseBench workload (Dongarra/Eijkhout/van der Vorst 0.9.7).

End-to-end reproduction of the reference benchmark's validated protocol
(/root/reference/SparseBench/Validate, Scripts/validate.pl:14-27):
for each (sym, size, structure, preconditioner) case, run the solver with
maxit=10 / rtol=1e-6 on the exactly-regenerated test matrix and report
(iterations, last residual) — matched against the shipped golden table
`reference_results` (iterations exact, residual within 5%).

Structures: 1 = regular 7-point 3D stencil, 2 = random CRS.
Preconditioners: 0 = none, 2 = ILU-D, 3 = block-Jacobi (structure 1 only),
4 = line-ILU (structure 1 only, iter.f:360-369 — not in the golden table;
validated against the loop-level oracle in tests instead).
Symmetric cases run CG (iter_symm.f), unsymmetric run GMRES(restart=maxit)
(iter.f; the Test harness pipes method=2, /root/reference/SparseBench/Test:84).

Matvec runs through the framework's SpMV kernels; ILU-D triangular sweeps
run level-scheduled on device (lilac_tpu.solvers.tri).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lilac_tpu.generate import sparsebench_gen as gen
from lilac_tpu.solvers import sb_iter, tri

MAXIT = 10  # main_symm.f:25 (the validated runs; the general driver's knob)
RTOL = 1e-6  # main_symm.f:353 / main.f:365

# /root/reference/SparseBench/reference_results — golden
# (sym, size, structure, precond) -> (iterations, final residual)
GOLDEN: Dict[Tuple[str, int, int, int], Tuple[int, float]] = {
    ("s", 10, 1, 0): (10, 0.4431805e02),
    ("s", 10, 1, 2): (10, 0.3228609e02),
    ("s", 10, 1, 3): (10, 0.5332104e02),
    ("s", 20, 1, 0): (10, 0.1210367e03),
    ("s", 20, 1, 2): (10, 0.1194823e03),
    ("s", 20, 1, 3): (10, 0.1158542e03),
    ("s", 10, 2, 0): (10, 0.2054096e01),
    ("s", 10, 2, 2): (10, 0.1125013e-02),
    ("s", 20, 2, 0): (10, 0.6497621e01),
    ("s", 20, 2, 2): (10, 0.8595296e-02),
    ("u", 10, 1, 0): (10, 0.1272991e02),
    ("u", 10, 1, 2): (10, 0.1452494e00),
    ("u", 10, 1, 3): (10, 0.3890641e01),
    ("u", 20, 1, 0): (10, 0.5875211e02),
    ("u", 20, 1, 2): (10, 0.2006042e02),
    ("u", 20, 1, 3): (10, 0.4298484e02),
    ("u", 10, 2, 0): (10, 0.6282183e00),
    ("u", 10, 2, 2): (8, 0.8562056e-05),
    ("u", 20, 2, 0): (10, 0.2737278e01),
    ("u", 20, 2, 2): (9, 0.5823916e-04),
}


@dataclasses.dataclass
class SBResult:
    sym: str
    size: int
    structure: int
    precond: int
    iterations: int
    residual: float
    golden: Optional[Tuple[int, float]]
    iterations_match: Optional[bool]
    residual_rel_err: Optional[float]
    time_s: float
    nnz: int

    @property
    def validated(self) -> Optional[bool]:
        if self.golden is None:
            return None
        return bool(self.iterations_match) and self.residual_rel_err <= 0.05


def build_case(sym: str, size: int, structure: int, precond: int):
    """Returns (matvec, psolve, n, nnz) as jit-compatible closures."""
    is_sym = sym == "s"
    if structure == 1:
        system, Lcsr, Ucsr = gen.regular_parts(
            size, sym=is_sym, bjacobi=(precond == 3)
        )
    elif structure == 2:
        if precond in (3, 4):
            raise ValueError(
                "block-Jacobi/line-ILU are structure-1 only "
                "(main_symm.f:228, iter.f:371-373)"
            )
        system = gen.crs_system(size, sym=is_sym)
        Lcsr, Ucsr = system["L"], system["U"]
    else:
        raise ValueError(structure)

    indptr, indices, data, shape = system["A"]
    n = shape[0]
    from lilac_tpu.formats.convert import csr_device
    from lilac_tpu.kernels.xla import csr_spmv

    A = csr_device(indptr, indices, data, shape, dtype=np.float64)

    def matvec(x):
        return csr_spmv(A, x)

    psolve = None
    if precond in (2, 3):
        dinv = jnp.asarray(1.0 / system["diag"])
        Ls = tri.LevelSweep.build(*Lcsr, n)
        Us = tri.LevelSweep.build(*Ucsr, n)
        psolve = tri.make_ilu_d(dinv, Ls, Us)
    elif precond == 1:
        dinv = jnp.asarray(1.0 / system["diag"])
        psolve = lambda x: dinv * x  # noqa: E731  (pointwise Jacobi)
    elif precond == 4:
        from lilac_tpu.solvers.line_ilu import LineILU

        psolve = LineILU.build(system["bands"]).apply
    return matvec, psolve, n, len(indices)


def run_case(
    sym: str, size: int, structure: int, precond: int, *, maxit=MAXIT, rtol=RTOL
) -> SBResult:
    matvec, psolve, n, nnz = build_case(sym, size, structure, precond)
    b = jnp.ones(n, jnp.float64)

    t0 = time.perf_counter()
    if sym == "s":
        _, hist, _ = jax.jit(
            lambda b: sb_iter.sb_cg(matvec, b, maxit=maxit, rtol=rtol, psolve=psolve)
        )(b)
    else:
        _, hist = jax.jit(
            lambda b: sb_iter.sb_gmres(
                matvec, b, restart=maxit, maxit=maxit, tol=rtol, psolve=psolve
            )
        )(b)
    hist = np.asarray(hist, dtype=np.float64)
    t = time.perf_counter() - t0

    # Validate extraction rule (Validate:37-47): last history entry > 1e-12
    nz = np.nonzero(hist > 1e-12)[0]
    if len(nz) == 0:
        iterations, residual = 0, 0.0
    else:
        iterations, residual = int(nz[-1]) + 1, float(hist[nz[-1]])

    golden = GOLDEN.get((sym, size, structure, precond))
    it_match = rel = None
    if golden is not None:
        it_match = iterations == golden[0]
        rel = abs(residual - golden[1]) / golden[1]
    return SBResult(
        sym=sym,
        size=size,
        structure=structure,
        precond=precond,
        iterations=iterations,
        residual=residual,
        golden=golden,
        iterations_match=it_match,
        residual_rel_err=rel,
        time_s=t,
        nnz=nnz,
    )


def validate(sizes=(10, 20), verbose=True):
    """Run the full golden suite (the reference's `Validate` script)."""
    results = []
    for sym in ("s", "u"):
        for structure in (1, 2):
            precs = (0, 2, 3) if structure == 1 else (0, 2)
            for size in sizes:
                for prec in precs:
                    r = run_case(sym, size, structure, prec)
                    results.append(r)
                    if verbose:
                        ok = {True: "ok", False: "FAIL", None: "----"}[r.validated]
                        print(
                            f"{sym} {size:3d} {structure} {prec}  it={r.iterations:3d}"
                            f" res={r.residual:.7e}  [{ok}]"
                        )
    return results


def validate_large(sizes=(40,), *, rtol=RTOL, maxit=MAXIT, verbose=True):
    """Oracle validation beyond the shipped golden table.

    The reference ships `reference_results` only for sizes 10/20
    (/root/reference/SparseBench/reference_results:1-20), and at larger
    sizes the unpreconditioned solves do not converge within maxit=100
    (the reference benchmarks Mflop rate, not convergence). The oracle
    property that still pins correctness: the solver's RECURRENCE
    residual (CG) / error estimate (GMRES, exact-arithmetic residual
    norm by construction) must agree with the TRUE residual
    ||b - A x_returned|| recomputed in f64 against the host CSR — they
    are produced by entirely different computational paths and only
    coincide if the matrix, kernels, and update order are right. The 5%%
    tolerance matches the reference Validate's residual rule
    (Scripts/validate.pl:20-26). Returns [(case, ok, rel_gap)].
    """
    import scipy.sparse as sp

    from lilac_tpu.generate import sparsebench_gen as gen
    from lilac_tpu.solvers import sb_iter

    out = []
    for sym in ("s",):
        # unsymmetric cases use the faithful sb_gmres port, whose
        # O(restart^2)-unrolled Gram-Schmidt (kept for golden fidelity at
        # sizes 10/20) does not scale to n=64k systems; the production
        # scan-based GMRES/BiCG have their own dense-oracle tests
        # (tests/test_sparsebench.py) and carry the large-size duty
        for structure in (1, 2):
            for size in sizes:
                is_sym = sym == "s"
                if structure == 1:
                    system, _, _ = gen.regular_parts(size, sym=is_sym)
                else:
                    system = gen.crs_system(size, sym=is_sym)
                indptr, indices, data, shape = system["A"]
                Ah = sp.csr_matrix((data, indices, indptr), shape=shape)
                from lilac_tpu.formats.convert import csr_device
                from lilac_tpu.kernels.xla import csr_spmv

                Ad = csr_device(indptr, indices, data, shape, dtype=np.float64)
                b = jnp.ones(shape[0], jnp.float64)
                if is_sym:
                    x, hist, _ = jax.jit(
                        lambda b: sb_iter.sb_cg(
                            lambda v: csr_spmv(Ad, v), b, maxit=maxit, rtol=rtol
                        )
                    )(b)
                else:
                    x, hist = jax.jit(
                        lambda b: sb_iter.sb_gmres(
                            lambda v: csr_spmv(Ad, v),
                            b,
                            restart=maxit,
                            maxit=maxit,
                            tol=rtol,
                        )
                    )(b)
                xh = np.asarray(x, dtype=np.float64)
                bh = np.ones(shape[0])
                histh = np.asarray(hist, dtype=np.float64)
                nz = np.nonzero(histh > 1e-12)[0]
                if is_sym:
                    # independent host replica of the exact CG recurrence
                    # (iter_symm.f order); histories must track within 5%
                    ref_hist = _host_sb_cg_hist(Ah, bh, len(nz))
                    got = histh[: len(nz)]
                    rel_gap = float(
                        np.max(np.abs(got - ref_hist) / np.abs(ref_hist))
                    )
                else:
                    # GMRES: the error estimate at the stopping iteration
                    # equals the true residual in exact arithmetic
                    # (iter.f:232-266) — recompute it through A
                    true_res = float(np.linalg.norm(bh - Ah @ xh))
                    claimed = float(histh[nz[-1]]) if len(nz) else float(
                        np.linalg.norm(bh)
                    )
                    rel_gap = abs(true_res - claimed) / max(claimed, 1e-30)
                ok = rel_gap <= 0.05
                out.append(((sym, size, structure), ok, rel_gap))
                if verbose:
                    print(
                        f"{sym} {size:3d} {structure}  rel_gap={rel_gap:.3e}"
                        f" [{'ok' if ok else 'FAIL'}]"
                    )
    return out


def _host_sb_cg_hist(Ah, b, nit):
    """NumPy replica of sb_iter.sb_cg's residual history (same update
    order as iter_symm.f:18-96; x0 = 0, r = A x - b)."""
    x = np.zeros(len(b))
    r = -b.copy()
    p = np.zeros(len(b))
    rr_prev = 1.0
    hist = []
    for it in range(1, nit + 1):
        hist.append(np.linalg.norm(r))
        rr = float(r @ r)
        p = r if it == 1 else r + (rr / rr_prev) * p
        ap = Ah @ p
        alpha = rr / float(p @ ap)
        x = x - alpha * p
        r = r - alpha * ap
        rr_prev = rr
    return np.asarray(hist)


# ---------------------------------------------------------------------------
# benchmark mode — the timed run_all path (big_gen matrices, BiCG)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SBBenchResult:
    size: int
    n: int
    nnz: int
    iterations: int
    time_s: float
    mflop_rate: float
    kernel: str
    # every timed run is oracle-validated (round-2 verdict: "no single
    # code path is both golden-validated and benchmarked" — the golden
    # table only covers the CG/GMRES validate protocol at sizes 10/20,
    # in the reference too): the recurrence residual must agree with the
    # true ||b - A x|| recomputed in f64 against the host CSR, the same
    # 5% rule as Scripts/validate.pl:20-26 / validate_large.
    residual: float = float("nan")
    true_residual_rel_gap: float = float("nan")

    @property
    def validated(self) -> bool:
        return self.true_residual_rel_gap <= 0.05


def build_bench_plans(size: int, *, dtype="df64", seed=0, kernel="auto",
                      sigma_relabel=None):
    """Stage the benchmark-mode operator pair (A, Aᵀ as its own forward
    plan). Split out of benchmark() so a host-only job can pre-build the
    routed plan disk caches without touching the device. Returns
    (plan, plan_t, n, (indptr, indices, data, shape)) — the host CSR is
    handed back so callers can run f64 validation against it."""
    from lilac_tpu.generate.random_crs import random_crs
    from lilac_tpu.plan import SpmvPlan, transposed_plan

    indptr, indices, data, shape = random_crs(size, seed=seed)
    n = shape[0]
    if sigma_relabel is None:
        sigma_relabel = kernel.startswith("routed")
    if sigma_relabel:
        from lilac_tpu.formats.convert import length_relabel_csr

        indptr, indices, data, _order, _rank = length_relabel_csr(
            indptr, indices, data, shape
        )
    from lilac_tpu.config import cfg as _cfg

    conf = _cfg()
    ck = ckt = None
    if kernel.startswith("routed"):
        # key the routed-plan disk cache on everything that shapes the
        # container: matrix identity, relabel, and the hier knobs
        g = conf.hier_gmax if conf.hier_gmax is not None else "a"
        tag = f"sb{size}s{seed}r{int(sigma_relabel)}bl{conf.hier_bl}g{g}"
        ck, ckt = tag + "_F", tag + "_T"
    plan = SpmvPlan(indptr, indices, data, shape, dtype=dtype, kernel=kernel,
                    cache_key=ck)
    # Aᵀp for BiCG: 'adj' (default for routed kernels) runs the FORWARD
    # plan's network in reverse with add-merges — zero extra plan bytes,
    # half the plan build/upload (the registry transpose slot,
    # kernels/routed.py hier_apply_batched_t); 'plan' stages the true
    # transpose as its own forward plan (the reference's BiCG silently
    # substitutes A for Aᵀ instead, SURVEY.md section 3.5).
    tmode = conf.sb_transpose
    if tmode == "auto":
        tmode = "adj" if plan.kernel.startswith("routed") else "plan"
    if tmode == "adj":
        plan_t = None
    else:
        plan_t = transposed_plan(indptr, indices, data, shape, dtype=dtype,
                                 kernel=kernel, cache_key=ckt)
    return plan, plan_t, n, (indptr, indices, data, shape)


def benchmark(size: int, *, maxit=100, rtol=1e-6, dtype="df64", seed=0,
              kernel="auto", sigma_relabel=None) -> SBBenchResult:
    """The reference's benchmark protocol (SparseBench/run_all:36-42): a
    big_gen random CRS matrix (big_gen.py:59-83 semantics), BiCG with
    maxit=100 / rtol=1e-6, x0=0, b=1 (main.f:341-345), scraped metric =
    Mflop rate (main.f:523-556). Flops use the reference's per-op model:
    4·nnz−2n per mat+matᵀ pair and 2n per dot/axpy.

    sigma_relabel (default: on for routed kernels): solve the
    row/column-relabeled system A' = P A Pᵀ with P ordering rows by
    descending length, so the FORWARD routed plan's rows arrive
    pre-sorted and its per-matvec un-permute gather vanishes (one-sided:
    A'ᵀ column counts are not sorted, so the transpose plan keeps its
    own ordering). Permutations preserve every BiCG scalar (dots, norms,
    residuals) and b = ones is permutation-invariant, so iteration count
    and history are unchanged — only the unreturned x would need a final
    un-permute."""
    import jax

    from lilac_tpu.config import enable_compile_cache
    from lilac_tpu.solvers.algebra import get_algebra
    from lilac_tpu.solvers.bicg import bicg_solve

    enable_compile_cache()
    plan, plan_t, n, host_csr = build_bench_plans(
        size, dtype=dtype, seed=seed, kernel=kernel,
        sigma_relabel=sigma_relabel,
    )
    alg = get_algebra(dtype)
    b = plan.vec_in(np.ones(n))
    x0 = plan.vec_in(np.zeros(n))

    # chunked dispatch: long single executions exceed the TPU worker
    # watchdog at multi-million-row sizes (same discipline as npb_cg).
    # Budget row-iterations per dispatch so device programs stay well
    # under the ~1 min watchdog: hierarchical routed kernels stream the
    # whole plan (hundreds of MB of masks) per matvec, so they get a
    # 10x tighter budget — the 500M budget put all 100 sb160 iterations
    # in one dispatch and the worker crashed mid-execution (2026-08-19).
    per_dispatch = 50_000_000 if plan.kernel.startswith("routed_hier") else 500_000_000
    chunk = min(maxit, max(1, per_dispatch // max(n, 1)))

    if plan_t is None:
        matvec_t = lambda _A, v: plan.matvec_t_with(_A[0], v)  # noqa: E731
        As = (plan.A,)
    else:
        matvec_t = lambda _A, v: plan_t.matvec_with(_A[1], v)  # noqa: E731
        As = (plan.A, plan_t.A)

    @jax.jit
    def solve_to(As, b, state, limit):
        return bicg_solve(
            lambda _A, v: plan.matvec_with(_A[0], v),
            matvec_t,
            alg, As, b, x0, maxit=maxit, rtol=rtol,
            state=state, stop_at=limit,
        )

    def full():
        state = None
        limit = chunk
        while True:
            x, its, hist, rn, state = solve_to(As, b, state, jnp.int32(limit))
            done = int(np.asarray(state[6])) >= maxit or bool(np.asarray(state[7]))
            if done or limit >= maxit:
                break
            limit = min(maxit, limit + chunk)
        return x, int(its), hist, rn

    x, its, hist, rn = full()  # warm-up + compile
    t0 = time.perf_counter()
    x, its, hist, rn = full()
    t = time.perf_counter() - t0

    nit = abs(its)
    flops = nit * (2 * (2.0 * plan.nnz) + 10.0 * n) + 2.0 * plan.nnz
    # oracle-validate the TIMED path itself (see SBBenchResult): true
    # residual in f64 on host vs the solver's recurrence residual
    import scipy.sparse as sp

    ip, ix, dv, shp = host_csr
    Ah = sp.csr_matrix((dv, ix, ip), shape=shp)
    xh = plan.vec_out(x)
    true_res = float(np.linalg.norm(np.ones(n) - Ah @ xh))
    if dtype == "df64":
        from lilac_tpu.ops import dfloat as _df

        rec_res = float(_df.to_f64(rn))
    else:
        rec_res = float(np.asarray(rn))
    gap = abs(true_res - rec_res) / max(true_res, 1e-300)
    return SBBenchResult(
        size=size, n=n, nnz=plan.nnz, iterations=its, time_s=t,
        mflop_rate=flops / t / 1e6, kernel=plan.kernel,
        residual=rec_res, true_residual_rel_gap=gap,
    )
