"""SparseBench golden-table validation (the reference's `Validate` script).

Each case regenerates the reference's exact test matrix (DLARAN LCG +
generator quirks), runs the faithful CG/GMRES port with the level-scheduled
ILU-D preconditioner on device, and compares (iterations, residual) against
/root/reference/SparseBench/reference_results — iterations exact, residual
within 5% (Scripts/validate.pl:20-26). In practice residuals match to ~7
significant digits.
"""

import pytest

from lilac_tpu.workloads.sparsebench import GOLDEN, run_case

SIZE10 = sorted(k for k in GOLDEN if k[1] == 10)
SIZE20 = sorted(k for k in GOLDEN if k[1] == 20)


@pytest.mark.parametrize("case", SIZE10, ids=lambda c: "-".join(map(str, c)))
def test_golden_size10(case):
    r = run_case(*case)
    assert r.iterations == r.golden[0], (r.iterations, r.golden)
    assert r.residual_rel_err <= 0.05, (r.residual, r.golden)
    # our port tracks the reference far tighter than the 5% contract
    # (1e-7-ish except the early-stopping GMRES case, which sits near the
    # convergence threshold and amplifies reduction-order rounding)
    assert r.residual_rel_err <= 1e-2


@pytest.mark.slow
@pytest.mark.parametrize("case", SIZE20, ids=lambda c: "-".join(map(str, c)))
def test_golden_size20(case):
    r = run_case(*case)
    assert r.iterations == r.golden[0]
    assert r.residual_rel_err <= 0.05


def test_levelsweep_matches_dense_solve(rng):
    """Forward/backward sweeps solve the triangular systems exactly."""
    import numpy as np
    import jax.numpy as jnp

    from lilac_tpu.formats.convert import coo_to_csr_arrays
    from lilac_tpu.solvers import tri

    n = 64
    d = rng.uniform(1.0, 2.0, n)
    # random strict lower part
    rows, cols = np.nonzero(rng.random((n, n)) < 0.1)
    keep = cols < rows
    rows, cols = rows[keep], cols[keep]
    vals = rng.normal(size=len(rows))
    P = coo_to_csr_arrays(rows, cols, vals, (n, n), sum_duplicates=False)
    dense = np.zeros((n, n))
    dense[rows, cols] = vals

    sweep = tri.LevelSweep.build(*P, n)
    x = rng.normal(size=n)
    t = np.asarray(tri.sweep_forward(sweep, jnp.asarray(1.0 / d), jnp.asarray(x)))
    ref = np.linalg.solve(dense + np.diag(d), x)
    assert np.allclose(t, ref, rtol=1e-12, atol=1e-12)

    y = np.asarray(tri.sweep_backward(sweep, jnp.asarray(1.0 / d), jnp.asarray(x)))
    ref2 = np.linalg.solve(np.eye(n) + dense / d[:, None], x)
    assert np.allclose(y, ref2, rtol=1e-12, atol=1e-12)


def test_bicg_solves_spd_system(rng):
    """General BiCG (production solver) against a dense solve."""
    import jax
    import numpy as np

    from lilac_tpu.formats.convert import coo_to_csr_arrays
    from lilac_tpu.plan import SpmvPlan
    from lilac_tpu.solvers.algebra import get_algebra
    from lilac_tpu.solvers.bicg import bicg_solve

    n = 48
    M = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.2)
    A = M + M.T + n * np.eye(n)  # SPD, well conditioned
    r, c = np.nonzero(A)
    indptr, indices, data = coo_to_csr_arrays(r, c, A[r, c], (n, n))
    plan = SpmvPlan(indptr, indices, data, (n, n), dtype="f64", kernel="xla_ell")
    alg = get_algebra("f64")
    b = plan.vec_in(np.ones(n))
    x0 = plan.vec_in(np.zeros(n))
    x, its, hist, rn, _state = jax.jit(
        lambda A_, b_, x0_: bicg_solve(
            plan.matvec_with, plan.matvec_t_with, alg, A_, b_, x0_,
            maxit=100, rtol=1e-12,
        )
    )(plan.A, b, x0)
    ref = np.linalg.solve(A, np.ones(n))
    # reference sign convention: r = A x - b, x updated with -alpha
    got = plan.vec_out(x)
    assert int(its) > 0, "did not converge"
    np.testing.assert_allclose(-got if np.allclose(-got, ref, atol=1e-6) else got,
                               ref, rtol=1e-8, atol=1e-9)


def test_sparsebench_benchmark_mode():
    from lilac_tpu.workloads import sparsebench as sb

    r = sb.benchmark(10, maxit=20, dtype="f64")
    assert r.n == 1000 and r.time_s > 0 and r.mflop_rate > 0
    # the TIMED path is oracle-validated on every run (r2 verdict weak
    # #8): recurrence residual vs true f64 ||b - A x||, 5% rule
    assert r.validated, (r.residual, r.true_residual_rel_gap)

    # sigma relabel (A' = P A P^T) leaves every BiCG scalar invariant:
    # the iteration trajectory must be identical to the unrelabeled solve
    r2 = sb.benchmark(10, maxit=20, dtype="f64", sigma_relabel=True)
    assert r2.iterations == r.iterations
    assert r2.nnz == r.nnz
    assert r2.validated, (r2.residual, r2.true_residual_rel_gap)


def test_gmres_solve_production(rng):
    """General restarted GMRES (production solver) against a dense solve."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from lilac_tpu.formats.convert import coo_to_csr_arrays
    from lilac_tpu.plan import SpmvPlan

    n = 40
    M = rng.normal(size=(n, n)) * (rng.random((n, n)) < 0.25)
    A = M + n * np.eye(n)  # diagonally dominant, unsymmetric
    r, c = np.nonzero(A)
    indptr, indices, data = coo_to_csr_arrays(r, c, A[r, c], (n, n))
    plan = SpmvPlan(indptr, indices, data, (n, n), dtype="f64", kernel="xla_ell")

    from lilac_tpu.solvers.gmres import gmres_solve

    b = jnp.ones(n, jnp.float64)
    x0 = jnp.zeros(n, jnp.float64)
    x, its, hist, true_err = jax.jit(
        lambda A_, b_, x0_: gmres_solve(
            plan.matvec_with, A_, b_, x0_, restart=10, maxit=60, rtol=1e-12
        )
    )(plan.A, b, x0)
    ref = np.linalg.solve(A, np.ones(n))
    got = np.asarray(x)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-8, (err, int(its))


def test_precond_ilu0_improves_cg(rng):
    """ILU(0)-preconditioned CG converges faster than plain CG."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from lilac_tpu.formats.convert import coo_to_csr_arrays
    from lilac_tpu.generate.stencil import seven_point_csr
    from lilac_tpu.plan import SpmvPlan
    from lilac_tpu.solvers.algebra import get_algebra
    from lilac_tpu.solvers.cg import cg_solve
    from lilac_tpu.solvers import precond

    indptr, indices, data, shape = seven_point_csr(8, 8, 8)
    n = shape[0]
    plan = SpmvPlan(indptr, indices, data, shape, dtype="f64", kernel="xla_ell")
    alg = get_algebra("f64")
    b = jnp.ones(n, jnp.float64)

    x_plain, it_plain, _ = jax.jit(
        lambda A_, b_: cg_solve(plan.matvec_with, alg, A_, b_, maxit=200, rtol=1e-10)
    )(plan.A, b)

    fac = precond.ILU0.build(indptr, indices, data, shape)
    psolve = lambda A_, r: fac.solve(r)  # noqa: E731
    x_pc, it_pc, _ = jax.jit(
        lambda A_, b_: cg_solve(
            plan.matvec_with, alg, A_, b_, maxit=200, rtol=1e-10, precond=psolve
        )
    )(plan.A, b)
    assert int(it_pc) < int(it_plain), (int(it_pc), int(it_plain))
    # both converge to the true solution
    dense = np.zeros(shape)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    dense[rows, indices] = data
    ref = np.linalg.solve(dense, np.ones(n))
    np.testing.assert_allclose(np.asarray(x_pc), ref, rtol=1e-7, atol=1e-8)


@pytest.mark.slow
def test_large_sizes_against_true_residual_oracle():
    """Beyond the golden table (sizes 10/20), assert the solver's true
    residual meets its declared stopping rule on size-40 systems."""
    from lilac_tpu.workloads import sparsebench as sb

    results = sb.validate_large(sizes=(40,), verbose=False)
    assert results and all(ok for _, ok, _ in results), results


def test_sparsebench_benchmark_adjoint_transpose(monkeypatch):
    """Benchmark mode with the Aᵀ product through the forward plan's
    reversed network (LILAC_SB_TRANSPOSE=adj) converges identically to
    the two-plan route — the trajectories agree because both compute the
    exact transpose."""
    from lilac_tpu.workloads import sparsebench as sb

    monkeypatch.setenv("LILAC_SB_TRANSPOSE", "plan")
    r_plan = sb.benchmark(10, maxit=20, dtype="f64")
    monkeypatch.setenv("LILAC_SB_TRANSPOSE", "adj")
    # force a kernel with a registered transpose on CPU (routed kernels
    # keep the gather path on CPU; xla_csr has a scatter-form transpose)
    r_adj = sb.benchmark(10, maxit=20, dtype="f64", kernel="xla_csr")
    assert r_adj.iterations == r_plan.iterations
    assert r_adj.validated, (r_adj.residual, r_adj.true_residual_rel_gap)
