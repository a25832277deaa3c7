"""PageRank power iteration (reference workload parity).

Semantics of /root/reference/pagerank/main.cpp:101-155: the matrix is
column-normalised then pre-scaled by the damping factor d=0.85; each
iteration computes y = (d·M)·x, adds (1−d)·mean(x), and tracks the l2
step difference ||x_new − x||. 1024 iterations per run, 5 timed runs.

TPU-shaped: the whole iteration loop is one lax.fori_loop inside jit — no
per-iteration host dispatch (the reference pays a dlopen'd function call
per iteration, main.cpp:138).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lilac_tpu.plan import SpmvPlan


def normalise_columns(indptr, indices, data, shape):
    """Column-stochastic normalisation (mm::normalise in the reference):
    divide each entry by its column sum; empty columns left untouched."""
    colsum = np.zeros(shape[1], dtype=np.float64)
    np.add.at(colsum, indices, data)
    scale = np.where(colsum != 0.0, 1.0 / np.where(colsum == 0, 1.0, colsum), 1.0)
    return data * scale[indices]


@dataclasses.dataclass
class PageRankResult:
    x: np.ndarray
    error: float
    iters: int
    times_s: list
    nnz: int


def run(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    shape,
    *,
    d: float = 0.85,
    iters: int = 1024,
    runs: int = 5,
    dtype: str = "f32",
    seed: int = 0,
    x0: Optional[np.ndarray] = None,
    kernel: str = "auto",
    plan: Optional[SpmvPlan] = None,
    relabel: Optional[bool] = None,
) -> PageRankResult:
    """plan: optional pre-staged SpmvPlan built from the ALREADY
    column-normalised-and-d-scaled values (scale_values) — lets callers
    (bench ingest) time the marshalling phase separately.

    relabel (default: on for routed kernels): iterate on the similarity
    A' = P A Pᵀ with rows length-sorted so the routed plan's per-matvec
    un-permute network vanishes (formats.convert.length_relabel_csr).
    The iteration map commutes with P — y = (dM)x + (1−d)·mean and the
    step-difference norm are permutation-equivariant — so the fixed
    point and error history are identical; x is mapped back on return."""
    n = shape[0]
    if relabel and plan is not None:
        raise ValueError(
            "relabel=True cannot apply to a pre-staged plan — stage the "
            "plan from length_relabel_csr arrays instead"
        )
    if relabel is None:
        relabel = kernel.startswith("routed") and plan is None
    order = None
    if plan is None:
        scaled = normalise_columns(indptr, indices, data, shape) * d
        if relabel:
            from lilac_tpu.formats.convert import length_relabel_csr

            indptr, indices, scaled, order, _rank = length_relabel_csr(
                indptr, indices, scaled, shape
            )
        plan = SpmvPlan(
            indptr, indices, scaled, shape, dtype=dtype, kernel=kernel,
            reuse="many",
        )

    if x0 is None:
        rng = np.random.default_rng(seed)
        x0 = rng.random(n)
        x0 /= x0.sum()
    if order is not None:
        x0 = np.asarray(x0)[order]

    @jax.jit
    def run_iters(A, x):
        # A threaded through so jit treats the matrix as an argument
        def body_(i, carry):
            x, _ = carry
            mean = jnp.sum(x) / n
            y = plan.matvec_with(A, x) + (1.0 - d) * mean
            err = jnp.sqrt(jnp.sum((y - x) ** 2))
            return (y, err)
        return jax.lax.fori_loop(0, iters, body_, (x, jnp.asarray(0.0, x.dtype)))

    xd = plan.vec_in(x0)
    xf, err = run_iters(plan.A, xd)
    jax.block_until_ready(xf)

    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        xf, err = run_iters(plan.A, xd)
        err_v = float(np.asarray(err))  # host readback forces completion
        times.append(time.perf_counter() - t0)

    x_out = plan.vec_out(xf)
    if order is not None:
        x_nat = np.empty_like(x_out)
        x_nat[order] = x_out
        x_out = x_nat
    return PageRankResult(
        x=x_out, error=err_v, iters=iters, times_s=times, nnz=plan.nnz
    )
