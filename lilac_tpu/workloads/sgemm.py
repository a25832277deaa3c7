"""Parboil sgemm workload: C = A·Bᵀ on column-major text matrices.

Reference: /root/reference/parboil/benchmarks/sgemm/src/base/main.cc:40-95 —
read A [m,k] and Bᵀ [n,k] (column-major text, io.cc:17-37), one GEMM through
the mm_harness ABI (sgemm_kernel.cc:16-28), write C column-major and print
GFLOPs (main.cc:94). Golden comparison uses the parboil float tolerance.
The medium dataset's blobs are stripped from the reference checkout
(.MISSING_LARGE_BLOBS:2-6), so tests run on synthetic matrices against a
float64 oracle.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np


@dataclasses.dataclass
class SgemmResult:
    m: int
    n: int
    k: int
    time_s: float
    gflops: float
    kernel: str


def read_col_major(path: str):
    """io.cc:17-37: 'rows cols' then rows*cols floats, column-major."""
    toks = open(path).read().split()
    nr, nc = int(toks[0]), int(toks[1])
    v = np.asarray([float(t) for t in toks[2 : 2 + nr * nc]], dtype=np.float32)
    return v.reshape((nc, nr)).T  # column-major -> [nr, nc]


def write_col_major(path: str, mat: np.ndarray) -> None:
    nr, nc = mat.shape
    with open(path, "w") as f:
        f.write(f"{nr} {nc} ")
        f.write(" ".join(repr(float(x)) for x in mat.T.ravel()))
        f.write("\n")


def run_arrays(A: np.ndarray, BT: np.ndarray, kernel: str = "pallas") -> tuple:
    """C = A @ BT.T. Returns (C, SgemmResult)."""
    import jax
    import jax.numpy as jnp

    from lilac_tpu.kernels import pallas_gemm

    m, k = A.shape
    n, _ = BT.shape
    a = jnp.asarray(A, jnp.float32)
    bt = jnp.asarray(BT, jnp.float32)
    fn = pallas_gemm.matmul_nt if kernel == "pallas" else pallas_gemm.matmul_nt_xla
    f = jax.jit(fn)
    C = f(a, bt)
    _ = float(C[0, 0])  # warm-up fence (scalar: readback of C would
    # dominate the measurement through the device tunnel)
    reps = 4
    t0 = time.perf_counter()
    acc = jnp.float32(0)
    for i in range(reps):
        acc = acc + f(a + acc * 0, bt)[0, 0]  # chained: forces sequential
    _ = float(acc)
    t = time.perf_counter() - t0
    C_host = np.asarray(C)
    res = SgemmResult(
        m=m, n=n, k=k, time_s=t / reps,
        gflops=2.0 * m * n * k * reps / t / 1e9, kernel=kernel,
    )
    return C_host, res


def run(
    a_path: str,
    bt_path: str,
    out_path: Optional[str] = None,
    golden_path: Optional[str] = None,
    kernel: str = "pallas",
):
    A = read_col_major(a_path)
    BT = read_col_major(bt_path)
    C, res = run_arrays(A, BT, kernel=kernel)
    matched = None
    if golden_path:
        from lilac_tpu.workloads.parboil_spmv import compare

        ref = read_col_major(golden_path)
        matched = compare(ref.ravel(), C.ravel())
    if out_path:
        write_col_major(out_path, C)
    return C, res, matched
