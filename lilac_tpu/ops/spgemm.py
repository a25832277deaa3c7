"""SpGEMM (sparse × sparse) — C = A·B.

The reference never computes a general SpGEMM directly (SparseX's CSX
tuning is the closest analogue), but the north-star capability list names
it (SURVEY.md §7 hard parts). Two paths:

* gustavson(...)   — host (numpy) row-wise Gustavson with hash-free
                     accumulation per row; used at plan/preprocessing time
                     (e.g. forming normal equations, graph squaring);
* masked_dense(...)— device path: dense MXU matmul over column blocks of
                     the densified operands with optional output
                     sparsification. On TPU, dense MXU FLOPs beat sparse
                     gather ops until density drops well below 1%, so for
                     moderate n this IS the fast path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def gustavson(
    a: Tuple[np.ndarray, np.ndarray, np.ndarray],
    b: Tuple[np.ndarray, np.ndarray, np.ndarray],
    shape_a: Tuple[int, int],
    shape_b: Tuple[int, int],
):
    """Row-wise Gustavson SpGEMM on host. Inputs/outputs canonical CSR."""
    assert shape_a[1] == shape_b[0]
    a_ptr, a_idx, a_val = a
    b_ptr, b_idx, b_val = b
    n, m = shape_a[0], shape_b[1]

    out_ptr = np.zeros(n + 1, dtype=np.int64)
    rows_idx = []
    rows_val = []
    acc = np.zeros(m, dtype=np.float64)
    # occupancy is tracked with a marker array, NOT by testing acc for 0.0:
    # an exact-zero product or a cancelling partial sum must not re-enter
    # `touched` (would emit duplicate CSR entries)
    mark = np.zeros(m, dtype=bool)
    touched = np.empty(m, dtype=np.int64)
    for i in range(n):
        ntouch = 0
        for k_pos in range(a_ptr[i], a_ptr[i + 1]):
            k = a_idx[k_pos]
            av = a_val[k_pos]
            lo, hi = b_ptr[k], b_ptr[k + 1]
            cols = b_idx[lo:hi]
            newcols = cols[~mark[cols]]
            mark[newcols] = True
            touched[ntouch : ntouch + len(newcols)] = newcols
            ntouch += len(newcols)
            acc[cols] += av * b_val[lo:hi]
        cols_i = np.sort(touched[:ntouch])
        rows_idx.append(cols_i.copy())
        rows_val.append(acc[cols_i].copy())
        acc[cols_i] = 0.0
        mark[cols_i] = False
        out_ptr[i + 1] = out_ptr[i] + len(cols_i)
    return (
        out_ptr,
        np.concatenate(rows_idx) if rows_idx else np.empty(0, np.int64),
        np.concatenate(rows_val) if rows_val else np.empty(0),
        (n, m),
    )


def masked_dense(a_csr, b_csr, shape_a, shape_b, *, threshold: float = 0.0,
                 dtype=None):
    """Device SpGEMM via densified MXU matmul; returns host CSR of entries
    with |c| > threshold. Appropriate when n·m fits HBM — on TPU the MXU's
    dense throughput beats gather-based sparse products at these sizes."""
    import jax.numpy as jnp

    n, k = shape_a
    _, m = shape_b
    A = np.zeros((n, k), dtype=np.float32 if dtype is None else dtype)
    rows = np.repeat(np.arange(n), np.diff(a_csr[0]))
    A[rows, a_csr[1]] = a_csr[2]
    B = np.zeros((k, m), dtype=A.dtype)
    rows_b = np.repeat(np.arange(k), np.diff(b_csr[0]))
    B[rows_b, b_csr[1]] = b_csr[2]
    C = np.array(jnp.dot(jnp.asarray(A), jnp.asarray(B),
                         preferred_element_type=jnp.float32))
    C[np.abs(C) <= threshold] = 0.0
    r, c = np.nonzero(C)
    from lilac_tpu.formats.convert import coo_to_csr_arrays

    ptr, idx, val = coo_to_csr_arrays(r, c, C[r, c], (n, m))
    return ptr, idx, val, (n, m)
