"""Random CRS matrix generator (SparseBench big_gen semantics).

Mirrors /root/reference/SparseBench/big_gen.py:59-83: per-row nonzero counts
drawn from N(5, 4) clipped to [1, n], columns sampled without replacement
with the diagonal forced present, values |N(0, 2)|. Deterministic under a
seed. Returns 0-based canonical CSR in float64.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def random_crs(
    size: int, seed: int = 0, mean_nnz: float = 5.0, std_nnz: float = 4.0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[int, int]]:
    n = size**3
    rng = np.random.default_rng(seed)
    counts = rng.normal(mean_nnz, std_nnz, size=n).astype(np.int64)
    np.clip(counts, 1, n, out=counts)

    rows_list, cols_list = [], []
    for i in range(n):
        c = int(counts[i])
        cols = rng.choice(n, size=c, replace=False)
        if i not in cols:
            cols = np.append(cols, i)
        cols.sort()
        cols_list.append(cols)
        rows_list.append(np.full(len(cols), i, dtype=np.int64))
    col = np.concatenate(cols_list)
    row = np.concatenate(rows_list)
    val = np.abs(rng.normal(0.0, 2.0, size=len(col)))

    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, row + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr.astype(np.int32), col.astype(np.int32), val, (n, n)
