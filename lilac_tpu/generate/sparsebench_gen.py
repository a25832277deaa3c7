"""SparseBench random-CRS test-matrix generator (exact host-side port).

Faithful reproduction of /root/reference/SparseBench/SRC/reference/
gen_crs.f + random_gen.f so the golden `reference_results` iteration/
residual table can be matched bit-for-bit on matrix structure:

* RNG: LAPACK DLARAN — 48-bit multiplicative LCG, multiplier
  33952834046453, seed (127,0,0,1) => x0 = 127*2^36 + 1
  (random_gen.f:44-101); value = x * 2^-48 (exact in f64).
* make_blocks: recursive unbalanced bisection (gen_crs.f:160-230),
  including the reference's `splits(4,blocks)` direction-index quirk
  (gen_crs.f:203,218 use the block COUNT as an index) — reproduced, since
  the golden matrices embed it.
* fill_matrix: diagonal bmrand()/n, then per-block damped random fill with
  symmetric (i,j)/(j,i) pairs and diagonal |v| accumulation
  (gen_crs.f:240-340,430-460).
* convert to CRS + positive_diagonal kludge (gen_crs.f:638-663).
* Cuthill-McKee permutation, ord=2 (gen_crs.f:545-600 + permute at
  main.f:176-183), with per-row ascending column sort.

The generated system is solved with x0 = 0, b = ones, rtol 1e-6,
maxit 100 (main.f:341-345,366).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

_DLARAN_A = 33952834046453  # lapack dlaran multiplier
_MASK48 = (1 << 48) - 1


class DLaran:
    def __init__(self):
        self.x = 127 * (1 << 36) + 1  # iseed (127,0,0,1)

    def next(self) -> float:
        self.x = (self.x * _DLARAN_A) & _MASK48
        return self.x * 0.5**48


def _ceil_ref(x: float) -> int:
    """gen_crs.f's own ceil (exact-integer check then int()+1)."""
    if x == int(x):
        return int(x)
    return int(x) + 1


def make_blocks(n: int, unbalance: float, rng: DLaran, max_levels: int = 500):
    """Recursive bisection; returns splits as a list of [s1, s2, s3, dir]."""
    splits = [[1, int((1 + unbalance * (2 * rng.next() - 1)) * (1 + n) / 2 + 1), n, 1]]
    b_per_level = [1]
    first = 0  # 0-based index of first block of current level
    top = 0  # 0-based index of last block
    for level in range(max_levels):
        blocks = b_per_level[level]
        nxt = 0
        last = first + blocks - 1
        for bi in range(first, last + 1):
            s1, s2, s3, _ = splits[bi]
            if s2 - 1 < s1:
                raise RuntimeError("negative side")
            elif s2 - 1 > s1:
                top += 1
                nxt += 1
                # NOTE reference quirk: direction flips against
                # splits(4, blocks) — the block COUNT used as index
                splits.append([s1, (s1 + s2) // 2, s2 - 1, 3 - splits[blocks - 1][3]])
            if s3 < s2:
                raise RuntimeError("negative side")
            elif s3 > s2:
                top += 1
                nxt += 1
                splits.append([s2, (s2 + s3 + 1) // 2, s3, 3 - splits[blocks - 1][3]])
        b_per_level.append(nxt)
        first = last + 1
        if nxt == 0:
            break
    return splits


def fill_matrix(splits, n: int, rng: DLaran, decay=0.1, cutoff=0.8, d=3.0, c=2.0):
    """Returns COO lists (rows, cols, vals) 1-based, diagonal first."""
    diag_val = np.empty(n, dtype=np.float64)
    for i in range(n):
        diag_val[i] = rng.next() / n
    rows, cols, vals = [], [], []

    def fill_elt(block_i, i, j):
        rval = 2 * rng.next() - 1.0
        rows.append(i)
        cols.append(j)
        vals.append(rval)
        rows.append(j)
        cols.append(i)
        vals.append(rval)
        if i != j:
            if block_i == 0:
                rval = 1.1 * rval
            diag_val[i - 1] += abs(rval)
            diag_val[j - 1] += abs(rval)

    inv_cut = 1.0 / cutoff
    for bi, (s1, s2, s3, direction) in enumerate(splits):
        i1, i2 = s1, s2 - 1
        j1, j2 = s2, s3
        if i1 == i2 or j1 == j2:
            for i in range(i1, i2 + 1):
                for j in range(j1, j2 + 1):
                    fill_elt(bi, i, j)
            continue
        hinv_i = int(1 + (i2 - i1 + 1.001) ** (1.0 / d))
        allow_i = float(hinv_i) ** (d - 1.0)
        hinv_j = int(1 + (j2 - j1 + 1.001) ** (1.0 / d))
        allow_j = float(hinv_j) ** (d - 1.0)
        bdry = int(min(i2 - i1 + 1 - allow_i, j2 - j1 + 1 - allow_j))
        if direction == 1:
            for i in range(i1, i2 + 1):
                md = _min_i_damp(i, i1, i2, j1, j2, bdry, decay)
                if md > inv_cut:
                    continue
                for j in range(j1, j2 + 1):
                    damp = _reg_damp(direction, i, j, i1, j1, hinv_i, hinv_j, bdry, decay)
                    rval = rng.next()
                    if rval / damp > cutoff:
                        fill_elt(bi, i, j)
        else:
            cl = max(1, (i2 - i1) // hinv_i)
            for ic in range(i1, i2 + 1, cl):
                for jc in range(j1, j2 + 1, cl):
                    md = _min_ij_damp(ic, jc, i1, j1, hinv_i, decay)
                    if md > inv_cut:
                        continue
                    for i in range(ic, min(i2, ic + cl - 1) + 1):
                        for j in range(jc, min(j2, jc + cl - 1) + 1):
                            damp = _reg_damp(
                                direction, i, j, i1, j1, hinv_i, hinv_j, bdry, decay
                            )
                            rval = rng.next()
                            if rval / damp > cutoff:
                                fill_elt(bi, i, j)

    all_rows = np.concatenate([np.arange(1, n + 1), np.asarray(rows, dtype=np.int64)]) if rows else np.arange(1, n + 1)
    all_cols = np.concatenate([np.arange(1, n + 1), np.asarray(cols, dtype=np.int64)]) if cols else np.arange(1, n + 1)
    all_vals = np.concatenate([diag_val, np.asarray(vals, dtype=np.float64)]) if vals else diag_val
    return all_rows, all_cols, all_vals


def _min_i_damp(i, i1, i2, j1, j2, bdry, decay):
    aim = (i - i1) - bdry
    if aim >= 0 and j1 + aim <= j2:
        return 1.0
    if aim < 0:
        return (-aim * 0.5 + 1.0) ** decay
    return ((j1 + aim - j2) * 0.5 + 1.0) ** decay


def _min_ij_damp(ic, jc, i1, j1, hinv_i, decay):
    return (_ceil_ref(abs(ic - i1 - jc + j1) / (1.0 * hinv_i)) + 1.0) ** decay


def _reg_damp(direction, i, j, i1, j1, hinv_i, hinv_j, bdry, decay):
    if direction == 1:
        return (abs((j - j1) - (i - i1) + bdry) * 0.5 + 1.0) ** decay
    il = (i - i1) % hinv_i
    jl = (j - j1) % hinv_i
    return (
        (hinv_i - 1 - il + jl + _ceil_ref(abs(i - i1 - j + j1) / (1.0 * hinv_i)))
        + 1.0
    ) ** decay


def cuthill_mckee(indptr, indices, n: int) -> np.ndarray:
    """compute_ordering ord=2 (gen_crs.f): BFS from node 1 in stored column
    order, restart at lowest unvisited node. Returns ordering (1-based node
    ids in new order)."""
    ordering = np.zeros(n, dtype=np.int64)
    visited = np.zeros(n + 1, dtype=bool)
    ordering[0] = 1
    visited[1] = True
    top = 0  # 0-based index of last ordered
    low = 0
    for _ in range(n):
        if ordering[low] == 0:
            # restart at lowest unvisited
            col = int(np.nonzero(~visited[1:])[0][0]) + 1
            top = low
            ordering[low] = col
            visited[col] = True
        row = ordering[low]
        for k in range(indptr[row - 1], indptr[row]):
            col = indices[k]
            if visited[col]:
                continue
            top += 1
            ordering[top] = col
            visited[col] = True
            if top == n - 1:
                return ordering
        low += 1
        if low >= n:
            break
    return ordering


def generate_crs(side: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[int, int]]:
    """Full struct=2 matrix pipeline for a given `side` (n = side^3).

    Returns 0-based canonical CSR (indptr, indices, data) after the
    Cuthill-McKee permutation, exactly as the solver sees it
    (main.f:131-196).
    """
    n = side**3
    unbalance = 0.3
    rng = DLaran()
    splits = make_blocks(n, unbalance, rng)
    rng = DLaran()  # generate_crs_matrix calls init_rand again (gen_crs.f:62)
    rows, cols, vals = fill_matrix(splits, n, rng)

    # assemble CRS (no duplicates by construction), columns sorted per row
    from lilac_tpu.formats.convert import coo_to_csr_arrays

    indptr, indices, data = coo_to_csr_arrays(
        rows - 1, cols - 1, vals, (n, n), sum_duplicates=False
    )
    # positive_diagonal kludge: zero diagonals get a fresh random value
    for i in range(n):
        for k in range(indptr[i], indptr[i + 1]):
            if indices[k] == i and data[k] == 0.0:
                data[k] = rng.next()

    # Cuthill-McKee permutation (ord=2) on 1-based structure
    ordering = cuthill_mckee(indptr, indices + 1, n)
    inv = np.zeros(n + 1, dtype=np.int64)
    inv[ordering] = np.arange(1, n + 1)

    # permute rows by `ordering`, map columns through inv, sort rows
    counts = np.diff(indptr)
    new_counts = counts[ordering - 1]
    new_indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_counts, out=new_indptr[1:])
    new_indices = np.empty_like(indices)
    new_data = np.empty_like(data)
    for irow in range(n):
        row = ordering[irow] - 1
        lo, hi = indptr[row], indptr[row + 1]
        seg_cols = inv[indices[lo:hi] + 1] - 1
        seg_vals = data[lo:hi]
        order = np.argsort(seg_cols, kind="stable")
        dst = slice(new_indptr[irow], new_indptr[irow + 1])
        new_indices[dst] = seg_cols[order]
        new_data[dst] = seg_vals[order]
    return new_indptr.astype(np.int32), new_indices.astype(np.int32), new_data, (n, n)
