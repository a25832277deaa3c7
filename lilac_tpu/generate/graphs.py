"""Synthetic scale-free graph generation (host, vectorized numpy).

The reference benchmarks BFS/PageRank on SuiteSparse web/road/social
graphs (roadNet-CA, ljournal-2008, eu-2005, ... — bfs/run_all:3) which are
external downloads, not vendored. This generator produces graphs with the
same load-bearing property — heavy-tailed degree distributions — so the
graph workloads can be benchmarked at millions of nodes hermetically:
a Chung–Lu style model where endpoint i is drawn with probability
proportional to w_i = (i+1)^(-1/(alpha-1)) (power-law expected degrees
with exponent ~alpha).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def powerlaw_graph(
    n: int,
    avg_deg: float = 16.0,
    alpha: float = 2.1,
    seed: int = 0,
    symmetric: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Tuple[int, int]]:
    """Random directed scale-free graph as CSR (values all 1.0).

    Duplicate edges and self-loops are removed; expected edge count is
    n * avg_deg before dedup. Returns (indptr, indices, data, shape).
    """
    rng = np.random.default_rng(seed)
    m = int(n * avg_deg)
    w = (np.arange(1, n + 1, dtype=np.float64)) ** (-1.0 / (alpha - 1.0))
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    # endpoints: tails ~ powerlaw, heads ~ powerlaw with an independent
    # shuffle so in- and out-degree tails decouple
    src = np.searchsorted(cdf, rng.random(m)).astype(np.int64)
    dst = np.searchsorted(cdf, rng.random(m)).astype(np.int64)
    perm = rng.permutation(n)
    dst = perm[dst]
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    key = np.unique(key)
    src, dst = key // n, key % n
    if symmetric:
        s2 = np.concatenate([src, dst])
        d2 = np.concatenate([dst, src])
        key = np.unique(s2 * n + d2)
        src, dst = key // n, key % n
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return (
        indptr.astype(np.int32),
        dst.astype(np.int32),
        np.ones(len(dst), dtype=np.float64),
        (n, n),
    )
