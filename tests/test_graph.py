"""Graph workloads: BFS on the reference's vendored input + PageRank."""

import os

import numpy as np
import pytest

REF_BFS = "/root/reference/bfs/input.mtx"


@pytest.mark.skipif(not os.path.exists(REF_BFS), reason="reference not mounted")
def test_bfs_reference_input_matches_oracle():
    from lilac_tpu.io.readers import read_edgelist
    from lilac_tpu.plan import SpmvPlan
    from lilac_tpu.workloads import bfs

    indptr, indices, data, shape = read_edgelist(REF_BFS)
    assert shape == (14, 14)
    plan = SpmvPlan(indptr, indices, np.ones_like(data), shape, dtype="f32")
    for src in range(14):
        got = bfs.bfs_distances(plan, src)
        ref = bfs.bfs_oracle(indptr, indices, data, shape, src)
        np.testing.assert_array_equal(got, ref)


def test_bfs_random_graph(rng):
    from lilac_tpu.plan import SpmvPlan
    from lilac_tpu.workloads import bfs
    from tests.conftest import random_csr

    (indptr, indices, data), shape = random_csr(rng, 80, 80, 0.04)
    plan = SpmvPlan(indptr, indices, np.ones_like(data), shape, dtype="f32")
    for src in (0, 17, 42):
        got = bfs.bfs_distances(plan, src)
        ref = bfs.bfs_oracle(indptr, indices, data, shape, src)
        np.testing.assert_array_equal(got, ref)


def test_pagerank_converges_to_stationary(rng):
    from lilac_tpu.workloads import pagerank
    from tests.conftest import random_csr

    (indptr, indices, data), shape = random_csr(rng, 60, 60, 0.15)
    data = np.abs(data) + 0.1
    r = pagerank.run(indptr, indices, data, shape, iters=300, runs=1, dtype="f64")
    # reference semantics: x_new = d·M_norm·x + (1-d)·mean(x); at the fixed
    # point the step difference vanishes
    assert r.error < 1e-10, r.error
    assert np.all(np.isfinite(r.x))


def test_powerlaw_graph_properties(rng):
    from lilac_tpu.generate.graphs import powerlaw_graph

    indptr, indices, data, shape = powerlaw_graph(2000, avg_deg=8.0, seed=3)
    n = shape[0]
    counts = np.diff(indptr)
    assert counts.sum() == len(indices) and (indices < n).all()
    # heavy tail: max out-degree far above the mean
    assert counts.max() > 8 * max(counts.mean(), 1.0)
    # no self loops
    rows = np.repeat(np.arange(n), counts)
    assert (rows != indices).all()


def test_pagerank_routed_matches_gather_kernel(rng):
    from lilac_tpu.generate.graphs import powerlaw_graph
    from lilac_tpu.workloads import pagerank

    indptr, indices, data, shape = powerlaw_graph(1500, avg_deg=6.0, seed=1)
    r1 = pagerank.run(indptr, indices, data, shape, iters=30, runs=1, dtype="f32")
    r2 = pagerank.run(
        indptr, indices, data, shape, iters=30, runs=1, dtype="f32",
        kernel="routed",
    )
    np.testing.assert_allclose(r1.x, r2.x, rtol=2e-4, atol=1e-7)


def test_pagerank_relabel_same_fixed_point(rng):
    """The length-sorted similarity drops the routed un-permute network;
    the returned (un-permuted) fixed point must match the natural-order
    run to float tolerance."""
    from lilac_tpu.generate.graphs import powerlaw_graph
    from lilac_tpu.workloads import pagerank

    indptr, indices, data, shape = powerlaw_graph(1200, avg_deg=6.0, seed=3)
    r1 = pagerank.run(indptr, indices, data, shape, iters=25, runs=1,
                      dtype="f32", kernel="routed", relabel=False)
    r2 = pagerank.run(indptr, indices, data, shape, iters=25, runs=1,
                      dtype="f32", kernel="routed", relabel=True)
    np.testing.assert_allclose(r1.x, r2.x, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(r1.error, r2.error, rtol=2e-3, atol=1e-7)


def test_bfs_relabel_distances_match_oracle(rng):
    """BFS on the relabeled graph with a rank-mapped source, distances
    un-permuted back, equals the natural-order oracle exactly."""
    from lilac_tpu.formats.convert import length_relabel_csr
    from lilac_tpu.generate.graphs import powerlaw_graph
    from lilac_tpu.plan import SpmvPlan
    from lilac_tpu.workloads.bfs import bfs_distances, bfs_oracle

    g = powerlaw_graph(900, avg_deg=5.0, seed=4, symmetric=True)
    ip, ix, dv, order, rank = length_relabel_csr(*g)
    plan = SpmvPlan(ip, ix, np.ones_like(dv), g[3], dtype="f32",
                    kernel="routed")
    d_rel = bfs_distances(plan, int(rank[11]))
    d_nat = np.empty_like(d_rel)
    d_nat[order] = d_rel
    np.testing.assert_array_equal(d_nat, bfs_oracle(*g, 11))


def test_bfs_routed_matches_oracle(rng):
    from lilac_tpu.generate.graphs import powerlaw_graph
    from lilac_tpu.plan import SpmvPlan
    from lilac_tpu.workloads.bfs import bfs_distances, bfs_oracle

    g = powerlaw_graph(1200, avg_deg=5.0, seed=2, symmetric=True)
    plan = SpmvPlan(g[0], g[1], np.ones_like(g[2]), g[3], dtype="f32",
                    kernel="routed")
    d = bfs_distances(plan, 7)
    ref = bfs_oracle(*g, 7)
    np.testing.assert_array_equal(d, ref)
