"""Pallas routed-gather applier vs the host network simulator."""

import numpy as np
import pytest

from lilac_tpu.kernels import routed as rd
from lilac_tpu.kernels import routenet as rn


def _run_net(idx, n, x, m=None):
    import jax.numpy as jnp

    net = rn.build_gather_network(idx, n, m)
    masks = rd.masks_device(net)
    R = net.m // 128
    xp = np.zeros(net.m, dtype=np.float32)
    xp[:n] = x
    (out,) = rd.routed_apply(
        [jnp.asarray(xp.reshape(R, 128))],
        masks,
        net.kinds,
        net.dists,
        interpret=True,
    )
    return np.asarray(out).reshape(idx.shape[0], net.m)


def test_routed_apply_matches_gather(rng):
    n, T, B = 900, 1024, 3
    idx = rng.integers(0, n, size=(B, T))
    x = rng.normal(size=n).astype(np.float32)
    out = _run_net(idx, n, x)
    np.testing.assert_array_equal(out[:, :T], x[idx])


def test_routed_apply_duplicates_and_shifts(rng):
    n, T = 64, 1024  # heavy duplication -> deep broadcast chains
    idx = rng.integers(0, n, size=(1, T))
    x = rng.normal(size=n).astype(np.float32)
    out = _run_net(idx, n, x)
    np.testing.assert_array_equal(out[:, :T], x[idx])


def test_routed_apply_two_planes(rng):
    import jax.numpy as jnp

    n, T = 500, 1024
    idx = rng.integers(0, n, size=(2, T))
    hi = rng.normal(size=n).astype(np.float32)
    lo = rng.normal(size=n).astype(np.float32)
    net = rn.build_gather_network(idx, n)
    masks = rd.masks_device(net)
    R = net.m // 128
    pads = []
    for p in (hi, lo):
        xp = np.zeros(net.m, dtype=np.float32)
        xp[:n] = p
        pads.append(jnp.asarray(xp.reshape(R, 128)))
    oh, ol = rd.routed_apply(pads, masks, net.kinds, net.dists, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(oh).reshape(2, -1)[:, :T], hi[idx]
    )
    np.testing.assert_array_equal(
        np.asarray(ol).reshape(2, -1)[:, :T], lo[idx]
    )


def _random_csr_spread(rng, n, ncol, mean_nnz):
    import scipy.sparse as sp

    counts = np.clip(rng.poisson(mean_nnz, size=n), 1, ncol)
    rows = np.repeat(np.arange(n), counts)
    cols = np.concatenate([rng.choice(ncol, size=c, replace=False) for c in counts])
    vals = rng.normal(size=len(rows))
    A = sp.csr_matrix((vals, (rows, cols)), shape=(n, ncol))
    A.sum_duplicates()
    return A


def test_routed_spmv_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs

    A = _random_csr_spread(rng, 700, 900, 6.0)
    M = rs.build_routed_csr(
        A.indptr, A.indices, A.data, A.shape, dtype="f32", m=1024
    )
    assert len(M.chunks) > 1
    x = rng.normal(size=A.shape[1]).astype(np.float32)
    y = np.asarray(rs.routed_spmv(M, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, A @ x.astype(np.float64), rtol=2e-5, atol=2e-5)


def test_routed_spmv_uniform_rows_no_sort(rng):
    import jax.numpy as jnp
    import scipy.sparse as sp

    from lilac_tpu.kernels import routed_spmv as rs

    n, ncol, k = 300, 800, 5
    cols = np.stack([rng.choice(ncol, size=k, replace=False) for _ in range(n)])
    vals = rng.normal(size=(n, k))
    A = sp.csr_matrix(
        (vals.ravel(), cols.ravel(), np.arange(0, n * k + 1, k)), shape=(n, ncol)
    )
    M = rs.build_routed_csr(A.indptr, A.indices, A.data, A.shape, dtype="f32")
    assert M.inv_perm is None
    x = rng.normal(size=ncol).astype(np.float32)
    y = np.asarray(rs.routed_spmv(M, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, A @ x.astype(np.float64), rtol=2e-5, atol=2e-5)


def test_routed_spmv_df_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs
    from lilac_tpu.ops import dfloat as df

    A = _random_csr_spread(rng, 500, 600, 8.0)
    M = rs.build_routed_csr(
        A.indptr, A.indices, A.data, A.shape, dtype="df64", m=1024
    )
    x = rng.normal(size=A.shape[1])
    y = df.to_f64(rs.routed_spmv_df(M, df.from_f64(x), interpret=True))
    np.testing.assert_allclose(y, A @ x, rtol=1e-13, atol=1e-13)


def test_routed_seg_spmv_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs

    A = _random_csr_spread(rng, 800, 3000, 7.0)  # ncol > seg -> 3 segments
    M = rs.build_routed_csr_seg(
        A.indptr, A.indices, A.data, A.shape, dtype="f32", seg_size=1024
    )
    assert len(M.masks) == 3
    x = rng.normal(size=A.shape[1]).astype(np.float32)
    y = np.asarray(rs.routed_seg_spmv(M, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, A @ x.astype(np.float64), rtol=2e-5, atol=2e-5)


def test_routed_seg_spmv_df_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs
    from lilac_tpu.ops import dfloat as df

    A = _random_csr_spread(rng, 600, 2500, 6.0)
    M = rs.build_routed_csr_seg(
        A.indptr, A.indices, A.data, A.shape, dtype="df64", seg_size=1024
    )
    x = rng.normal(size=A.shape[1])
    y = df.to_f64(rs.routed_seg_spmv_df(M, df.from_f64(x), interpret=True))
    np.testing.assert_allclose(y, A @ x, rtol=1e-13, atol=1e-13)


def test_hier_apply_matches_gather(rng):
    """Hierarchical passes (inner + butterfly + window) == direct gather."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed as rd
    from lilac_tpu.kernels import routenet as rn

    n, T, bl = 3000, 8192, 1024  # m = 8192 -> 8 blocks of 1024
    idx = rng.integers(0, n, size=(1, T))
    net = rn.build_gather_network(idx, n, drop_empty=False)
    assert net.m == 8192
    passes = rd.compile_hier(net.kinds, net.dists, net.masks[:, 0, :], bl)
    kindset = {p[0] for p in passes}
    assert {"inner", "butterfly"} <= kindset
    x = rng.normal(size=n).astype(np.float32)
    xp = np.zeros(net.m, np.float32)
    xp[:n] = x
    (out,) = rd.hier_apply(
        [jnp.asarray(xp.reshape(-1, 128))], passes, bl, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out).reshape(-1)[:T], x[idx[0]])


def test_hier_apply_two_planes_heavy_dups(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed as rd
    from lilac_tpu.kernels import routenet as rn

    n, T, bl = 500, 4096, 1024
    idx = np.concatenate([np.full(1800, 3), rng.integers(0, n, size=T - 1800)])
    rng.shuffle(idx)
    net = rn.build_gather_network(idx[None], n, drop_empty=False)
    passes = rd.compile_hier(net.kinds, net.dists, net.masks[:, 0, :], bl)
    hi = rng.normal(size=n).astype(np.float32)
    lo = rng.normal(size=n).astype(np.float32)
    planes = []
    for p in (hi, lo):
        xp = np.zeros(net.m, np.float32)
        xp[:n] = p
        planes.append(jnp.asarray(xp.reshape(-1, 128)))
    oh, ol = rd.hier_apply(planes, passes, bl, interpret=True)
    np.testing.assert_array_equal(np.asarray(oh).reshape(-1)[:T], hi[idx])
    np.testing.assert_array_equal(np.asarray(ol).reshape(-1)[:T], lo[idx])


def test_routed_hier_spmv_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs

    A = _random_csr_spread(rng, 3000, 3000, 6.0)  # ncol > bl -> hierarchical
    M = rs.build_routed_csr_hier(
        A.indptr, A.indices, A.data, A.shape, dtype="f32", bl=1024
    )
    assert len(M.nets) >= 1 and M.m >= 4096
    x = rng.normal(size=A.shape[1]).astype(np.float32)
    y = np.asarray(rs.routed_hier_spmv(M, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, A @ x.astype(np.float64), rtol=2e-5, atol=2e-5)


def test_routed_hier_spmv_df_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs
    from lilac_tpu.ops import dfloat as df

    A = _random_csr_spread(rng, 2500, 2800, 5.0)
    # some empty rows exercise the zero-pad slot in the un-permute
    A = A.tolil()
    for r in (7, 100, 2499):
        A.rows[r] = []
        A.data[r] = []
    A = A.tocsr()
    M = rs.build_routed_csr_hier(
        A.indptr, A.indices, A.data, A.shape, dtype="df64", bl=1024
    )
    assert M.n_nz < A.shape[0]
    x = rng.normal(size=A.shape[1])
    y = df.to_f64(rs.routed_hier_spmv_df(M, df.from_f64(x), interpret=True))
    np.testing.assert_allclose(y, A @ x, rtol=1e-13, atol=1e-13)


def test_routed_single_table_colmajor_layouts_agree(rng):
    """RoutedMat / RoutedMatSeg row-major vs column-major chunk layouts
    compute the same product (df64 exact to 1e-13 vs the f64 oracle)."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs
    from lilac_tpu.ops import dfloat as df

    A = _random_csr_spread(rng, 900, 1000, 5.0)
    x = rng.normal(size=A.shape[1])
    want = A @ x
    for cm in (False, True):
        M = rs.build_routed_csr(
            A.indptr, A.indices, A.data, A.shape, dtype="df64", colmajor=cm
        )
        assert M.colmajor is cm
        y = df.to_f64(rs.routed_spmv_df(M, df.from_f64(x), interpret=True))
        np.testing.assert_allclose(y, want, rtol=1e-13, atol=1e-13)
        Ms = rs.build_routed_csr_seg(
            A.indptr, A.indices, A.data, A.shape, dtype="df64",
            seg_size=1024, colmajor=cm,
        )
        ys = df.to_f64(
            rs.routed_seg_spmv_df(Ms, df.from_f64(x), interpret=True)
        )
        np.testing.assert_allclose(ys, want, rtol=1e-13, atol=1e-13)
        Mf = rs.build_routed_csr(
            A.indptr, A.indices, A.data, A.shape, dtype="f32", colmajor=cm
        )
        yf = np.asarray(
            rs.routed_spmv(Mf, jnp.asarray(x, jnp.float32), interpret=True)
        )
        np.testing.assert_allclose(yf, want, rtol=2e-4, atol=2e-4)


def test_routed_hier_colmajor_layouts_agree(rng):
    """Row-major and column-major chunk layouts are the same operator.

    Column-major (the default) keeps the row-sum reduction in rows-minor
    layouts on TPU; row-major stays loadable for pre-existing caches."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs
    from lilac_tpu.ops import dfloat as df

    A = _random_csr_spread(rng, 2500, 2800, 5.0)
    x = rng.normal(size=A.shape[1])
    want = A @ x
    for dtype in ("f32", "df64"):
        Ms = [
            rs.build_routed_csr_hier(
                A.indptr, A.indices, A.data, A.shape, dtype=dtype, bl=1024,
                colmajor=cm,
            )
            for cm in (False, True)
        ]
        assert Ms[0].colmajor is False and Ms[1].colmajor is True
        # the chunk metadata is layout-independent; only slot order changes
        assert Ms[0].chunks == Ms[1].chunks
        for M in Ms:
            if dtype == "f32":
                y = np.asarray(
                    rs.routed_hier_spmv(
                        M, jnp.asarray(x.astype(np.float32)), interpret=True
                    )
                )
                np.testing.assert_allclose(y, want, rtol=2e-5, atol=2e-5)
            else:
                y = df.to_f64(
                    rs.routed_hier_spmv_df(M, df.from_f64(x), interpret=True)
                )
                np.testing.assert_allclose(y, want, rtol=1e-13, atol=1e-13)


def test_hier_colmajor_cache_roundtrip(rng, tmp_path):
    """save/load preserves the colmajor flag (old caches default False)."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs

    A = _random_csr_spread(rng, 1500, 2500, 5.0)
    M = rs.build_routed_csr_hier(
        A.indptr, A.indices, A.data, A.shape, dtype="f32", bl=1024,
        colmajor=True,
    )
    p = str(tmp_path / "hier_cm.npz")
    rs.save_routed(p, M)
    M2 = rs.load_routed(p)
    assert M2.colmajor is True
    x = rng.normal(size=A.shape[1]).astype(np.float32)
    y1 = np.asarray(rs.routed_hier_spmv(M, jnp.asarray(x), interpret=True))
    y2 = np.asarray(rs.routed_hier_spmv(M2, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(y1, y2)


def test_hier_cache_roundtrip(rng, tmp_path):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs

    A = _random_csr_spread(rng, 1500, 2500, 5.0)
    M = rs.build_routed_csr_hier(
        A.indptr, A.indices, A.data, A.shape, dtype="f32", bl=1024
    )
    p = str(tmp_path / "hier.npz")
    rs.save_routed(p, M)
    M2 = rs.load_routed(p)
    assert M2.chunks == M.chunks and M2.bl == M.bl and M2.n_nz == M.n_nz
    x = rng.normal(size=A.shape[1]).astype(np.float32)
    y1 = np.asarray(rs.routed_hier_spmv(M, jnp.asarray(x), interpret=True))
    y2 = np.asarray(rs.routed_hier_spmv(M2, jnp.asarray(x), interpret=True))
    np.testing.assert_array_equal(y1, y2)


def test_monotone_mode_matches_benes_and_cuts_stages(rng, monkeypatch):
    """The concentrate + interval-multicast schedule (LILAC_NET_MODE=
    monotone, the default) must produce the exact same SpMV results as
    the round-1 Benes + broadcast schedule, with fewer stages."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs

    A = _random_csr_spread(rng, 1200, 900, 6.0)
    x = rng.normal(size=A.shape[1]).astype(np.float32)
    outs, stages = {}, {}
    for mode in ("benes", "monotone"):
        monkeypatch.setenv("LILAC_NET_MODE", mode)
        M = rs.build_routed_csr(A.indptr, A.indices, A.data, A.shape,
                                dtype="f32")
        outs[mode] = np.asarray(rs.routed_spmv(M, jnp.asarray(x),
                                               interpret=True))
        stages[mode] = len(M.kinds)
    # identical products: both schedules deliver the same gathered values
    # to the same slots, and the reduce is shared
    np.testing.assert_array_equal(outs["benes"], outs["monotone"])
    assert stages["monotone"] < stages["benes"], stages


def test_monotone_gather_heavy_duplication(rng):
    """Interval multicast must be exact under long runs (the regime where
    it folds the whole broadcast phase away)."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed as rd
    from lilac_tpu.kernels import routenet as rn

    n, T = 50, 4096  # every value duplicated ~80x
    idx = rng.integers(0, n, size=(2, T))
    net = rn.build_gather_network(idx, n, 4096, mode="monotone")
    R = net.m // 128
    for b in range(2):
        x = rng.normal(size=net.m).astype(np.float32)
        masks = rd.masks_device(rn.GatherPlanHost(
            kinds=net.kinds, dists=net.dists,
            masks=net.masks[:, b:b + 1, :], m=net.m))
        (out,) = rd.routed_apply([jnp.asarray(x.reshape(R, 128))], masks,
                                 net.kinds, net.dists, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out).reshape(-1)[:T], x[idx[b]])


def test_routed_spmv_unsorted_varying_rows(rng):
    """Regression: with sort_rows=False the chunk width must cover the
    chunk's true max row length (a tridiagonal system's first row is
    shorter than its interior rows — the old builder overflowed rows
    into their neighbours' slots and corrupted the product)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from lilac_tpu.kernels import routed_spmv as rs

    n = 200
    A = sp.diags(
        [rng.normal(size=n - 1), rng.normal(size=n), rng.normal(size=n - 1)],
        [-1, 0, 1],
    ).tocsr()
    M = rs.build_routed_csr(
        A.indptr, A.indices, A.data, A.shape, dtype="f32", sort_rows=False,
        m=1024,
    )
    x = rng.normal(size=n).astype(np.float32)
    y = np.asarray(rs.routed_spmv(M, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(y, A @ x.astype(np.float64), rtol=2e-5, atol=2e-5)


def test_hier_gmax_rejects_oversized_blocks():
    import pytest as _pytest

    from lilac_tpu.kernels import routed as rd

    with _pytest.raises(ValueError):
        rd.hier_gmax(1 << 19, 2)
    assert rd.hier_gmax(1 << 16, 2) >= 1


def test_hier_apply_gmax3_matches_gather(rng):
    """g=3 butterfly grouping (fewer, denser passes — the plan-size and
    mask-stream lever) routes identically to the default g=2."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed as rd
    from lilac_tpu.kernels import routenet as rn

    n, T, bl = 3000, 8192, 256  # m = 8192 -> 32 blocks: 5 block bits
    idx = rng.integers(0, n, size=(1, T))
    net = rn.build_gather_network(idx, n, drop_empty=False)
    passes = rd.compile_hier(net.kinds, net.dists, net.masks[:, 0, :], bl,
                             gmax=3)
    nb3 = sum(1 for p in passes if p[0] == "butterfly")
    passes2 = rd.compile_hier(net.kinds, net.dists, net.masks[:, 0, :], bl,
                              gmax=2)
    nb2 = sum(1 for p in passes2 if p[0] == "butterfly")
    assert nb3 < nb2, (nb3, nb2)  # fewer butterfly streams at g=3
    x = rng.normal(size=n).astype(np.float32)
    xp = np.zeros(net.m, np.float32)
    xp[:n] = x
    (out,) = rd.hier_apply(
        [jnp.asarray(xp.reshape(-1, 128))], passes, bl, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out).reshape(-1)[:T], x[idx[0]])


def test_hier_builder_gmax_env_override(rng, monkeypatch):
    """LILAC_HIER_GMAX reaches the hier plan builder through the config."""
    from lilac_tpu.kernels import routed_spmv as rs

    monkeypatch.setenv("LILAC_HIER_GMAX", "1")
    assert rs._hier_gmax_cfg(1 << 16, "df64") == 1
    monkeypatch.delenv("LILAC_HIER_GMAX")
    assert rs._hier_gmax_cfg(1 << 16, "df64") == 2  # VMEM-derived default


def test_vmem_feasibility_check(monkeypatch):
    """Plan-time scoped-VMEM gate (round-2 verdict weak #5): infeasible
    bl/gmax configs must fail on the host at build time, feasible ones
    (incl. the shipped NPB/sb160 configs) must pass."""
    # shipped configs: hier bl=2^16 g=3 df64 (~18 MB) and g=2 are feasible
    rd.check_vmem_feasible((("butterfly", (0, 1, 2)),), 1 << 16, 2)
    rd.check_vmem_feasible((("butterfly", (0, 1)), ("window", ()),
                            ("inner", (), ())), 1 << 16, 2)
    # single-table at the 2^18 cap is feasible
    rd.check_vmem_feasible(1 << 18, 1 << 18, 2)
    # bl=2^19 g=3 df64 = 8*bl*34 = 142 MB > the 100 MB pallas limit
    with pytest.raises(ValueError, match="VMEM-infeasible"):
        rd.check_vmem_feasible((("butterfly", (0, 1, 2)),), 1 << 19, 2)
    # a giant single table fails too
    with pytest.raises(ValueError, match="VMEM-infeasible"):
        rd.check_vmem_feasible(1 << 23, 1 << 23, 2)
    # and the hier builder rejects before the expensive network build
    from lilac_tpu.kernels.routed_spmv import build_routed_csr_hier

    indptr = np.arange(5, dtype=np.int64) * 2
    indices = np.arange(8, dtype=np.int64) % 4
    data = np.ones(8)
    monkeypatch.setenv("LILAC_HIER_GMAX", "3")
    with pytest.raises(ValueError, match="VMEM-infeasible"):
        build_routed_csr_hier(
            indptr, indices, data, (4, 4), dtype="df64", bl=1 << 19
        )


def test_hier_packed_matches_legacy_and_dense(rng, monkeypatch):
    """Net-batched (packed) hier SpMV == per-net hier SpMV == dense oracle,
    f32 and df64. The packed path collapses each pass over all nets into
    one pallas_call (grid (nblocks, N)) — pure batching, bit-identical
    switch semantics."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from lilac_tpu.kernels.routed_spmv import (
        build_routed_csr_hier,
        maybe_pack_hier,
        pack_hier,
        routed_hier_spmv,
        routed_hier_spmv_df,
    )
    from lilac_tpu.ops import dfloat as df

    n = 3000
    counts = rng.integers(1, 9, size=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=indptr[1:])
    indices = rng.integers(0, n, size=int(indptr[-1]))
    data = rng.normal(size=len(indices))
    A = sp.csr_matrix((data, indices, indptr), shape=(n, n)).toarray()
    x = rng.normal(size=n)

    M = build_routed_csr_hier(indptr, indices, data, (n, n), dtype="f32", bl=256)
    P = pack_hier(M)
    assert sum(len(g.net_ids) for g in P.groups) == len(M.nets)
    y_ref = A @ x
    y_legacy = np.asarray(routed_hier_spmv(M, jnp.asarray(x, jnp.float32)))
    y_packed = np.asarray(routed_hier_spmv(P, jnp.asarray(x, jnp.float32)))
    np.testing.assert_array_equal(y_packed, y_legacy)  # identical schedule
    np.testing.assert_allclose(y_packed, y_ref, rtol=2e-4, atol=2e-4)

    Md = build_routed_csr_hier(indptr, indices, data, (n, n), dtype="df64", bl=256)
    Pd = pack_hier(Md)
    xd = df.from_f64(x)
    yd_legacy = df.to_f64(routed_hier_spmv_df(Md, xd))
    yd_packed = df.to_f64(routed_hier_spmv_df(Pd, xd))
    np.testing.assert_array_equal(yd_packed, yd_legacy)
    np.testing.assert_allclose(yd_packed, y_ref, rtol=1e-12, atol=1e-12)

    # knob gates packing (default on)
    assert isinstance(maybe_pack_hier(M), type(P))
    monkeypatch.setenv("LILAC_HIER_PACK", "0")
    assert maybe_pack_hier(M) is M


def test_routed_adjoint_transpose_matches_oracle(rng):
    """routed_spmv_adj_t == A.T @ u: the forward plan's masks run in
    reverse with add-merges (zero extra plan bytes for the transpose)."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs

    for sort_rows in (False, True):
        A = _random_csr_spread(rng, 900, 1000, 5.0)
        M = rs.build_routed_csr(
            A.indptr, A.indices, A.data, A.shape, dtype="f32",
            sort_rows=sort_rows,
        )
        u = rng.normal(size=A.shape[0]).astype(np.float32)
        y = np.asarray(rs.routed_spmv_adj_t(M, jnp.asarray(u), interpret=True))
        want = A.T @ u.astype(np.float64)
        np.testing.assert_allclose(y, want, rtol=2e-4, atol=2e-4)
        # and the row-major layout agrees too
        Mr = rs.build_routed_csr(
            A.indptr, A.indices, A.data, A.shape, dtype="f32",
            sort_rows=sort_rows, colmajor=False,
        )
        yr = np.asarray(
            rs.routed_spmv_adj_t(Mr, jnp.asarray(u), interpret=True)
        )
        np.testing.assert_allclose(yr, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Beneš-reverse transpose (adjoint) — hier + df64
# ---------------------------------------------------------------------------


def test_hier_apply_batched_t_is_exact_transpose(rng):
    """hier_apply_batched_t realizes G^T for the same pass masks: checked
    against the dense operator matrix of the forward network (heavy dups
    force window + bigshift passes; m/bl = 4 forces butterflies)."""
    import jax.numpy as jnp

    n, T, bl = 500, 4096, 1024
    idx = np.concatenate([np.full(1800, 3), rng.integers(0, n, size=T - 1800)])
    rng.shuffle(idx)
    net = rn.build_gather_network(idx[None], n, drop_empty=False)
    passes = rd.compile_hier(net.kinds, net.dists, net.masks[:, 0, :], bl)
    meta = tuple(p[:-1] for p in passes)
    masks = tuple(p[-1] for p in passes)
    m = net.m

    # forward dense operator via basis vectors on the host simulator
    G = np.zeros((m, m), dtype=np.float64)
    eye = np.eye(m, dtype=np.float32)
    G[:] = net.apply_host(eye).T  # column j = G e_j

    u = rng.normal(size=m).astype(np.float32)
    (out,) = rd.hier_apply_batched_t(
        (jnp.asarray(u.reshape(1, -1, 128)),),
        meta,
        tuple(mk[None] for mk in masks),
        bl,
        interpret=True,
    )
    want = G.T @ u
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1), want, rtol=1e-5, atol=1e-4
    )


def test_routed_hier_spmv_adj_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs

    A = _random_csr_spread(rng, 3000, 3000, 6.0)
    for colmajor in (True, False):
        M = rs.build_routed_csr_hier(
            A.indptr, A.indices, A.data, A.shape, dtype="f32", bl=1024,
            colmajor=colmajor,
        )
        u = rng.normal(size=A.shape[0]).astype(np.float32)
        y = np.asarray(
            rs.routed_hier_spmv_adj_t(M, jnp.asarray(u), interpret=True)
        )
        want = A.T @ u.astype(np.float64)
        np.testing.assert_allclose(y, want, rtol=2e-4, atol=2e-4)
        # packed groups: same oracle (cross-net reduction order differs
        # from the per-net path by f32 rounding, so no bitwise check)
        P = rs.pack_hier(M)
        yp = np.asarray(
            rs.routed_hier_spmv_adj_t(P, jnp.asarray(u), interpret=True)
        )
        np.testing.assert_allclose(yp, want, rtol=2e-4, atol=2e-4)


def test_routed_hier_spmv_adj_df_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs
    from lilac_tpu.ops import dfloat as df

    A = _random_csr_spread(rng, 2500, 2500, 5.0)
    M = rs.build_routed_csr_hier(
        A.indptr, A.indices, A.data, A.shape, dtype="df64", bl=1024
    )
    u = rng.normal(size=A.shape[0])
    y = df.to_f64(
        rs.routed_hier_spmv_adj_t_df(M, df.from_f64(jnp.asarray(u)),
                                     interpret=True)
    )
    want = A.T @ u
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-12, atol=1e-12)
    # packed groups: same oracle (cross-net df reduction order differs
    # from the per-net path at the 1e-14 level, so no bitwise check)
    P = rs.pack_hier(M)
    yp = df.to_f64(
        rs.routed_hier_spmv_adj_t_df(P, df.from_f64(jnp.asarray(u)),
                                     interpret=True)
    )
    np.testing.assert_allclose(np.asarray(yp), want, rtol=1e-12, atol=1e-12)


def test_routed_adjoint_df_single_table_matches_oracle(rng):
    import jax.numpy as jnp

    from lilac_tpu.kernels import routed_spmv as rs
    from lilac_tpu.ops import dfloat as df

    for sort_rows in (False, True):
        A = _random_csr_spread(rng, 900, 1000, 5.0)
        M = rs.build_routed_csr(
            A.indptr, A.indices, A.data, A.shape, dtype="df64",
            sort_rows=sort_rows,
        )
        u = rng.normal(size=A.shape[0])
        y = df.to_f64(
            rs.routed_spmv_adj_t_df(M, df.from_f64(jnp.asarray(u)),
                                    interpret=True)
        )
        want = A.T @ u
        np.testing.assert_allclose(
            np.asarray(y), want, rtol=1e-12, atol=1e-12
        )


def test_factored_vt_adj_matches_plan(rng, monkeypatch, tmp_path):
    """The factored operator with vt='adj' (Vᵀ through V's reversed
    network) matches vt='plan' (dedicated VT plan) to df64 accuracy on
    NPB class S, and builds/loads only the V plan."""
    import jax.numpy as jnp

    from lilac_tpu.kernels import factored as fc
    from lilac_tpu.ops import dfloat as df

    monkeypatch.setenv("LILAC_DATA_DIR", str(tmp_path))
    monkeypatch.setenv("LILAC_FACTORED_SEGMODE", "routed")
    monkeypatch.setenv("LILAC_FACTORED_VT", "plan")
    Ap, nnz_p = fc.build_factored("S", dtype="df64")
    monkeypatch.setenv("LILAC_FACTORED_VT", "adj")
    Aa, nnz_a = fc.build_factored("S", dtype="df64")
    assert Aa.VT is None and Ap.VT is not None and nnz_p == nnz_a
    x = rng.normal(size=1400)
    ya = df.to_f64(fc.factored_spmv_df(Aa, df.from_f64(jnp.asarray(x))))
    yp = df.to_f64(fc.factored_spmv_df(Ap, df.from_f64(jnp.asarray(x))))
    np.testing.assert_allclose(
        np.asarray(ya), np.asarray(yp), rtol=1e-12, atol=1e-12
    )


def test_hier_adjoint_consecutive_butterflies(rng):
    """Adjoint layout chaining across CONSECUTIVE butterfly passes
    (outer bits > gmax): m/bl = 32 -> 5 outer bits -> g=3 + g=2 passes
    back-to-back on each Beneš side — the configuration class D/E run
    on chip (zeta-verified), regression-pinned here on CPU."""
    import jax.numpy as jnp

    n, T, bl = 2000, 1 << 15, 1024
    idx = rng.integers(0, n, size=T)
    net = rn.build_gather_network(idx[None], n, drop_empty=False)
    assert net.m // bl == 32
    passes = rd.compile_hier(net.kinds, net.dists, net.masks[:, 0, :], bl,
                             gmax=3)
    kinds_seq = [p[0] for p in passes]
    # require the schedule to actually chain butterflies
    assert any(
        kinds_seq[i] == kinds_seq[i + 1] == "butterfly"
        for i in range(len(kinds_seq) - 1)
    ), kinds_seq
    meta = tuple(p[:-1] for p in passes)
    masks = tuple(p[-1] for p in passes)
    m = net.m

    # adjoint identity <G x, u> == <x, G^T u> on random vectors (a dense
    # operator oracle at m=2^15 costs 48G numpy ops — far too slow), plus
    # the gather-semantics check of G^T on a one-hot u: column j of G has
    # ones exactly at output slots k with idx[k] == j, so (G^T u)[j]
    # sums u over those slots.
    x = rng.normal(size=m).astype(np.float32)
    u = rng.normal(size=m).astype(np.float32)
    (gx,) = rd.hier_apply_batched(
        (jnp.asarray(x.reshape(-1, 128)),),
        meta, tuple(mk[None] for mk in masks), bl, interpret=True,
    )
    (gtu,) = rd.hier_apply_batched_t(
        (jnp.asarray(u.reshape(1, -1, 128)),),
        meta, tuple(mk[None] for mk in masks), bl, interpret=True,
    )
    lhs = float(np.asarray(gx).reshape(-1).astype(np.float64) @ u)
    rhs = float(x.astype(np.float64) @ np.asarray(gtu).reshape(-1))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
    # direct semantics on the used slots: (G^T u)[j] = sum_{k<T, idx[k]=j} u[k]
    # (don't-care slots k >= T carry filler routing, so zero them)
    uz = u.copy()
    uz[T:] = 0.0
    (gtz,) = rd.hier_apply_batched_t(
        (jnp.asarray(uz.reshape(1, -1, 128)),),
        meta, tuple(mk[None] for mk in masks), bl, interpret=True,
    )
    want = np.zeros(m, np.float64)
    np.add.at(want, idx, uz[:T].astype(np.float64))
    np.testing.assert_allclose(
        np.asarray(gtz).reshape(-1)[:n], want[:n], rtol=1e-4, atol=1e-4
    )
