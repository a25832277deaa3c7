"""SpMV through plan-time routing networks (the roofline kernel).

Pipeline per matvec: pad x into the network input slots ([m] = [R, 128]
planes), run every row-chunk's gather network in one Pallas program
(kernels/routed.py, ~0.2 ns/gathered element measured on v5e vs 1.4-5.3
ns/elem for XLA's gather engine), then multiply by the values — pre-
arranged at PLAN time into the routed slot order — and reduce each
chunk's [rows_c, K_c] block in XLA (elementwise + K-axis reduction, HBM-
bandwidth bound).

Rows are chunked after sorting by row length (descending), so each chunk
pads to its own max length (the JDS/SELL idea re-shaped for routing:
padding costs network slots, and chunk count = ceil(nnz_chunk / m)); the
row order is restored by one [n]-sized pair-gather at the end. Matrices
with near-uniform rows skip the sort entirely.

Single column segment: requires ncols <= m (the network input table holds
all of x). Column-segmented stacking for matrices beyond one table is
built on top (kernels/factored.py wires the NPB operator through this).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lilac_tpu.kernels import routed as rd
from lilac_tpu.kernels import routenet as rn
from lilac_tpu.ops import dfloat as df


@dataclasses.dataclass
class RoutedMat:
    """One sparse matrix staged as routing networks + slot-ordered values.

    vals: [B, m] (or [B, m, 2] df64) values in routed slot order — chunk
          c's term t = r_local * K_c + k sits at vals[c, t]
    chunks: static ((rows_c, K_c), ...) per network
    inv_perm: [n] int32 mapping original row -> position in the
              chunk-concatenated output; None = natural order
    """

    masks: jax.Array  # [B, S, R, 128] int8
    vals: jax.Array
    kinds: Tuple[str, ...]
    dists: Tuple[int, ...]
    chunks: Tuple[Tuple[int, int], ...]
    inv_perm: Optional[jax.Array]
    shape: Tuple[int, int]
    m: int
    # chunk slot layout: False = row-major (r*K + k), True = column-major
    # (k*rows_c + r); column-major keeps the df64 row-sum reduction in
    # rows-minor layouts (see RoutedMatHier.colmajor / df.sum_df0)
    colmajor: bool = False


jax.tree_util.register_dataclass(
    RoutedMat,
    data_fields=["masks", "vals", "inv_perm"],
    meta_fields=["kinds", "dists", "chunks", "shape", "m", "colmajor"],
)


def _pow2_at_least(x: int) -> int:
    return 1 << int(np.ceil(np.log2(max(x, 2))))


def _fill_pads_with_missing(idx_all, b_e, t_e, ncol) -> None:
    """Assign pad slots' (don't-care, zero-product) gather values to each
    chunk net's MISSING column values: full value coverage empties the
    monotone schedule's concentrate phase (routenet._monotone_stages).
    Mutates idx_all in place."""
    B, m = idx_all.shape
    assigned = np.zeros((B, m), dtype=bool)
    assigned[b_e, t_e] = True
    for b in range(B):
        used = np.zeros(ncol, dtype=bool)
        used[idx_all[b][assigned[b]]] = True
        missing = np.nonzero(~used)[0]
        pads = np.nonzero(~assigned[b])[0]
        k = min(len(missing), len(pads))
        if k:
            idx_all[b, pads[:k]] = missing[:k]


def build_routed_csr(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    shape: Tuple[int, int],
    *,
    dtype: str = "f32",
    m: int | None = None,
    sort_rows="auto",
    verbose: bool = False,
    colmajor: bool = True,
) -> RoutedMat:
    """Stage a host CSR matrix as a RoutedMat (single column segment).

    m: network size (power of two multiple of 1024, >= ncols and >= the
    longest row; default = smallest such, capped structure-side by the
    caller).
    """
    n, ncol = shape
    counts = np.diff(indptr).astype(np.int64)
    kmax = int(counts.max()) if n else 1
    if m is None:
        m = max(1024, _pow2_at_least(max(ncol, kmax)))
    assert m >= ncol and m >= kmax and m % 1024 == 0
    rd.check_vmem_feasible(
        m, m, 2 if dtype == "df64" else 1, what=f"single-table m={m}"
    )

    if sort_rows == "auto":
        sort_rows = bool(kmax > 1.25 * max(counts.mean(), 1.0) + 2)
    order = np.argsort(-counts, kind="stable") if sort_rows else np.arange(n)
    if sort_rows and np.array_equal(order, np.arange(n)):
        sort_rows = False  # already length-sorted: no un-permute needed

    # greedy chunks over the (possibly unsorted) row order: each chunk's
    # K must cover the TRUE max length inside the chunk — with
    # sort_rows=False the first row's count is NOT an upper bound, and a
    # longer row would silently overflow into its neighbour's slots
    chunks = []
    i0 = 0
    while i0 < n:
        k_c = max(int(counts[order[i0]]), 1)
        rows_c = min(m // k_c, n - i0)
        k_true = max(int(counts[order[i0 : i0 + rows_c]].max()), 1)
        if k_true > k_c:
            rows_c = min(m // k_true, n - i0)
            k_c = max(int(counts[order[i0 : i0 + rows_c]].max()), 1)
        chunks.append((i0, rows_c, k_c))
        i0 += rows_c
    B = len(chunks)

    # vectorized slot assignment: entry e of row r -> (chunk_of[r],
    # row-major r_local*K + slot | column-major slot*rows_c + r_local)
    chunk_of = np.empty(n, dtype=np.int64)
    r_local = np.empty(n, dtype=np.int64)
    k_of_chunk = np.empty(B, dtype=np.int64)
    rowsc_of_chunk = np.empty(B, dtype=np.int64)
    for b, (i0, rows_c, k_c) in enumerate(chunks):
        chunk_of[order[i0 : i0 + rows_c]] = b
        r_local[order[i0 : i0 + rows_c]] = np.arange(rows_c)
        k_of_chunk[b] = k_c
        rowsc_of_chunk[b] = rows_c
    rows_rep = np.repeat(np.arange(n), counts)
    slot_in_row = np.arange(len(indices)) - np.repeat(indptr[:-1], counts)
    b_e = chunk_of[rows_rep]
    if colmajor:
        t_e = slot_in_row * rowsc_of_chunk[b_e] + r_local[rows_rep]
    else:
        t_e = r_local[rows_rep] * k_of_chunk[b_e] + slot_in_row

    idx_all = np.zeros((B, m), dtype=np.int64)
    idx_all[b_e, t_e] = indices
    if dtype == "df64":
        dvals = df.split_f64_np(data)
    else:
        dvals = data.astype({"f32": np.float32, "f64": np.float64}[dtype])
    vals = np.zeros((B, m) + dvals.shape[1:], dtype=dvals.dtype)
    vals[b_e, t_e] = dvals

    from lilac_tpu.config import cfg as _cfg

    mode = _cfg().net_mode
    if mode == "monotone":
        _fill_pads_with_missing(idx_all, b_e, t_e, ncol)

    net = rn.build_gather_network(idx_all, ncol, m, mode=mode)
    if verbose:
        print(
            f"routed: n={n} m={m} chunks={B} stages={len(net.kinds)} "
            f"masks={net.masks.nbytes / 1e6:.0f}MB(bool)"
        )
    if sort_rows:
        inv_perm = np.empty(n, dtype=np.int64)
        inv_perm[order] = np.arange(n)
        inv = jnp.asarray(inv_perm, dtype=jnp.int32)
    else:
        inv = None
    return RoutedMat(
        masks=rd.masks_device(net),
        vals=jnp.asarray(vals),
        kinds=net.kinds,
        dists=net.dists,
        chunks=tuple((rc, kc) for _, rc, kc in chunks),
        inv_perm=inv,
        shape=tuple(shape),
        m=m,
        colmajor=colmajor,
    )


# ---------------------------------------------------------------------------
# matvecs
# ---------------------------------------------------------------------------


def _pad_plane(x: jax.Array, m: int) -> jax.Array:
    return jnp.pad(x, (0, m - x.shape[0])).reshape(m // 128, 128)


def routed_spmv(A: RoutedMat, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    (out,) = rd.routed_apply(
        [_pad_plane(x.astype(A.vals.dtype), A.m)],
        A.masks,
        A.kinds,
        A.dists,
        interpret=interpret,
    )
    prod = A.vals * out.reshape(len(A.chunks), A.m)
    y = _chunk_reduce(prod, A.chunks, A.m, A.colmajor)
    if A.inv_perm is not None:
        from lilac_tpu.kernels.xla import pair_gather

        y = pair_gather(y, A.inv_perm)
    return y[: A.shape[0]]


def routed_spmv_df(A: RoutedMat, x: df.DF, *, interpret: bool = False) -> df.DF:
    oh, ol = rd.routed_apply(
        [_pad_plane(x.hi, A.m), _pad_plane(x.lo, A.m)],
        A.masks,
        A.kinds,
        A.dists,
        interpret=interpret,
    )
    B = len(A.chunks)
    hi, lo = _mulreduce_df_2d(
        A.vals, oh.reshape(B, A.m), ol.reshape(B, A.m), A.chunks,
        A.colmajor, interpret=interpret,
    )
    if A.inv_perm is not None:
        ys = jnp.stack([hi, lo], axis=-1)
        g = ys[A.inv_perm]
        return df.DF(g[: A.shape[0], 0], g[: A.shape[0], 1])
    return df.DF(hi[: A.shape[0]], lo[: A.shape[0]])


def routed_spmv_adj_t(
    A: RoutedMat, u: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """y = Aᵀ @ u through the FORWARD plan's own masks (f32).

    The gather network G is run in reverse with add-merges
    (rd.routed_apply_t): Aᵀ = Gᵀ·diag(vals)·Rᵀ, where Rᵀ expands row
    cotangents back to their chunk slots (a tile/repeat — no data
    motion) and Gᵀ scatter-adds slots into x-space. The transpose
    therefore costs ZERO extra plan bytes — no second network, no CSC
    copy (the reference stages a separate transposed operator for
    BiCG's Aᵀp, SparseBench iter.f). This is the f32 path; df64 is
    routed_spmv_adj_t_df (compensated in-kernel merges)."""
    n, ncol = A.shape
    B = len(A.chunks)
    if A.inv_perm is not None:
        us = jnp.zeros((n,), u.dtype).at[A.inv_perm].set(u[:n])
    else:
        us = u[:n]
    slots = []
    off = 0
    for (rows_c, k_c) in A.chunks:
        uc = us[off : off + rows_c]
        seg = jnp.tile(uc, k_c) if A.colmajor else jnp.repeat(uc, k_c)
        slots.append(jnp.pad(seg, (0, A.m - rows_c * k_c)))
        off += rows_c
    sl = jnp.stack(slots)  # [B, m] in slot order
    prod = (A.vals * sl).astype(u.dtype)
    planes = prod.reshape(B, A.m // 128, 128)
    (out,) = rd.routed_apply_t(
        [planes], A.masks, A.kinds, A.dists, interpret=interpret
    )
    y = out.reshape(B, A.m).sum(axis=0)
    return y[:ncol]


def routed_spmv_adj_t_df(
    A: RoutedMat, u: df.DF, *, interpret: bool = False
) -> df.DF:
    """y = Aᵀ @ u through the forward plan's masks, df64: the reverse
    network's add-merges run as compensated TwoSums in-kernel (see
    rd._stage_adj), so the transpose product keeps f64-grade accuracy —
    zero extra plan bytes for BiCG's Aᵀp (SparseBench iter.f:82-85)."""
    n, ncol = A.shape
    B = len(A.chunks)
    if A.inv_perm is not None:
        uh = jnp.zeros((n,), u.hi.dtype).at[A.inv_perm].set(u.hi[:n])
        ul = jnp.zeros((n,), u.lo.dtype).at[A.inv_perm].set(u.lo[:n])
    else:
        uh, ul = u.hi[:n], u.lo[:n]
    sh, sl = [], []
    off = 0
    for (rows_c, k_c) in A.chunks:
        ch, cl = uh[off : off + rows_c], ul[off : off + rows_c]
        if A.colmajor:
            eh, el = jnp.tile(ch, k_c), jnp.tile(cl, k_c)
        else:
            eh, el = jnp.repeat(ch, k_c), jnp.repeat(cl, k_c)
        pad = A.m - rows_c * k_c
        sh.append(jnp.pad(eh, (0, pad)))
        sl.append(jnp.pad(el, (0, pad)))
        off += rows_c
    slots = df.DF(jnp.stack(sh), jnp.stack(sl))  # [B, m]
    vals = df.DF(A.vals[..., 0], A.vals[..., 1])
    prod = df.mul(vals, slots)
    oh, ol = rd.routed_apply_t(
        [prod.hi.reshape(B, A.m // 128, 128), prod.lo.reshape(B, A.m // 128, 128)],
        A.masks, A.kinds, A.dists, dfpair=True, interpret=interpret,
    )
    y = df.sum_df0(df.DF(oh.reshape(B, A.m), ol.reshape(B, A.m)))
    return df.DF(y.hi[:ncol], y.lo[:ncol])


# ---------------------------------------------------------------------------
# column-segmented routing (matrices whose x exceeds one network table)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RoutedMatSeg:
    """Column-segmented RoutedMat: one network group per column segment.

    All segments share ONE global row order (descending total degree) so
    their chunk-concatenated partial sums align; y accumulates across
    segments in sorted order and a single [n] pair-gather restores the
    natural order at the end (per-segment orders would need one n-sized
    un-permute EACH — measured 5.3 ns/elem on >3MB tables, which would
    cancel the routing win at class-D scale).
    """

    masks: tuple  # per-seg [B_s, P_s, R, 128] int8
    vals: tuple  # per-seg [B_s, m] (or [.., 2])
    kinds: Tuple[Tuple[str, ...], ...]
    dists: Tuple[Tuple[int, ...], ...]
    chunks: Tuple[Tuple[Tuple[int, int], ...], ...]
    inv_perm: Optional[jax.Array]
    shape: Tuple[int, int]
    m: int
    seg_size: int
    colmajor: bool = False  # see RoutedMat.colmajor


jax.tree_util.register_dataclass(
    RoutedMatSeg,
    data_fields=["masks", "vals", "inv_perm"],
    meta_fields=["kinds", "dists", "chunks", "shape", "m", "seg_size",
                 "colmajor"],
)


def build_routed_csr_seg(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    shape: Tuple[int, int],
    *,
    dtype: str = "f32",
    seg_size: int = 1 << 18,
    verbose: bool = False,
    colmajor: bool = True,
) -> RoutedMatSeg:
    """Stage a host CSR as column-segmented routing networks."""
    n, ncol = shape
    m = seg_size
    rd.check_vmem_feasible(
        m, m, 2 if dtype == "df64" else 1, what=f"seg-table m={m}"
    )
    nseg = -(-ncol // seg_size)
    counts = np.diff(indptr).astype(np.int64)
    order = np.argsort(-counts, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)

    if dtype == "df64":
        dvals = df.split_f64_np(data)
    else:
        dvals = data.astype({"f32": np.float32, "f64": np.float64}[dtype])

    rows_rep = np.repeat(np.arange(n), counts)
    seg_of = indices // seg_size
    # per (row, seg) counts and within-run slots (entries column-sorted)
    rs_counts = np.zeros((n, nseg), dtype=np.int64)
    np.add.at(rs_counts, (rows_rep, seg_of), 1)
    run_key = rows_rep * nseg + seg_of
    run_start = np.zeros(len(indices), dtype=bool)
    if len(indices):
        run_start[0] = True
        run_start[1:] = run_key[1:] != run_key[:-1]
    run_id = np.cumsum(run_start) - 1
    first_of_run = np.zeros(run_id[-1] + 1 if len(indices) else 0, dtype=np.int64)
    first_of_run[run_id[run_start]] = np.nonzero(run_start)[0]
    slot_in_run = np.arange(len(indices)) - first_of_run[run_id]

    seg_masks, seg_vals, seg_kinds, seg_dists, seg_chunks = [], [], [], [], []
    for s in range(nseg):
        cs = rs_counts[order, s]  # per-row seg counts in GLOBAL sorted order
        # greedy chunks over the shared order; K = max count inside chunk
        # (counts are NOT monotone in this order — scan for the max)
        chunks = []
        i0 = 0
        while i0 < n:
            k_c = max(int(cs[i0]), 1)
            rows_c = min(m // k_c, n - i0)
            k_true = int(cs[i0 : i0 + rows_c].max())
            if k_true > k_c:
                rows_c = min(m // k_true, n - i0)
                k_c = int(cs[i0 : i0 + rows_c].max())
            else:
                k_c = k_true if k_true else 1
            chunks.append((i0, rows_c, k_c))
            i0 += rows_c
        B = len(chunks)
        chunk_of = np.empty(n, dtype=np.int64)
        r_local = np.empty(n, dtype=np.int64)
        k_of_chunk = np.empty(B, dtype=np.int64)
        for b, (i0, rows_c, k_c) in enumerate(chunks):
            chunk_of[order[i0 : i0 + rows_c]] = b
            r_local[order[i0 : i0 + rows_c]] = np.arange(rows_c)
            k_of_chunk[b] = k_c
        sel = seg_of == s
        rr = rows_rep[sel]
        b_e = chunk_of[rr]
        if colmajor:
            rowsc_of = np.array([rc for _, rc, _ in chunks], dtype=np.int64)
            t_e = slot_in_run[sel] * rowsc_of[b_e] + r_local[rr]
        else:
            t_e = r_local[rr] * k_of_chunk[b_e] + slot_in_run[sel]
        idx_all = np.zeros((B, m), dtype=np.int64)
        idx_all[b_e, t_e] = indices[sel] - s * seg_size
        vals = np.zeros((B, m) + dvals.shape[1:], dtype=dvals.dtype)
        vals[b_e, t_e] = dvals[sel]
        from lilac_tpu.config import cfg as _cfg

        mode = _cfg().net_mode
        ncol_s = min(seg_size, ncol - s * seg_size)
        if mode == "monotone":
            _fill_pads_with_missing(idx_all, b_e, t_e, ncol_s)
        net = rn.build_gather_network(idx_all, ncol_s, m, mode=mode)
        if verbose:
            print(
                f"  seg {s}: chunks={B} stages={len(net.kinds)} "
                f"masks={net.masks.nbytes / 1e6:.0f}MB(bool)", flush=True,
            )
        seg_masks.append(rd.masks_device(net))
        seg_vals.append(jnp.asarray(vals))
        seg_kinds.append(net.kinds)
        seg_dists.append(net.dists)
        seg_chunks.append(tuple((rc, kc) for _, rc, kc in chunks))

    return RoutedMatSeg(
        masks=tuple(seg_masks),
        vals=tuple(seg_vals),
        kinds=tuple(seg_kinds),
        dists=tuple(seg_dists),
        chunks=tuple(seg_chunks),
        inv_perm=jnp.asarray(rank, dtype=jnp.int32),
        shape=tuple(shape),
        m=m,
        seg_size=seg_size,
        colmajor=colmajor,
    )


def _chunk_reduce(prod_flat, chunks, m, colmajor=False):
    parts = []
    for c, (rows_c, k_c) in enumerate(chunks):
        p = prod_flat[c, : rows_c * k_c]
        if colmajor:
            parts.append(jnp.sum(p.reshape(k_c, rows_c), axis=0))
        else:
            parts.append(jnp.sum(p.reshape(rows_c, k_c), axis=1))
    return jnp.concatenate(parts)


def _chunk_reduce_df(prod, chunks, colmajor=False):
    """df64 single-table ELL row sums -> (hi, lo) concatenated 1D arrays.
    Column-major chunks reduce over the major axis (df.sum_df0) so no
    barriered EFT intermediate takes a K-minor tile-padded layout."""
    his, los = [], []
    for c, (rows_c, k_c) in enumerate(chunks):
        ph = prod.hi[c, : rows_c * k_c]
        pl_ = prod.lo[c, : rows_c * k_c]
        if colmajor:
            t = df.sum_df0(
                df.DF(ph.reshape(k_c, rows_c), pl_.reshape(k_c, rows_c))
            )
        else:
            t = df.sum_df(
                df.DF(ph.reshape(rows_c, k_c), pl_.reshape(rows_c, k_c)),
                axis=1,
            )
        his.append(t.hi)
        los.append(t.lo)
    return jnp.concatenate(his), jnp.concatenate(los)


def _mulreduce_df_2d(vals, oh, ol, chunks, colmajor, *, interpret=False):
    """df64 mul+row-sum for the [B, m] single-table/seg containers:
    chunk c is net-row c's leading rows_c*k_c slots. Dispatches to the
    fused Pallas kernel on TPU col-major plans, else the XLA chain."""
    from lilac_tpu.kernels.dfmulred import chunk_mulreduce_df, fused_available

    if colmajor and fused_available():
        his, los = [], []
        for c, (rows_c, k_c) in enumerate(chunks):
            h, l_ = chunk_mulreduce_df(
                vals[c], oh[c], ol[c], ((0, rows_c, k_c),), True,
                interpret=interpret,
            )
            his.append(h)
            los.append(l_)
        return jnp.concatenate(his), jnp.concatenate(los)
    a = df.DF(vals[..., 0], vals[..., 1])
    prod = df.mul(a, df.DF(oh, ol))
    return _chunk_reduce_df(prod, chunks, colmajor)


def routed_seg_spmv(A: RoutedMatSeg, x: jax.Array, *, interpret: bool = False) -> jax.Array:
    n = A.shape[0]
    y = None
    xp = jnp.pad(x, (0, A.m * len(A.masks) - x.shape[0]))
    for s in range(len(A.masks)):
        lo_c = s * A.seg_size
        xs = jax.lax.dynamic_slice_in_dim(xp, lo_c, A.m, 0)
        (out,) = rd.routed_apply(
            [xs.reshape(A.m // 128, 128)], A.masks[s], A.kinds[s], A.dists[s],
            interpret=interpret,
        )
        t = _chunk_reduce(
            A.vals[s] * out.reshape(len(A.chunks[s]), A.m),
            A.chunks[s], A.m, A.colmajor,
        )
        y = t if y is None else y + t
    from lilac_tpu.kernels.xla import pair_gather

    return pair_gather(y, A.inv_perm)


def routed_seg_spmv_df(A: RoutedMatSeg, x: df.DF, *, interpret: bool = False) -> df.DF:
    y = None
    npad = A.m * len(A.masks)
    xh = jnp.pad(x.hi, (0, npad - x.hi.shape[0]))
    xl = jnp.pad(x.lo, (0, npad - x.lo.shape[0]))
    for s in range(len(A.masks)):
        lo_c = s * A.seg_size
        hs = jax.lax.dynamic_slice_in_dim(xh, lo_c, A.m, 0).reshape(A.m // 128, 128)
        ls = jax.lax.dynamic_slice_in_dim(xl, lo_c, A.m, 0).reshape(A.m // 128, 128)
        oh, ol = rd.routed_apply(
            [hs, ls], A.masks[s], A.kinds[s], A.dists[s], interpret=interpret
        )
        B = len(A.chunks[s])
        hi, lo = _mulreduce_df_2d(
            A.vals[s], oh.reshape(B, A.m), ol.reshape(B, A.m), A.chunks[s],
            A.colmajor, interpret=interpret,
        )
        t = df.DF(hi, lo)
        # every segment contributes to every row: compensated df add keeps
        # the (hi, lo) pair non-overlapping across the segment merge
        y = t if y is None else df.add(y, t)
    ys = jnp.stack([y.hi, y.lo], axis=-1)
    g = ys[A.inv_perm]
    return df.DF(g[..., 0], g[..., 1])


# ---------------------------------------------------------------------------
# plan cache (network construction is one-time host work worth persisting,
# the same discipline as the generator's matrix cache — SURVEY.md section 5)
# ---------------------------------------------------------------------------

_CACHE_VERSION = 2


def _savez_atomic(path: str, **kv) -> None:
    """np.savez via a per-process temp + os.replace: a concurrent reader
    (e.g. a chip session loading while a host prebuild writes the same
    cache key) can never see a torn zip, and two writers last-win whole
    files instead of interleaving."""
    import glob as _glob
    import os as _os

    import numpy as _np

    # Dot-prefix the temp name so plan-cache globs (data/plan_**.npz,
    # data/routed2_*) can never match an in-progress write, and a writer
    # killed mid-savez (SIGKILL skips the finally) leaves only a hidden
    # stale file; sweep stale temps for this path from earlier kills —
    # but ONLY temps whose owning pid is dead: a live concurrent writer
    # (chip session + host prebuild sharing a cache key) must keep its
    # in-flight temp or its os.replace raises FileNotFoundError.
    # Must end in .npz or np.savez appends the suffix and the replace
    # source would not exist.
    d, base = _os.path.split(path)
    for old in _glob.glob(_os.path.join(d, f".tmp_*_{base}")):
        try:
            # a recycled PID can make os.kill(pid, 0) succeed for an
            # unrelated process and pin a dead writer's temp forever
            # (round-4 advisor): age-gate first — no plan savez takes
            # hours, so a 6h-old temp is stale whatever its pid says
            import time as _time

            if _time.time() - _os.path.getmtime(old) > 6 * 3600:
                _os.unlink(old)
                continue
        except OSError:
            pass
        try:
            owner = int(_os.path.basename(old).split("_", 2)[1])
            _os.kill(owner, 0)  # raises if owner is gone
        except (ValueError, IndexError, ProcessLookupError):
            try:
                _os.unlink(old)
            except OSError:
                pass
        except OSError:
            # EPERM etc: pid exists but isn't ours — leave it alone
            pass
    tmp = _os.path.join(d, f".tmp_{_os.getpid()}_{base}")
    try:
        _np.savez(tmp, **kv)
        _os.replace(tmp, path)
    finally:
        if _os.path.exists(tmp):
            _os.unlink(tmp)


def save_routed(path: str, M) -> None:
    import json as _json

    import numpy as _np

    assert not isinstance(M, RoutedMatHierP), (
        "save the unpacked RoutedMatHier (callers pack AFTER save; the "
        "disk format is per-net so old caches stay loadable)"
    )
    kv = {"version": _CACHE_VERSION, "cls": type(M).__name__,
          "shape": _np.asarray(M.shape), "m": M.m}
    if isinstance(M, RoutedMatHier):
        kv["meta"] = _json.dumps(
            {
                "chunks": M.chunks,
                "m_out": M.m_out,
                "bl": M.bl,
                "n_nz": M.n_nz,
                "colmajor": bool(M.colmajor),
                "nets_meta": [net.pass_meta for net in M.nets],
                "unperm_meta": (
                    M.unperm.pass_meta if M.unperm is not None else None
                ),
                "nets_npass": [len(net.pass_masks) for net in M.nets],
            }
        )
        for i, net in enumerate(M.nets):
            kv[f"vals{i}"] = _np.asarray(M.vals[i])
            for j, mk in enumerate(net.pass_masks):
                kv[f"net{i}_mask{j}"] = _np.asarray(mk)
        for j, mk in enumerate(
            M.unperm.pass_masks if M.unperm is not None else ()
        ):
            kv[f"unperm_mask{j}"] = _np.asarray(mk)
        _savez_atomic(path, **kv)
        return
    kv["colmajor"] = int(M.colmajor)
    if isinstance(M, RoutedMat):
        kv.update(
            masks=_np.asarray(M.masks), vals=_np.asarray(M.vals),
            kinds=_np.array(M.kinds), dists=_np.asarray(M.dists),
            chunks=_np.asarray(M.chunks),
            inv_perm=_np.asarray(M.inv_perm) if M.inv_perm is not None else _np.zeros(0, _np.int32),
        )
    else:
        kv["seg_size"] = M.seg_size
        kv["nseg"] = len(M.masks)
        kv["inv_perm"] = _np.asarray(M.inv_perm)
        for s in range(len(M.masks)):
            kv[f"masks{s}"] = _np.asarray(M.masks[s])
            kv[f"vals{s}"] = _np.asarray(M.vals[s])
            kv[f"kinds{s}"] = _np.array(M.kinds[s])
            kv[f"dists{s}"] = _np.asarray(M.dists[s])
            kv[f"chunks{s}"] = _np.asarray(M.chunks[s])
    _savez_atomic(path, **kv)


def load_routed(path: str):
    import numpy as _np

    z = _np.load(path, allow_pickle=False)
    if int(z["version"]) != _CACHE_VERSION:
        return None
    shape = tuple(int(v) for v in z["shape"])
    m = int(z["m"])
    if str(z["cls"]) == "RoutedMatHier":
        import json as _json

        def detuple(x):
            if isinstance(x, list):
                return tuple(detuple(v) for v in x)
            return x

        meta = _json.loads(str(z["meta"]))
        # hier masks/vals stay HOST-side numpy here: pack_hier stacks on
        # host and uploads each stacked pass once. Loading straight to
        # device then packing held TWO full copies in HBM (per-net +
        # stacked) — an 8.5 GB plan OOMed a 16 GB chip during class-E
        # staging (2026-08-20). maybe_pack_hier uploads the non-packed
        # path instead.
        nets = []
        vals = []
        for i, npass in enumerate(meta["nets_npass"]):
            nets.append(
                HierNet(
                    pass_masks=tuple(
                        _np.asarray(z[f"net{i}_mask{j}"]) for j in range(npass)
                    ),
                    pass_meta=detuple(meta["nets_meta"][i]),
                )
            )
            vals.append(_np.asarray(z[f"vals{i}"]))
        if meta["unperm_meta"] is None:
            unperm = None
        else:
            nup = len(detuple(meta["unperm_meta"]))
            unperm = HierNet(
                pass_masks=tuple(
                    _np.asarray(z[f"unperm_mask{j}"]) for j in range(nup)
                ),
                pass_meta=detuple(meta["unperm_meta"]),
            )
        # caches written by older configs may encode passes the current
        # kernels cannot fit in scoped VMEM — reject at load, not on chip.
        # Check EVERY net: compile_hier emits per-net pass schedules
        # (butterfly G varies with stage count), so the worst pass can sit
        # in any net; the check is host arithmetic on tiny tuples.
        nplanes = 2 if vals and vals[0].ndim == 2 else 1
        for net in nets + ([unperm] if unperm is not None else []):
            rd.check_vmem_feasible(
                net.pass_meta, int(meta["bl"]), nplanes,
                what=f"cached hier plan {path}",
            )
        return RoutedMatHier(
            nets=tuple(nets), vals=tuple(vals), unperm=unperm,
            chunks=detuple(meta["chunks"]), shape=shape, m=m,
            m_out=int(meta["m_out"]), bl=int(meta["bl"]),
            n_nz=int(meta["n_nz"]),
            # caches written before the column-major layout existed carry
            # no flag and are row-major; both layouts stay loadable
            colmajor=bool(meta.get("colmajor", False)),
        )
    # pre-colmajor caches carry no flag and are row-major
    cm = bool(int(z["colmajor"])) if "colmajor" in z.files else False
    if str(z["cls"]) == "RoutedMat":
        inv = z["inv_perm"]
        return RoutedMat(
            masks=jnp.asarray(z["masks"]), vals=jnp.asarray(z["vals"]),
            kinds=tuple(str(k) for k in z["kinds"]),
            dists=tuple(int(d) for d in z["dists"]),
            chunks=tuple((int(a), int(b)) for a, b in z["chunks"]),
            inv_perm=jnp.asarray(inv) if len(inv) else None,
            shape=shape, m=m, colmajor=cm,
        )
    nseg = int(z["nseg"])
    return RoutedMatSeg(
        masks=tuple(jnp.asarray(z[f"masks{s}"]) for s in range(nseg)),
        vals=tuple(jnp.asarray(z[f"vals{s}"]) for s in range(nseg)),
        kinds=tuple(tuple(str(k) for k in z[f"kinds{s}"]) for s in range(nseg)),
        dists=tuple(tuple(int(d) for d in z[f"dists{s}"]) for s in range(nseg)),
        chunks=tuple(
            tuple((int(a), int(b)) for a, b in z[f"chunks{s}"]) for s in range(nseg)
        ),
        inv_perm=jnp.asarray(z["inv_perm"]),
        shape=shape, m=m, seg_size=int(z["seg_size"]), colmajor=cm,
    )


# ---------------------------------------------------------------------------
# hierarchical routing: one full-size network per term super-block
# (no column segmentation — stage distances above the VMEM block size run
# as butterfly/window passes, see kernels/routed.py)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HierNet:
    """Device half of a compile_hier pass schedule (pytree)."""

    pass_masks: tuple  # one device mask array per pass
    pass_meta: tuple  # static: ("inner", kinds, dists) | ("butterfly",
    #                    bits) | ("bigshift", d) | ("window", dists)


jax.tree_util.register_dataclass(
    HierNet, data_fields=["pass_masks"], meta_fields=["pass_meta"]
)


def _split_hier(passes):
    masks, meta = [], []
    for p in passes:
        masks.append(p[-1])
        meta.append(p[:-1])
    return HierNet(pass_masks=tuple(masks), pass_meta=tuple(meta))


def hier_net_apply(net: HierNet, planes, bl: int, *, interpret: bool = False):
    passes = [m + (mk,) for m, mk in zip(net.pass_meta, net.pass_masks)]
    return rd.hier_apply(planes, passes, bl, interpret=interpret)


@dataclasses.dataclass
class RoutedMatHier:
    """Sparse matrix staged as hierarchical routing networks.

    nets[i] gathers x into net i's term slots; vals[i] [m(,2)] multiplies
    in slot order; chunks[i] = ((slot0, rows_c, K_c), ...) describe the
    ELL sub-blocks packed into the net. Rows globally sorted by length
    (tight K); `unperm` routes the chunk-concatenated sorted y back to
    natural order (an [n]-gather would hit the slow big-table path).
    """

    nets: tuple
    vals: tuple
    unperm: HierNet
    chunks: tuple
    shape: Tuple[int, int]
    m: int
    m_out: int
    bl: int
    n_nz: int  # rows with nonzero count = length of the sorted concat
    # slot layout inside each (s0, rows_c, K) chunk: False = row-major
    # (entry k of local row r at s0 + r*K + k), True = column-major
    # (s0 + k*rows_c + r). Column-major keeps the row-sum reduction in
    # rows-minor (K, rows_c) layouts — no 128-lane tile padding on the
    # df64 EFT intermediates (see df.sum_df0). Beneš hier nets have
    # permutation-independent depth, so the layout choice is free on the
    # routing side.
    colmajor: bool = False


jax.tree_util.register_dataclass(
    RoutedMatHier,
    data_fields=["nets", "vals", "unperm"],
    meta_fields=["chunks", "shape", "m", "m_out", "bl", "n_nz", "colmajor"],
)


@dataclasses.dataclass
class HierGroup:
    """A batch of hier nets sharing one pass schedule, masks stacked on a
    leading net axis (see rd.hier_apply_batched).

    vals are stored PLANE-SHAPED — [Ng, m//128, 128] (f32) or
    [2, Ng, m//128, 128] (df64; index 0=hi, 1=lo) — so XLA's (8, 128)
    tiling lands on the two big minor dims. The former [Ng, m(,2)]
    layout put Ng on the sublane axis: at class E (Ng=5, m=2^24) XLA
    padded 5→8, a 1.6x expansion that alone blew HBM by 1.1 GB
    (measured OOM 2026-08-20, tools/out7/classE_adj3.log)."""

    pass_masks: tuple  # per pass: [Ng, ...] stacked device masks
    vals: jax.Array  # [Ng, R, 128] f32 | [2, Ng, R, 128] df64
    pass_meta: tuple  # static, shared by all Ng nets
    net_ids: tuple  # static: original net indices (row-order bookkeeping)

    @property
    def dfpair(self) -> bool:
        return self.vals.ndim == 4


jax.tree_util.register_dataclass(
    HierGroup, data_fields=["pass_masks", "vals"],
    meta_fields=["pass_meta", "net_ids"],
)


@dataclasses.dataclass
class RoutedMatHierP:
    """RoutedMatHier with nets packed into schedule-groups: each pass over
    a group is ONE pallas_call (grid (nblocks, Ng)) instead of Ng calls.
    At NPB class D this collapses ~500 traced pallas ops per matvec to
    ~15 — the difference between a 45-minute and a ~1-minute remote
    compile, and it removes ~500 per-op dispatch overheads per matvec.
    Disk format is unchanged (v2 per-net masks); packing happens at
    build/load (maybe_pack_hier), stacking on HOST so the device upload
    is a few large transfers instead of ~500 small ones."""

    groups: tuple  # HierGroup
    unperm: HierNet
    chunks: tuple  # per ORIGINAL net id (same as RoutedMatHier.chunks)
    shape: Tuple[int, int]
    m: int
    m_out: int
    bl: int
    n_nz: int
    colmajor: bool = False  # see RoutedMatHier.colmajor

    @property
    def vals(self):  # traffic accounting (profiling.spmv_traffic_bytes)
        return tuple(g.vals for g in self.groups)


jax.tree_util.register_dataclass(
    RoutedMatHierP,
    data_fields=["groups", "unperm"],
    meta_fields=["chunks", "shape", "m", "m_out", "bl", "n_nz", "colmajor"],
)


def pack_hier(M: RoutedMatHier) -> RoutedMatHierP:
    """Group nets by identical pass schedule and stack their masks/vals on
    a leading net axis (host-side stack, then one device put per pass).
    LILAC_HIER_GROUP_MAX caps nets per group: each pass materializes
    [Ng, m] planes in+out, so bounding Ng bounds the intermediates.
    Unset, the cap derives itself from the plan size (round-4 verdict
    weak #7: class-E staging needed env-var folklore): pass intermediates
    are bounded to ~1.5 GB, which reproduces the measured-good configs —
    cap 5 at class E (m=2^24 df64), effectively unlimited at class D."""
    from lilac_tpu.config import cfg as _cfg

    gmax_nets = _cfg().hier_group_max
    if gmax_nets is None:
        nplanes = 2 if M.vals and M.vals[0].ndim == 2 else 1
        per_net = M.m * 4 * nplanes * 2  # in+out planes per pass
        gmax_nets = max(1, int(1.5e9 // per_net))
    order: list = []
    by_key: dict = {}
    for i, net in enumerate(M.nets):
        key = net.pass_meta
        if key not in by_key:
            by_key[key] = []
            order.append(key)
        by_key[key].append(i)
    id_lists = []
    for key in order:
        ids = by_key[key]
        if gmax_nets is None or len(ids) <= gmax_nets:
            id_lists.append((key, ids))
        else:
            for g0 in range(0, len(ids), gmax_nets):
                id_lists.append((key, ids[g0 : g0 + gmax_nets]))
    R = M.m // 128
    groups = []
    for key, ids in id_lists:
        stacked = tuple(
            jnp.asarray(
                np.stack([np.asarray(M.nets[i].pass_masks[j]) for i in ids])
            )
            for j in range(len(key))
        )
        vh = np.stack([np.asarray(M.vals[i]) for i in ids])  # [Ng, m(,2)]
        if vh.ndim == 3:  # df64: split words, plane-shape each
            vals = jnp.asarray(
                np.stack([
                    vh[..., 0].reshape(len(ids), R, 128),
                    vh[..., 1].reshape(len(ids), R, 128),
                ])
            )
        else:
            vals = jnp.asarray(vh.reshape(len(ids), R, 128))
        groups.append(
            HierGroup(pass_masks=stacked, vals=vals, pass_meta=key,
                      net_ids=tuple(ids))
        )
    unperm = M.unperm
    if unperm is not None:
        # load_routed stages hier masks host-side; upload the un-permute
        # net here so matvecs never feed numpy leaves into jit
        unperm = HierNet(
            pass_masks=tuple(jnp.asarray(m) for m in unperm.pass_masks),
            pass_meta=unperm.pass_meta,
        )
    return RoutedMatHierP(
        groups=tuple(groups), unperm=unperm, chunks=M.chunks,
        shape=M.shape, m=M.m, m_out=M.m_out, bl=M.bl, n_nz=M.n_nz,
        colmajor=M.colmajor,
    )


def maybe_pack_hier(M):
    """Pack hier containers when the (default-on) LILAC_HIER_PACK knob is
    set; pass anything else through unchanged. Hier containers from
    load_routed stage masks/vals as host numpy (see load_routed); the
    non-packed branch uploads them here so both paths end device-side
    with exactly one HBM copy."""
    from lilac_tpu.config import cfg

    if isinstance(M, RoutedMatHier):
        if cfg().hier_pack:
            return pack_hier(M)
        leaves = jax.tree_util.tree_leaves((M.nets, M.vals, M.unperm))
        if all(isinstance(x, jax.Array) for x in leaves):
            return M  # already device-side (fresh build): identity
        return RoutedMatHier(
            nets=tuple(
                HierNet(
                    pass_masks=tuple(jnp.asarray(m) for m in net.pass_masks),
                    pass_meta=net.pass_meta,
                )
                for net in M.nets
            ),
            vals=tuple(jnp.asarray(v) for v in M.vals),
            unperm=(
                None
                if M.unperm is None
                else HierNet(
                    pass_masks=tuple(
                        jnp.asarray(m) for m in M.unperm.pass_masks
                    ),
                    pass_meta=M.unperm.pass_meta,
                )
            ),
            chunks=M.chunks, shape=M.shape, m=M.m, m_out=M.m_out, bl=M.bl,
            n_nz=M.n_nz, colmajor=M.colmajor,
        )
    return M


def _hier_gmax_cfg(bl: int, dtype: str) -> int:
    """Butterfly group exponent: explicit LILAC_HIER_GMAX wins, else the
    VMEM-budget derivation. A butterfly pass costs ~1 mask byte per slot
    whatever its stage count, so g=3 (when VMEM allows: g=3 at bl=2^16
    df64 needs ~18 MB of the 128 MB v5e VMEM) cuts plan mask bytes and
    HBM mask streams by ~1/3 vs g=2."""
    from lilac_tpu.config import cfg

    g = cfg().hier_gmax
    if g is not None:
        return int(g)
    return rd.hier_gmax(bl, 2 if dtype == "df64" else 1)


def build_routed_csr_hier(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    shape: Tuple[int, int],
    *,
    dtype: str = "f32",
    bl: int = 1 << 16,
    m: int | None = None,
    host_batch: int = 4,
    verbose: bool = False,
    colmajor: bool = True,
) -> RoutedMatHier:
    n, ncol = shape
    counts = np.diff(indptr).astype(np.int64)
    kmax = int(counts.max()) if n else 1
    if m is None:
        m = max(2 * bl, _pow2_at_least(max(ncol, kmax)))
    assert m >= ncol and m % bl == 0
    # fail fast on a VMEM-infeasible bl/gmax BEFORE the expensive network
    # build (and long before a chip window burns on a Mosaic compile error)
    nplanes = 2 if dtype == "df64" else 1
    g0max = _hier_gmax_cfg(bl, dtype)
    rd.check_vmem_feasible(
        (("butterfly", tuple(range(g0max))), ("window", ()), ("inner", (), ())),
        bl, nplanes, what=f"hier bl={bl} gmax={g0max}",
    )

    order = np.argsort(-counts, kind="stable")
    sorted_counts = counts[order]
    n_nz = int(np.searchsorted(-sorted_counts, 0, side="left"))

    # pack (rows_c, K) chunks into m-slot nets; K = first (max) count in
    # chunk, rows capped where counts fall below 3/4 K to keep K tight
    nets_chunks = []  # per net: list of (slot0, rows_c, K)
    cur, used = [], 0
    i = 0
    while i < n_nz:
        K = int(sorted_counts[i])
        space = m - used
        if space < K:
            nets_chunks.append(cur)
            cur, used = [], 0
            continue
        lim = int(np.searchsorted(-sorted_counts, -max(1, (3 * K) // 4), side="right"))
        rows_c = min(space // K, n_nz - i, max(lim - i, 1))
        cur.append((used, rows_c, K))
        used += rows_c * K
        i += rows_c
    if cur:
        nets_chunks.append(cur)
    nnets = len(nets_chunks)

    if dtype == "df64":
        dvals = df.split_f64_np(data)
    else:
        dvals = data.astype({"f32": np.float32, "f64": np.float64}[dtype])

    # slot assignment (vectorized): entry e of row r -> net/slot.
    # Row-major chunks put entry k of local row r at s0 + r*K + k
    # (stride 1 along a row); column-major at s0 + k*rows_c + r
    # (stride rows_c along a row) — see RoutedMatHier.colmajor.
    net_of = np.zeros(n, dtype=np.int64)
    slot0_of = np.zeros(n, dtype=np.int64)
    stride_of = np.ones(n, dtype=np.int64)
    pos = 0
    for b, chlist in enumerate(nets_chunks):
        for (s0, rows_c, K) in chlist:
            rows_b = order[pos : pos + rows_c]
            net_of[rows_b] = b
            if colmajor:
                slot0_of[rows_b] = s0 + np.arange(rows_c)
                stride_of[rows_b] = rows_c
            else:
                slot0_of[rows_b] = s0 + np.arange(rows_c) * K
            pos += rows_c
    rows_rep = np.repeat(np.arange(n), counts)
    slot_in_row = np.arange(len(indices)) - np.repeat(indptr[:-1], counts)
    b_e = net_of[rows_rep]
    t_e = slot0_of[rows_rep] + slot_in_row * stride_of[rows_rep]

    # padding slots gather (slot % ncol): bounded broadcast runs, value 0
    base = np.tile(np.arange(m, dtype=np.int64) % ncol, (nnets, 1))
    base[b_e, t_e] = indices
    idx_all = base
    vals = np.zeros((nnets, m) + dvals.shape[1:], dtype=dvals.dtype)
    vals[b_e, t_e] = dvals

    nets = []
    for g0 in range(0, nnets, host_batch):
        g1 = min(g0 + host_batch, nnets)
        net_h = rn.build_gather_network(idx_all[g0:g1], ncol, m, drop_empty=False)
        gmax = _hier_gmax_cfg(bl, dtype)
        for b in range(g1 - g0):
            passes = rd.compile_hier(
                net_h.kinds, net_h.dists, net_h.masks[:, b, :], bl, gmax=gmax
            )
            nets.append(_split_hier(passes))
        if verbose:
            print(f"  hier nets {g0}..{g1 - 1}/{nnets} built", flush=True)

    # un-permute network: y_nat[r] = y_sorted[rank[r]]; zero-count rows
    # read the zero pad slot n_nz. When the matrix is already stored in
    # length-sorted row order (callers can relabel their whole problem
    # once — factored NPB does), the un-permute is the identity and the
    # per-matvec pass is skipped entirely.
    rank = np.full(n, n_nz, dtype=np.int64)
    rank[order[:n_nz]] = np.arange(n_nz)
    m_out = max(2 * bl, _pow2_at_least(max(n, n_nz + 1)))
    if np.array_equal(order[:n_nz], np.arange(n_nz)):
        unperm = None
    else:
        unet = rn.build_gather_network(
            rank[None], n_nz + 1, m_out, drop_empty=False
        )
        unperm = _split_hier(
            rd.compile_hier(
                unet.kinds, unet.dists, unet.masks[:, 0, :], bl,
                gmax=_hier_gmax_cfg(bl, dtype),
            )
        )
    if verbose:
        tot_slots = nnets * m
        print(
            f"hier: n={n} m={m} nets={nnets} slots/nnz="
            f"{tot_slots / max(len(indices), 1):.2f}", flush=True,
        )
    return RoutedMatHier(
        nets=tuple(nets),
        vals=tuple(jnp.asarray(v) for v in vals),
        unperm=unperm,
        chunks=tuple(tuple(ch) for ch in nets_chunks),
        shape=tuple(shape),
        m=m,
        m_out=m_out,
        bl=bl,
        n_nz=n_nz,
        colmajor=colmajor,
    )


_plane = _pad_plane  # hierarchical section uses the same padding helper


def _chunk_reduce_net(prod_1d, chlist, colmajor=False):
    """Per-net ELL sub-block row sums: prod [m] -> concatenated row sums."""
    segs = [
        jnp.sum(
            prod_1d[s0 : s0 + rows_c * K].reshape(
                (K, rows_c) if colmajor else (rows_c, K)
            ),
            axis=0 if colmajor else 1,
        )
        for (s0, rows_c, K) in chlist
    ]
    return segs[0] if len(segs) == 1 else jnp.concatenate(segs)


def _chunk_reduce_net_df(prod: df.DF, chlist, colmajor=False):
    """df64 per-net ELL row sums -> (hi, lo) 1D concatenated arrays.

    Column-major chunks reduce over the MAJOR axis of (K, rows_c) views
    (df.sum_df0) so no barriered EFT intermediate ever takes a K-minor
    layout — the 8-32x tile-padding blow-up that dominated the row-major
    hier df64 matvec (measured ~350 ms of 467 ms at SparseBench-160)."""
    his, los = [], []
    for (s0, rows_c, K) in chlist:
        ph = prod.hi[s0 : s0 + rows_c * K]
        pl_ = prod.lo[s0 : s0 + rows_c * K]
        if colmajor:
            t = df.sum_df0(
                df.DF(ph.reshape(K, rows_c), pl_.reshape(K, rows_c))
            )
        else:
            t = df.sum_df(
                df.DF(ph.reshape(rows_c, K), pl_.reshape(rows_c, K)), axis=1
            )
        his.append(t.hi)
        los.append(t.lo)
    hi = his[0] if len(his) == 1 else jnp.concatenate(his)
    lo = los[0] if len(los) == 1 else jnp.concatenate(los)
    return hi, lo


def routed_hier_spmv(A, x, *, interpret: bool = False):
    if isinstance(A, RoutedMatHierP):
        return _routed_hier_spmv_packed(A, x, interpret=interpret)
    xp = _plane(x.astype(A.vals[0].dtype), A.m)
    parts = []
    for net, vals, chlist in zip(A.nets, A.vals, A.chunks):
        (o,) = hier_net_apply(net, (xp,), A.bl, interpret=interpret)
        prod = vals * o.reshape(A.m)
        parts.append(_chunk_reduce_net(prod, chlist, A.colmajor))
    y_sorted = jnp.concatenate(parts)
    n = A.shape[0]
    if A.unperm is None:
        return jnp.pad(y_sorted, (0, n - y_sorted.shape[0]))
    (u,) = hier_net_apply(
        A.unperm, (_plane(y_sorted, A.m_out),), A.bl, interpret=interpret
    )
    return u.reshape(A.m_out)[:n]


def _routed_hier_spmv_packed(A: RoutedMatHierP, x, *, interpret: bool = False):
    xp = _plane(x.astype(A.groups[0].vals.dtype), A.m)
    nnets = len(A.chunks)
    parts = [None] * nnets
    for grp in A.groups:
        (o,) = rd.hier_apply_batched(
            (xp,), grp.pass_meta, grp.pass_masks, A.bl, interpret=interpret
        )
        prod = grp.vals * o  # both [Ng, m//128, 128]
        for li, ni in enumerate(grp.net_ids):
            parts[ni] = _chunk_reduce_net(
                prod[li].reshape(A.m), A.chunks[ni], A.colmajor
            )
    y_sorted = jnp.concatenate(parts)
    n = A.shape[0]
    if A.unperm is None:
        return jnp.pad(y_sorted, (0, n - y_sorted.shape[0]))
    (u,) = hier_net_apply(
        A.unperm, (_plane(y_sorted, A.m_out),), A.bl, interpret=interpret
    )
    return u.reshape(A.m_out)[:n]


def _routed_hier_spmv_packed_df(
    A: RoutedMatHierP, x: df.DF, *, interpret: bool = False
):
    ph = _plane(x.hi, A.m)
    pl_ = _plane(x.lo, A.m)
    nnets = len(A.chunks)
    parts_h = [None] * nnets
    parts_l = [None] * nnets
    for grp in A.groups:
        oh, ol = rd.hier_apply_batched(
            (ph, pl_), grp.pass_meta, grp.pass_masks, A.bl, interpret=interpret
        )
        from lilac_tpu.kernels.dfmulred import chunk_mulreduce_df

        for li, ni in enumerate(grp.net_ids):
            parts_h[ni], parts_l[ni] = chunk_mulreduce_df(
                (grp.vals[0, li].reshape(A.m), grp.vals[1, li].reshape(A.m)),
                oh[li].reshape(A.m), ol[li].reshape(A.m),
                A.chunks[ni], A.colmajor,
                interpret=interpret,
            )
    yh = jnp.concatenate(parts_h)
    yl = jnp.concatenate(parts_l)
    n = A.shape[0]
    if A.unperm is None:
        pad = n - yh.shape[0]
        return df.DF(jnp.pad(yh, (0, pad)), jnp.pad(yl, (0, pad)))
    uh, ul = hier_net_apply(
        A.unperm,
        (_plane(yh, A.m_out), _plane(yl, A.m_out)),
        A.bl,
        interpret=interpret,
    )
    return df.DF(uh.reshape(A.m_out)[:n], ul.reshape(A.m_out)[:n])


def routed_hier_spmv_df(A, x: df.DF, *, interpret: bool = False):
    if isinstance(A, RoutedMatHierP):
        return _routed_hier_spmv_packed_df(A, x, interpret=interpret)
    ph = _plane(x.hi, A.m)
    pl_ = _plane(x.lo, A.m)
    his, los = [], []
    from lilac_tpu.kernels.dfmulred import chunk_mulreduce_df

    for net, vals, chlist in zip(A.nets, A.vals, A.chunks):
        oh, ol = hier_net_apply(net, (ph, pl_), A.bl, interpret=interpret)
        h, l_ = chunk_mulreduce_df(
            vals, oh.reshape(A.m), ol.reshape(A.m), chlist, A.colmajor,
            interpret=interpret,
        )
        his.append(h)
        los.append(l_)
    yh = jnp.concatenate(his)
    yl = jnp.concatenate(los)
    n = A.shape[0]
    if A.unperm is None:
        pad = n - yh.shape[0]
        return df.DF(jnp.pad(yh, (0, pad)), jnp.pad(yl, (0, pad)))
    uh, ul = hier_net_apply(
        A.unperm,
        (_plane(yh, A.m_out), _plane(yl, A.m_out)),
        A.bl,
        interpret=interpret,
    )
    return df.DF(uh.reshape(A.m_out)[:n], ul.reshape(A.m_out)[:n])


# ---------------------------------------------------------------------------
# hierarchical adjoint matvecs (Aᵀu through the FORWARD plan — the
# Beneš-reverse transpose; see rd.hier_apply_batched_t). One hier plan
# serves both product directions: at NPB class E this halves plan HBM
# from 17.1 GB (V + VT plans) to 8.5 GB — the difference between fitting
# and not fitting a 16 GB chip fully routed.
# ---------------------------------------------------------------------------


def _hier_net_rows(chunks) -> list:
    """Per-net output row counts (the chunk-concatenated sorted space)."""
    return [sum(rc for _, rc, _ in chlist) for chlist in chunks]


def _expand_net_slots(useg, chlist, m, colmajor):
    """Adjoint of _chunk_reduce_net: tile the net's row cotangents over
    their ELL slots. useg: [rows of this net]; returns [m] (gaps zero —
    pad slots carry zero vals, so they contribute nothing after the
    vals multiply)."""
    parts = []
    off = 0
    pos = 0
    for (s0, rows_c, K) in chlist:
        assert s0 == pos, "hier chunks must be contiguous"
        uc = useg[off : off + rows_c]
        parts.append(jnp.tile(uc, K) if colmajor else jnp.repeat(uc, K))
        off += rows_c
        pos += rows_c * K
    seg = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return jnp.pad(seg, (0, m - pos))


def _hier_adj_unperm(A, u, nplanes_df, *, interpret=False):
    """Adjoint of the un-permute net (or the trailing zero-pad when the
    rows are already length-sorted): [n] cotangent -> [n_nz] sorted."""
    n = A.shape[0]
    if A.unperm is None:
        if nplanes_df:
            return df.DF(u.hi[: A.n_nz], u.lo[: A.n_nz])
        return u[: A.n_nz]
    planes = (
        (_plane(u.hi, A.m_out), _plane(u.lo, A.m_out))
        if nplanes_df
        else (_plane(u, A.m_out),)
    )
    outs = rd.hier_apply_batched_t(
        tuple(p[None] for p in planes),
        A.unperm.pass_meta,
        tuple(mk[None] for mk in A.unperm.pass_masks),
        A.bl,
        dfpair=nplanes_df,
        interpret=interpret,
    )
    if nplanes_df:
        return df.DF(
            outs[0].reshape(A.m_out)[: A.n_nz],
            outs[1].reshape(A.m_out)[: A.n_nz],
        )
    return outs[0].reshape(A.m_out)[: A.n_nz]


def routed_hier_spmv_adj_t(A, u, *, interpret: bool = False):
    """y = Aᵀ @ u for a hier plan (f32/f64), packed or per-net."""
    us = _hier_adj_unperm(A, u, False, interpret=interpret)
    rows_per_net = _hier_net_rows(A.chunks)
    offs = np.concatenate([[0], np.cumsum(rows_per_net)])
    y = None
    if isinstance(A, RoutedMatHierP):
        for grp in A.groups:
            # plane-shaped [Ng, m//128, 128] throughout: a [Ng, m] stack
            # would put Ng on XLA's sublane axis and tile-pad it to 8
            slots = jnp.stack(
                [
                    _expand_net_slots(
                        us[offs[ni] : offs[ni + 1]], A.chunks[ni], A.m,
                        A.colmajor,
                    ).reshape(A.m // 128, 128)
                    for ni in grp.net_ids
                ]
            )
            prod = (grp.vals * slots).astype(u.dtype)
            (o,) = rd.hier_apply_batched_t(
                (prod,),
                grp.pass_meta, grp.pass_masks, A.bl, interpret=interpret,
            )
            t = o.sum(axis=0).reshape(A.m)
            y = t if y is None else y + t
    else:
        for ni, (net, vals) in enumerate(zip(A.nets, A.vals)):
            slots = _expand_net_slots(
                us[offs[ni] : offs[ni + 1]], A.chunks[ni], A.m, A.colmajor
            )
            prod = (vals * slots).astype(u.dtype)
            (o,) = rd.hier_apply_batched_t(
                (prod.reshape(1, A.m // 128, 128),),
                net.pass_meta,
                tuple(mk[None] for mk in net.pass_masks),
                A.bl,
                interpret=interpret,
            )
            t = o.reshape(A.m)
            y = t if y is None else y + t
    return y[: A.shape[1]]


def routed_hier_spmv_adj_t_df(A, u: df.DF, *, interpret: bool = False) -> df.DF:
    """y = Aᵀ @ u for a df64 hier plan: expand row cotangents to slots,
    TwoProd-multiply by the slot-ordered values, run every net's network
    in reverse with compensated add-merges, df-sum across nets."""
    us = _hier_adj_unperm(A, u, True, interpret=interpret)
    rows_per_net = _hier_net_rows(A.chunks)
    offs = np.concatenate([[0], np.cumsum(rows_per_net)])
    y = None

    def net_slots(ni):
        return df.DF(
            _expand_net_slots(
                us.hi[offs[ni] : offs[ni + 1]], A.chunks[ni], A.m, A.colmajor
            ),
            _expand_net_slots(
                us.lo[offs[ni] : offs[ni + 1]], A.chunks[ni], A.m, A.colmajor
            ),
        )

    if isinstance(A, RoutedMatHierP):
        R = A.m // 128
        for grp in A.groups:
            # plane-shaped [Ng, m//128, 128] per df word throughout (see
            # HierGroup.vals: a [Ng, m] layout tile-pads Ng to 8), and
            # the TwoProd runs PER NET before the stack: the barriered
            # df.mul chain's ~10 live intermediates are then one net's
            # [R, 128] planes, not the whole group's (at class E that is
            # the difference between ~0.7 GB and ~3 GB of transients)
            prods = [
                df.mul(
                    df.DF(grp.vals[0, li], grp.vals[1, li]),
                    jax.tree_util.tree_map(
                        lambda x: x.reshape(R, 128), net_slots(ni)
                    ),
                )
                for li, ni in enumerate(grp.net_ids)
            ]
            prod = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *prods)
            oh, ol = rd.hier_apply_batched_t(
                (prod.hi, prod.lo),
                grp.pass_meta, grp.pass_masks, A.bl, dfpair=True,
                interpret=interpret,
            )
            t = df.sum_df0(df.DF(oh, ol))
            t = df.DF(t.hi.reshape(A.m), t.lo.reshape(A.m))
            y = t if y is None else df.add(y, t)
    else:
        for ni, (net, vals_i) in enumerate(zip(A.nets, A.vals)):
            slots = net_slots(ni)
            vals = df.DF(vals_i[..., 0], vals_i[..., 1])
            prod = df.mul(vals, slots)
            oh, ol = rd.hier_apply_batched_t(
                (
                    prod.hi.reshape(1, A.m // 128, 128),
                    prod.lo.reshape(1, A.m // 128, 128),
                ),
                net.pass_meta,
                tuple(mk[None] for mk in net.pass_masks),
                A.bl,
                dfpair=True,
                interpret=interpret,
            )
            t = df.DF(oh.reshape(A.m), ol.reshape(A.m))
            y = t if y is None else df.add(y, t)
    return df.DF(y.hi[: A.shape[1]], y.lo[: A.shape[1]])


# -- registry entries (the SpmvPlan surface dispatches through these) -------
from lilac_tpu.kernels.registry import register_kernel  # noqa: E402

register_kernel("routed", routed_spmv, RoutedMat, transpose=routed_spmv_adj_t)
register_kernel(
    "routed_df", routed_spmv_df, RoutedMat, dfloat=True,
    transpose=routed_spmv_adj_t_df,
)
register_kernel(
    "routed_hier", routed_hier_spmv, RoutedMatHier,
    transpose=routed_hier_spmv_adj_t,
)
register_kernel(
    "routed_hier_df", routed_hier_spmv_df, RoutedMatHier, dfloat=True,
    transpose=routed_hier_spmv_adj_t_df,
)
