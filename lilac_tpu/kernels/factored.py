"""Factored SpMV for sum-of-sparse-outer-products matrices (NPB CG).

The NPB CG matrix is assembled as A = Σ_i s_i a_i a_iᵀ + (rcond−shift)·I
with each a_i holding only nonzer+1 ≈ 8–27 nonzeros
(/root/reference/NPB3.3.1/CG/cg.f:650-905). The assembled matrix has
~(nonzer+1)² nnz per row, but the FACTORED product

    A·x = Vᵀ·(s ⊙ (V x)) + d0·x        (V = stacked a_iᵀ)

needs two narrow sparse passes — about (nonzer+1)/2 times fewer gathers
than the assembled form. Gathers are the TPU SpMV bottleneck, so this is
the difference between classes B-D being unrunnable and beating the
reference.

Both passes run through the general SegBucketELL kernel: paired (hi,lo)
row-gathers, degree-bucketed slicing for the Vᵀ side's Poisson-spread row
lengths, and column segmentation so gather tables stay under the v5e
slice-gather engine's ~1.2MB fast-path cliff (matters from class D up).

Exactly the same matrix: summation order differs from the assembled CSR
by O(eps) — far inside the ζ tolerance of 1e-10 (verified per class in
tests). Supports f32/f64/df64 value policies like the direct kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lilac_tpu.formats.sparse import SegBucketELL, SegELLScan
from lilac_tpu.ops import dfloat as df


@dataclasses.dataclass
class FactoredNPB:
    """Device containers for the factored operator (pytree)."""

    V: SegBucketELL  # [n x n] sparse with rows a_i
    VT: SegBucketELL  # transpose
    s: jax.Array  # [n] outer-product weights (f32/f64 or [n,2] df)
    d0: jax.Array  # scalar diagonal shift (rcond - shift)

    def tree_flatten(self):
        return (self.V, self.VT, self.s, self.d0), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


jax.tree_util.register_pytree_node(
    FactoredNPB, FactoredNPB.tree_flatten, FactoredNPB.tree_unflatten
)

SEG_SIZE = 163840  # pair table = 1.25MB — inside the fast-gather cliff (measured: fast at 1.2MB, 4x slower at 3.2MB)


def build_factored(class_name: str, dtype: str = "f64") -> Tuple[FactoredNPB, int]:
    """Host build from the exact makea factors. Returns (containers, nnz_eff)
    where nnz_eff counts gathered elements per matvec (both passes)."""
    from lilac_tpu.formats.convert import coo_to_csr_arrays, csr_to_seg_bucket_ell
    from lilac_tpu.generate.npb import CLASSES, _generate_triples

    cls = CLASSES[class_name.upper()]
    n = cls.na

    def to_vals(v):
        if dtype == "df64":
            hi = v.astype(np.float32)
            lo = (v - hi.astype(np.float64)).astype(np.float32)
            return np.stack([hi, lo], axis=-1)
        return v.astype({"f32": np.float32, "f64": np.float64}[dtype])

    def to_dev(v):
        return jnp.asarray(to_vals(np.asarray(v)))

    # Segmentation mode: matrices taller than one segment use the
    # scan-accumulated uniform-width layout (SegELLScan) — segment-local
    # fast-path gathers with temporaries bounded to one slab (the unrolled
    # multi-part layout OOMed class D at 21GB); smaller classes fit a
    # single fast-path table and keep the bucketed single-segment layout.
    import os as _os

    from lilac_tpu.config import cfg
    from lilac_tpu.formats.convert import csr_to_seg_ell_scan

    conf = cfg()
    mode = conf.factored_segmode
    if mode == "auto":
        # routed networks need the whole x table in one VMEM-resident net
        # (n <= 2^18); beyond that fall back to the single-segment layout.
        # CPU runs (tests) keep the gather path: interpret-mode Pallas is
        # orders of magnitude slower than XLA's CPU gather.
        import jax as _jax

        mode = "routed" if _jax.default_backend() != "cpu" else "single"
    # Vᵀ strategy: 'adj' runs V's network in REVERSE with add-merges
    # (rd.hier_apply_batched_t) — the transpose costs zero extra plan
    # bytes, so hier classes (D, E) halve their plan HBM/upload. auto =
    # adj exactly there; single-table classes keep the dedicated VT plan
    # (small plans, and the dedicated forward schedule has no add-merge
    # stage cost).
    vt_mode = conf.factored_vt
    if vt_mode == "auto":
        vt_mode = (
            "adj" if mode in ("routed", "mixed") and n > (1 << 18) else "plan"
        )
    if mode == "mixed" and vt_mode == "adj":
        mode = "routed"  # adj removes the reason mixed existed
    if mode == "routed" and vt_mode != "adj" and n > (1 << 21):
        # class E exceeds device memory with TWO hier plans: V+VT measure
        # 17.1 GB against the v5e's 16 GB HBM (masks are ~76% of plan
        # bytes). The mixed mode keeps V routed (8.5 GB) and runs VT as a
        # single-segment gather — the j-space sigma relabel means VT's
        # output needs no un-permute either way.
        mode = "mixed"
    use_scan = mode == "scan"
    squant = conf.seg_quantile

    paths = meta_path = None
    if mode in ("routed", "mixed"):
        from lilac_tpu.kernels.routed_spmv import load_routed

        cache_dir = conf.resolved_data_dir()
        _os.makedirs(cache_dir, exist_ok=True)
        # cache schema v2: i-space relabel changed slot layouts AND the
        # matching s permutation — v1 "routed_*" caches are incompatible.
        # Single-table classes carry the net-mode tag (monotone schedules
        # differ from Benes); hier classes always build Benes but honor
        # the bl/gmax knobs, so non-default values get their own names
        # (the default-config names match the shipped D/E caches).
        if n <= (1 << 18):
            tag = "_m" if conf.net_mode == "monotone" else ""
        else:
            g = conf.hier_gmax if conf.hier_gmax is not None else "a"
            tag = (
                ""
                if (conf.hier_bl, g) == (1 << 16, "a")
                else f"_bl{conf.hier_bl}g{g}"
            )
        paths = [
            _os.path.join(cache_dir, f"routed2_{cls.name}_{dtype}_{t}{tag}.npz")
            for t in ("V", "VT")
        ]
        meta_path = _os.path.join(
            cache_dir, f"routed2_{cls.name}_{dtype}_meta{tag}.npz"
        )
        need_paths = [paths[0]] if vt_mode == "adj" else paths
        if mode == "routed" and all(
            _os.path.exists(p) for p in need_paths + [meta_path]
        ):
            # full cache hit: the sidecar carries the already-permuted s
            # and nnz_eff, so the (minutes at class D/E) makea triple
            # regeneration is skipped entirely
            try:
                from lilac_tpu.kernels.routed_spmv import maybe_pack_hier

                V = load_routed(paths[0])
                VT = None if vt_mode == "adj" else load_routed(paths[1])
                # row-major caches predate the column-major chunk layout
                # (7.3x on the hier df64 glue): treat as stale, rebuild
                if V is not None and not getattr(V, "colmajor", False):
                    V = VT = None
                z = np.load(meta_path, allow_pickle=False)
                if V is not None and (VT is not None or vt_mode == "adj"):
                    cont = FactoredNPB(
                        V=maybe_pack_hier(V),
                        VT=None if vt_mode == "adj" else maybe_pack_hier(VT),
                        s=to_dev(z["s"]),
                        d0=to_dev(np.asarray(cls.rcond - cls.shift)),
                    )
                    return cont, int(z["nnz_eff"])
            except Exception:
                pass

    nzv_arr, ivc, vc = _generate_triples(cls)
    rows_i = np.repeat(np.arange(n, dtype=np.int64), nzv_arr)
    pos_j = ivc - 1

    sigma_i = None
    if mode in ("routed", "mixed"):
        # Run the whole solve in sigma-space: relabel the j (row/column)
        # space by descending V-column multiplicity so VT's rows are
        # already length-sorted and its per-matvec un-permute network
        # vanishes. A' = P A P^T for a permutation P leaves every CG
        # scalar (dots, norms, zeta, rnorm) invariant, and the NPB driver
        # feeds only permutation-invariant vectors (x0 = ones).
        cnt_j = np.bincount(pos_j, minlength=n)
        sigma = np.argsort(-cnt_j, kind="stable")
        rank_s = np.empty(n, dtype=np.int64)
        rank_s[sigma] = np.arange(n)
        pos_j = rank_s[pos_j]
        # i-space relabel (round 2): order V's rows by descending length
        # so V's un-permute network vanishes too. The i-space is internal
        # to the factored product — V' = P_i V P_j^T, VT' = V'^T,
        # S' = P_i S P_i^T give A' = P_j A P_j^T, the same j-space
        # similarity as above, so CG scalars stay invariant; only s must
        # be permuted to match.
        sigma_i = np.argsort(-nzv_arr, kind="stable")
        rank_i = np.empty(n, dtype=np.int64)
        rank_i[sigma_i] = np.arange(n)
        rows_i = rank_i[rows_i]
    v_ip, v_ix, v_v = coo_to_csr_arrays(rows_i, pos_j, vc, (n, n), sum_duplicates=False)
    t_ip, t_ix, t_v = coo_to_csr_arrays(pos_j, rows_i, vc, (n, n), sum_duplicates=False)
    if mode == "mixed":
        # V routed (disk-cached hier plan), VT single-segment gather:
        # together they fit HBM where two hier plans do not (class E).
        from lilac_tpu.kernels.routed_spmv import (
            build_routed_csr_hier,
            load_routed,
            maybe_pack_hier,
            save_routed,
        )

        V = None
        if _os.path.exists(paths[0]):
            try:
                V = load_routed(paths[0])
                if V is not None and not getattr(V, "colmajor", False):
                    V = None
            except Exception:
                V = None
        if V is None:
            V = build_routed_csr_hier(
                v_ip, v_ix, v_v, (n, n), dtype=dtype, bl=conf.hier_bl,
                verbose=True,
            )
            save_routed(paths[0], V)
        V = maybe_pack_hier(V)
        # VT rows are the sigma-sorted j space: already length-sorted.
        # df64 uses the jagged-diagonal transposed layout (column sweeps
        # keep every barriered EFT intermediate 1D — the row-major
        # [rows, K, 2] form blew compile-time HBM at class-E size);
        # plain floats keep the bucketed gather layout.
        if dtype == "df64":
            from lilac_tpu.formats.convert import csr_sorted_to_jag_ellt

            VT = csr_sorted_to_jag_ellt(t_ip, t_ix, to_vals(t_v), (n, n))
        else:
            VT = csr_to_seg_bucket_ell(
                t_ip, t_ix, to_vals(t_v), (n, n), seg_size=max(SEG_SIZE, n)
            )
    elif mode == "routed":
        from lilac_tpu.kernels.routed_spmv import (
            build_routed_csr,
            load_routed,
            save_routed,
        )

        adj = vt_mode == "adj"
        V = VT = None
        need = [paths[0]] if adj else paths
        if all(_os.path.exists(p) for p in need):
            try:
                V = load_routed(paths[0])
                VT = None if adj else load_routed(paths[1])
                if V is not None and not getattr(V, "colmajor", False):
                    V = VT = None  # stale row-major cache: rebuild
            except Exception:
                V = VT = None
        if V is None or (VT is None and not adj):
            if n <= (1 << 18):
                V = build_routed_csr(v_ip, v_ix, v_v, (n, n), dtype=dtype)
                if not adj:
                    VT = build_routed_csr(t_ip, t_ix, t_v, (n, n), dtype=dtype)
            else:
                # beyond one VMEM table: hierarchical networks (outer
                # stages as butterfly/window passes, no column segments)
                from lilac_tpu.kernels.routed_spmv import build_routed_csr_hier

                hbl = conf.hier_bl
                V = build_routed_csr_hier(
                    v_ip, v_ix, v_v, (n, n), dtype=dtype, bl=hbl, verbose=True
                )
                if not adj:
                    VT = build_routed_csr_hier(
                        t_ip, t_ix, t_v, (n, n), dtype=dtype, bl=hbl,
                        verbose=True,
                    )
            save_routed(paths[0], V)
            if not adj:
                save_routed(paths[1], VT)
        from lilac_tpu.kernels.routed_spmv import maybe_pack_hier

        V = maybe_pack_hier(V)
        VT = None if adj else maybe_pack_hier(VT)
    elif use_scan:
        V = csr_to_seg_ell_scan(
            v_ip, v_ix, to_vals(v_v), (n, n), seg_size=SEG_SIZE, seg_quantile=squant
        )
        VT = csr_to_seg_ell_scan(
            t_ip, t_ix, to_vals(t_v), (n, n), seg_size=SEG_SIZE, seg_quantile=squant
        )
    else:
        seg = max(SEG_SIZE, n)
        V = csr_to_seg_bucket_ell(v_ip, v_ix, to_vals(v_v), (n, n), seg_size=seg)
        VT = csr_to_seg_bucket_ell(t_ip, t_ix, to_vals(t_v), (n, n), seg_size=seg)

    ratio = cls.rcond ** (1.0 / n)
    s = np.empty(n, dtype=np.float64)
    s[0] = 1.0
    np.multiply.accumulate(np.full(n - 1, ratio), out=s[1:])
    if sigma_i is not None:
        s = s[sigma_i]  # S' = P_i S P_i^T
    d0 = cls.rcond - cls.shift

    nnz_eff = int(nzv_arr.sum()) * 2
    if mode == "routed" and meta_path is not None:
        np.savez(meta_path, s=s, nnz_eff=np.int64(nnz_eff))
    cont = FactoredNPB(V=V, VT=VT, s=to_dev(s), d0=to_dev(np.asarray(d0)))
    return cont, nnz_eff


# ---------------------------------------------------------------------------
# matvec implementations
# ---------------------------------------------------------------------------


def _spmv_any(A, x):
    from lilac_tpu.kernels.routed_spmv import (
        RoutedMat,
        RoutedMatHier,
        RoutedMatHierP,
        RoutedMatSeg,
        routed_hier_spmv,
        routed_seg_spmv,
        routed_spmv,
    )
    from lilac_tpu.kernels.xla import seg_bucket_ell_spmv, seg_ell_scan_spmv

    if isinstance(A, RoutedMat):
        return routed_spmv(A, x)
    if isinstance(A, (RoutedMatHier, RoutedMatHierP)):
        return routed_hier_spmv(A, x)
    if isinstance(A, RoutedMatSeg):
        return routed_seg_spmv(A, x)
    if isinstance(A, SegELLScan):
        return seg_ell_scan_spmv(A, x)
    return seg_bucket_ell_spmv(A, x)


def _spmv_any_df(A, x):
    from lilac_tpu.kernels.routed_spmv import (
        RoutedMat,
        RoutedMatHier,
        RoutedMatHierP,
        RoutedMatSeg,
        routed_hier_spmv_df,
        routed_seg_spmv_df,
        routed_spmv_df,
    )
    from lilac_tpu.formats.sparse import JagELLT
    from lilac_tpu.kernels.xla import (
        jag_ellt_spmv_df,
        seg_bucket_ell_spmv_df,
        seg_ell_scan_spmv_df,
    )

    if isinstance(A, JagELLT):
        return jag_ellt_spmv_df(A, x)
    if isinstance(A, RoutedMat):
        return routed_spmv_df(A, x)
    if isinstance(A, (RoutedMatHier, RoutedMatHierP)):
        return routed_hier_spmv_df(A, x)
    if isinstance(A, RoutedMatSeg):
        return routed_seg_spmv_df(A, x)
    if isinstance(A, SegELLScan):
        return seg_ell_scan_spmv_df(A, x)
    return seg_bucket_ell_spmv_df(A, x)


def _spmv_adj_any(A, u):
    """Vᵀu through V's OWN plan run in reverse (the Beneš-reverse
    transpose): used when FactoredNPB.VT is None (vt_mode='adj')."""
    from lilac_tpu.kernels.routed_spmv import (
        RoutedMat,
        RoutedMatHier,
        RoutedMatHierP,
        routed_hier_spmv_adj_t,
        routed_spmv_adj_t,
    )

    if isinstance(A, RoutedMat):
        return routed_spmv_adj_t(A, u)
    assert isinstance(A, (RoutedMatHier, RoutedMatHierP)), type(A)
    return routed_hier_spmv_adj_t(A, u)


def _spmv_adj_any_df(A, u):
    from lilac_tpu.kernels.routed_spmv import (
        RoutedMat,
        RoutedMatHier,
        RoutedMatHierP,
        routed_hier_spmv_adj_t_df,
        routed_spmv_adj_t_df,
    )

    if isinstance(A, RoutedMat):
        return routed_spmv_adj_t_df(A, u)
    assert isinstance(A, (RoutedMatHier, RoutedMatHierP)), type(A)
    return routed_hier_spmv_adj_t_df(A, u)


def factored_spmv(A: FactoredNPB, x: jax.Array) -> jax.Array:
    """Plain-float factored product (f32/f64)."""
    t = _spmv_any(A.V, x)
    u = A.s * t
    y = _spmv_adj_any(A.V, u) if A.VT is None else _spmv_any(A.VT, u)
    return y + A.d0 * x


def factored_spmv_df(A: FactoredNPB, x: df.DF) -> df.DF:
    """df64 factored product: TwoProd per element, compensated reductions."""
    t = _spmv_any_df(A.V, x)
    s = df.DF(A.s[..., 0], A.s[..., 1])
    u = df.mul(s, t)
    y = _spmv_adj_any_df(A.V, u) if A.VT is None else _spmv_any_df(A.VT, u)
    d0 = df.DF(A.d0[..., 0], A.d0[..., 1])
    dx = df.mul(df.DF(jnp.broadcast_to(d0.hi, x.hi.shape),
                      jnp.broadcast_to(d0.lo, x.lo.shape)), x)
    return df.add(y, dx)
