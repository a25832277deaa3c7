"""Factored SpMV for sum-of-sparse-outer-products matrices (NPB CG).

The NPB CG matrix is assembled as A = Σ_i s_i a_i a_iᵀ + (rcond−shift)·I
with each a_i holding only nonzer+1 ≈ 8–27 nonzeros
(/root/reference/NPB3.3.1/CG/cg.f:650-905). The assembled matrix has
~(nonzer+1)² nnz per row, but the FACTORED product

    A·x = Σ_i s_i a_i (a_iᵀ x) + d0·x
        = Vᵀ·(s ⊙ (V x)) + d0·x        (V = stacked a_iᵀ, ELL [n, K0])

needs two narrow ELL passes (K0 = nonzer+1 and the transpose's K1) —
about (nonzer+1)²/(2(nonzer+1)) ≈ 8x fewer gathers than the assembled
form for class C. Gathers are the TPU SpMV bottleneck (XLA lane-gather is
~10ns/element), so this is the difference between classes B/C being
unrunnable and beating the reference.

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

from lilac_tpu.ops import dfloat as df


@dataclasses.dataclass
class FactoredNPB:
    """Device containers for the factored operator (pytree).

    The transpose pass is BUCKET-SLICED: row degrees of Vᵀ follow a
    Poisson-like spread (class C: mean 16, max 35), so a plain ELL pads
    2.2x. Rows are permuted by degree into buckets, each stored at its own
    width (the JDS idea, convert_dataset.c:160+, re-shaped for the TPU:
    buckets keep the gather dense instead of warps)."""

    P: jax.Array  # [n, K0] int32 0-based positions of a_i (pad 0)
    Vv: jax.Array  # [n, K0] values of a_i (pad 0); f32/f64 or [.,2] df
    PT: tuple  # per-bucket int32 [n_b, K_b] outer-product indices
    VTv: tuple  # per-bucket values [n_b, K_b] (or [.,2] df)
    inv_perm: jax.Array  # [n] int32: bucket-concatenated row -> original row
    s: jax.Array  # [n] outer-product weights (f32/f64 or [n,2] df)
    d0: jax.Array  # scalar diagonal shift (rcond - shift)

    def tree_flatten(self):
        return (self.P, self.Vv, self.PT, self.VTv, self.inv_perm, self.s, self.d0), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


jax.tree_util.register_pytree_node(
    FactoredNPB, FactoredNPB.tree_flatten, FactoredNPB.tree_unflatten
)


def build_factored(class_name: str, dtype: str = "f64") -> Tuple[FactoredNPB, int]:
    """Host build from the exact makea factors. Returns (containers, nnz_eff)
    where nnz_eff counts gathered elements per matvec (both passes)."""
    from lilac_tpu.generate.npb import CLASSES, _generate_triples

    cls = CLASSES[class_name.upper()]
    n = cls.na
    nzv_arr, ivc, vc = _generate_triples(cls)
    K0 = int(nzv_arr.max())
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nzv_arr, out=offs[1:])

    P = np.zeros((n, K0), dtype=np.int64)
    Vv = np.zeros((n, K0), dtype=np.float64)
    rows_v = np.repeat(np.arange(n, dtype=np.int64), nzv_arr)
    slots_v = np.arange(len(ivc)) - offs[rows_v]
    P[rows_v, slots_v] = ivc - 1
    Vv[rows_v, slots_v] = vc

    # transpose structure: for each position j, the (i, value) pairs
    rows_i = np.repeat(np.arange(n, dtype=np.int64), nzv_arr)
    pos_j = ivc - 1
    order = np.argsort(pos_j, kind="stable")
    pj, ri, vv = pos_j[order], rows_i[order], vc[order]
    counts = np.bincount(pj, minlength=n)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(len(pj)) - starts[pj]

    # degree-bucketed slicing: permute rows ascending by count, split at
    # the smallest widths covering each quantile
    perm = np.argsort(counts, kind="stable")  # bucket-row -> original row
    inv_perm = np.empty(n, dtype=np.int64)
    inv_perm[perm] = np.arange(n)
    kmax = int(counts.max())
    widths = sorted({w for w in (kmax // 2, int(np.percentile(counts, 90)), kmax) if w > 0})
    buckets, lo = [], 0
    sorted_counts = counts[perm]
    for w in widths:
        hi = int(np.searchsorted(sorted_counts, w, side="right"))
        if hi > lo:
            buckets.append((lo, hi, w))
            lo = hi
    if lo < n:
        buckets.append((lo, n, kmax))

    PT_parts, VT_parts = [], []
    full_PT = np.zeros((n, kmax), dtype=np.int64)
    full_VT = np.zeros((n, kmax), dtype=np.float64)
    full_PT[pj, slot] = ri
    full_VT[pj, slot] = vv
    for lo_, hi_, w in buckets:
        rows_b = perm[lo_:hi_]
        PT_parts.append(full_PT[rows_b, :w])
        VT_parts.append(full_VT[rows_b, :w])

    ratio = cls.rcond ** (1.0 / n)
    s = np.empty(n, dtype=np.float64)
    s[0] = 1.0
    np.multiply.accumulate(np.full(n - 1, ratio), out=s[1:])
    d0 = cls.rcond - cls.shift

    def to_dev(v):
        if dtype == "df64":
            hi = v.astype(np.float32)
            lo = (v - hi.astype(np.float64)).astype(np.float32)
            return jnp.asarray(np.stack([hi, lo], axis=-1))
        jt = {"f32": np.float32, "f64": np.float64}[dtype]
        return jnp.asarray(v.astype(jt))

    cont = FactoredNPB(
        P=jnp.asarray(P, dtype=jnp.int32),
        Vv=to_dev(Vv),
        PT=tuple(jnp.asarray(p, dtype=jnp.int32) for p in PT_parts),
        VTv=tuple(to_dev(v) for v in VT_parts),
        inv_perm=jnp.asarray(inv_perm, dtype=jnp.int32),
        s=to_dev(s),
        d0=to_dev(np.asarray(d0)),
    )
    nnz_eff = int(nzv_arr.sum()) * 2
    return cont, nnz_eff


# ---------------------------------------------------------------------------
# matvec implementations
# ---------------------------------------------------------------------------


def factored_spmv(A: FactoredNPB, x: jax.Array) -> jax.Array:
    """Plain-float factored product (f32/f64)."""
    from lilac_tpu.kernels.xla import pair_gather

    t = jnp.sum(A.Vv * pair_gather(x, A.P), axis=1)  # V x
    u = A.s * t
    parts = [jnp.sum(vt * pair_gather(u, pt), axis=1) for pt, vt in zip(A.PT, A.VTv)]
    y = pair_gather(jnp.concatenate(parts), A.inv_perm)  # Vᵀ u, un-permuted
    return y + A.d0 * x


def factored_spmv_df(A: FactoredNPB, x: df.DF) -> df.DF:
    """df64 factored product: TwoProd per element, compensated reductions.

    Gathers fetch (hi, lo) PAIRS as 8-byte rows of an [n, 2] stack — XLA's
    TPU slice-gather emitter moves rows ~5x faster per index than the
    scalar lane-gather, and one row carries both words (measured ~10x over
    two flat gathers)."""
    Vv = df.DF(A.Vv[..., 0], A.Vv[..., 1])
    xs = jnp.stack([x.hi, x.lo], axis=-1)
    g = xs[A.P]
    xg = df.DF(g[..., 0], g[..., 1])
    t = df.sum_df(df.mul(Vv, xg), axis=1)
    s = df.DF(A.s[..., 0], A.s[..., 1])
    u = df.mul(s, t)
    us = jnp.stack([u.hi, u.lo], axis=-1)
    his, los = [], []
    for pt, vt in zip(A.PT, A.VTv):
        VTb = df.DF(vt[..., 0], vt[..., 1])
        g2 = us[pt]
        yb = df.sum_df(df.mul(VTb, df.DF(g2[..., 0], g2[..., 1])), axis=1)
        his.append(yb.hi)
        los.append(yb.lo)
    ys = jnp.stack([jnp.concatenate(his), jnp.concatenate(los)], axis=-1)
    g3 = ys[A.inv_perm]
    y = df.DF(g3[..., 0], g3[..., 1])
    d0 = df.DF(A.d0[..., 0], A.d0[..., 1])
    dx = df.mul(df.DF(jnp.broadcast_to(d0.hi, x.hi.shape),
                      jnp.broadcast_to(d0.lo, x.lo.shape)), x)
    return df.add(y, dx)
