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
    """Device containers for the factored operator (pytree)."""

    P: jax.Array  # [n, K0] int32 0-based positions of a_i (pad 0)
    Vv: jax.Array  # [n, K0] values of a_i (pad 0); f32/f64 or [.,2] df
    PT: jax.Array  # [n, K1] int32: outer-product indices i touching row j
    VTv: jax.Array  # [n, K1] a_i[j] values (pad 0)
    s: jax.Array  # [n] outer-product weights (f32/f64 or [n,2] df)
    d0: jax.Array  # scalar diagonal shift (rcond - shift)

    def tree_flatten(self):
        return (self.P, self.Vv, self.PT, self.VTv, self.s, self.d0), ()

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
    for i in range(n):
        lo, hi = offs[i], offs[i + 1]
        P[i, : hi - lo] = ivc[lo:hi] - 1
        Vv[i, : hi - lo] = vc[lo:hi]

    # transpose ELL: for each position j, the (i, value) pairs
    rows_i = np.repeat(np.arange(n, dtype=np.int64), nzv_arr)
    pos_j = ivc - 1
    order = np.argsort(pos_j, kind="stable")
    pj, ri, vv = pos_j[order], rows_i[order], vc[order]
    counts = np.bincount(pj, minlength=n)
    K1 = int(counts.max())
    PT = np.zeros((n, K1), dtype=np.int64)
    VTv = np.zeros((n, K1), dtype=np.float64)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    # slot index within each row-segment
    slot = np.arange(len(pj)) - starts[pj]
    PT[pj, slot] = ri
    VTv[pj, slot] = vv

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
        PT=jnp.asarray(PT, dtype=jnp.int32),
        VTv=to_dev(VTv),
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
    t = jnp.sum(A.Vv * x[A.P], axis=1)  # V x
    u = A.s * t
    y = jnp.sum(A.VTv * u[A.PT], axis=1)  # Vᵀ u
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
    VTv = df.DF(A.VTv[..., 0], A.VTv[..., 1])
    us = jnp.stack([u.hi, u.lo], axis=-1)
    g2 = us[A.PT]
    ug = df.DF(g2[..., 0], g2[..., 1])
    y = df.sum_df(df.mul(VTv, ug), axis=1)
    d0 = df.DF(A.d0[..., 0], A.d0[..., 1])
    dx = df.mul(df.DF(jnp.broadcast_to(d0.hi, x.hi.shape),
                      jnp.broadcast_to(d0.lo, x.lo.shape)), x)
    return df.add(y, dx)
