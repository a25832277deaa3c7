"""Double-word float32 ("df64") arithmetic for f64-grade precision on TPU.

TPU compute units are f32/bf16; XLA's f64 emulation works but is slow and
scalar-oriented. The NPB CG verification needs ~1e-10 relative accuracy
(/root/reference/NPB3.3.1/CG/cg.f:363-368), beyond f32. This module
implements error-free-transformation (Dekker/Knuth) double-word arithmetic:
a value is (hi, lo) with value = hi + lo and |lo| <= ulp(hi)/2, giving
~2^-48 relative precision — comfortably inside the 1e-10 tolerance while
running entirely on the VPU in vectorized f32.

All functions are shape-polymorphic and jit-compatible. A DF is a plain
(hi, lo) tuple of equal-shaped f32 arrays (a pytree).

References: Dekker 1971; Hida/Li/Bailey QD; the approach is the TPU-native
answer to the suite's hard f64 requirement (SURVEY.md section 7 hard parts).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DF(NamedTuple):
    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return self.hi.shape

    @property
    def dtype(self):
        return self.hi.dtype


_SPLIT = 4097.0  # 2^12 + 1 for f32 (24-bit mantissa -> 12+12 split)

# Error-free transformations are numerically load-bearing: every
# intermediate must be the exactly-rounded f32 result. Two compiler layers
# can silently break that:
#
#  1. XLA's HLO algebraic simplifier cancels patterns like `s - a` after
#     `s = a + b` (measured: jitted df64 CG stalled at residual 6e-6 while
#     op-by-op execution of the SAME code reached 2.6e-12). An
#     optimization_barrier on each EFT intermediate blocks this.
#  2. On XLA:CPU, optimization_barriers are EXPANDED AWAY before codegen,
#     and the fusion emitter clones producer multiplies into each consumer
#     fusion, where LLVM contracts `a*b +/- c` into FMAs. A product such as
#     two_prod's `p = a*b` then has INCONSISTENT values across its uses
#     (exact inside one fusion's fma, rounded elsewhere), which voids the
#     Dekker/Knuth identities at ulp level. Measured round 2: a compiled
#     df64 CG returned an x with true residual 5.7e-7 while its recursive
#     residual read 5.9e-12; disabling the `fusion` HLO pass restored
#     1e-13, pinning the blame on fused codegen, not HLO algebra. The fix
#     is lax.reduce_precision(x, 8, 23) — an f32 identity, but a real HLO
#     op that survives to codegen and cuts the contraction window.
#
# reduce_precision is applied only on the CPU backend: TPU codegen honors
# the HLO rounding semantics (round-1 on-chip NPB zeta verified at 1e-14
# with plain barriers) and the extra op would cost VPU cycles in the hot
# df64 kernels for nothing.
def _eft_barrier(x):
    x = jax.lax.optimization_barrier(x)
    if jax.default_backend() == "cpu":
        x = jax.lax.reduce_precision(x, 8, 23)
    return x


def _two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly.

    Every intermediate difference is barriered, not just the sum: the
    simplifier pattern-matches pure algebra — sub(s, sub(s, a)) -> a fires
    even when s is opaque, because the rewrite needs only structural
    equality of the two s uses. Round 2 found exactly that: a 15-iteration
    jitted df64 CG stalled at true residual 8.6e-8 while the op-by-op
    execution of the same code reached 4e-14, with the divergence
    appearing only once >= 2 iterations compiled together (larger graphs
    reach the rewrite's fuel/threshold). Barriers on each EFT difference
    make every cancellation-bearing value opaque.
    """
    s = _eft_barrier(a + b)
    bb = _eft_barrier(s - a)
    e = (a - _eft_barrier(s - bb)) + (b - bb)
    return s, e


def _quick_two_sum(a, b):
    """Fast TwoSum, requires |a| >= |b|."""
    s = _eft_barrier(a + b)
    e = b - _eft_barrier(s - a)
    return s, e


def _split(a):
    t = _eft_barrier(_SPLIT * a)
    ahi = t - _eft_barrier(t - a)
    alo = a - _eft_barrier(ahi)
    return ahi, alo


def _two_prod(a, b):
    """Dekker TwoProd: p + e == a * b exactly (no FMA dependence)."""
    p = _eft_barrier(a * b)
    ahi, alo = _split(a)
    bhi, blo = _split(b)
    e = (_eft_barrier(ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


# ---------------------------------------------------------------------------
# construction / conversion
# ---------------------------------------------------------------------------


def split_f64_np(x: "np.ndarray") -> "np.ndarray":
    """Host-side double-word split: f64 array -> [..., 2] (hi, lo) f32.

    The one place that owns the rounding convention every builder uses
    when staging df64 values (hi = round-to-f32, lo = exact residual)."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return np.stack([hi, lo], axis=-1)


def from_f64(x) -> DF:
    """Split host float64 data into an exact (hi, lo) f32 pair (on host)."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def from_f32(x) -> DF:
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def to_f64(d: DF) -> np.ndarray:
    return np.asarray(d.hi, dtype=np.float64) + np.asarray(d.lo, dtype=np.float64)


def zeros(shape, dtype=jnp.float32) -> DF:
    z = jnp.zeros(shape, dtype)
    return DF(z, z)


def full(shape, value: float, dtype=jnp.float32) -> DF:
    v = np.float64(value)
    hi = np.float32(v)
    lo = np.float32(v - np.float64(hi))
    return DF(jnp.full(shape, hi, dtype), jnp.full(shape, lo, dtype))


# ---------------------------------------------------------------------------
# arithmetic
# ---------------------------------------------------------------------------


def add(a: DF, b: DF) -> DF:
    """Accurate (QD 'ieee') double-word addition.

    The cheaper 'sloppy' variant (e = e + a.lo + b.lo in one step) loses
    relative accuracy under heavy cancellation — exactly what CG residual
    updates do — and cost NPB classes W/A their 1e-10 ζ tolerance
    (measured ~4.5e-8 with the sloppy add). This version keeps ~2^-48
    relative error even when hi components cancel.
    """
    s1, s2 = _two_sum(a.hi, b.hi)
    t1, t2 = _two_sum(a.lo, b.lo)
    s2 = s2 + t1
    s1, s2 = _quick_two_sum(s1, s2)
    s2 = s2 + t2
    hi, lo = _quick_two_sum(s1, s2)
    return DF(hi, lo)


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def mul(a: DF, b: DF) -> DF:
    p, e = _two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    hi, lo = _quick_two_sum(p, e)
    return DF(hi, lo)


def mul_f32(a: DF, b) -> DF:
    p, e = _two_prod(a.hi, b)
    e = e + a.lo * b
    hi, lo = _quick_two_sum(p, e)
    return DF(hi, lo)


def div(a: DF, b: DF) -> DF:
    q1 = a.hi / b.hi
    r = sub(a, mul_f32(b, q1))
    q2 = r.hi / b.hi
    r = sub(r, mul_f32(b, q2))
    q3 = r.hi / b.hi
    hi, lo = _quick_two_sum(q1, q2)
    return add(DF(hi, lo), from_f32(q3))


def sqrt(a: DF) -> DF:
    s = jnp.sqrt(a.hi)
    # one Newton step in df: s' = s + (a - s^2) / (2 s)
    s_df = from_f32(s)
    diff = sub(a, mul(s_df, s_df))
    corr = diff.hi / (2.0 * s)
    return add(s_df, from_f32(corr))


def rsqrt(a: DF) -> DF:
    one = full((), 1.0)
    return div(one, sqrt(a))


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


def sum_df(a: DF, axis: int = -1) -> DF:
    """Accurate reduction along an axis by pairwise df-addition halving.

    O(log n) vectorized df-add steps; each step is exact-compensated, so the
    final error is O(log n * 2^-48) relative — effectively f64 quality.
    """
    hi = jnp.moveaxis(a.hi, axis, -1)
    lo = jnp.moveaxis(a.lo, axis, -1)
    n = hi.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        pad = half * 2 - n
        if pad:
            hi = jnp.pad(hi, [(0, 0)] * (hi.ndim - 1) + [(0, pad)])
            lo = jnp.pad(lo, [(0, 0)] * (lo.ndim - 1) + [(0, pad)])
        x = DF(hi[..., :half], lo[..., :half])
        y = DF(hi[..., half:], lo[..., half:])
        r = add(x, y)
        hi, lo = r.hi, r.lo
        n = half
    return DF(hi[..., 0], lo[..., 0])


def sum_df0(a: DF) -> DF:
    """Accurate reduction along axis 0 by pairwise df-addition halving.

    Equivalent to sum_df(a, axis=0) but WITHOUT the moveaxis: reducing a
    (K, rows) array over its MAJOR axis keeps every intermediate in the
    rows-minor layout. That matters on TPU: sum_df's moveaxis transposes
    to (rows, K), and XLA pads the minor dimension to the 128-lane tile —
    at ELL-typical K (7-27) that is an 8-32x materialization blow-up on
    every barriered EFT intermediate (measured: ~350 ms of a 467 ms
    hier df64 matvec sat in this glue at SparseBench-160 scale)."""
    hi, lo = a.hi, a.lo
    k = hi.shape[0]
    while k > 1:
        half = (k + 1) // 2
        pad = half * 2 - k
        if pad:
            hi = jnp.pad(hi, [(0, pad)] + [(0, 0)] * (hi.ndim - 1))
            lo = jnp.pad(lo, [(0, pad)] + [(0, 0)] * (lo.ndim - 1))
        r = add(DF(hi[:half], lo[:half]), DF(hi[half:], lo[half:]))
        hi, lo = r.hi, r.lo
        k = half
    return DF(hi[0], lo[0])


def dot(a: DF, b: DF) -> DF:
    """Accurate dot product of two df vectors (TwoProd + pairwise df-sum)."""
    prods = mul(a, b)
    return sum_df(prods, axis=-1)
