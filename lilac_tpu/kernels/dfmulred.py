"""Fused df64 multiply + K-way row-sum reduction as one Pallas kernel.

The column-major chunk layout (routed_spmv.py) already removed the
tile-padding blow-up from the hier df64 glue, but the XLA-level chain is
still ~36 barriered elementwise ops per slot — every optimization_barrier
(needed against the HLO algebraic simplifier, dfloat.py:40-70) also
blocks fusion, so each op materializes its [m]-sized operand in HBM.
This kernel computes

    y[r] = sum_k df(vals)[k, r] * df(x)[k, r]        (K static)

entirely in VMEM: traffic drops to one read of the four input planes and
one write of the two output planes (~36x less HBM than the barriered
chain). Inside Mosaic there is no algebraic simplifier pass folding
`a*b - a*b`, so the error-free transformations run barrier-free; the
on-chip probe tools/eft_mosaic_check.py asserts TwoSum/TwoProd exactness
against host f64 before this path is trusted (also covered by the
interpret-mode unit tests).

The accumulation is Ogita-Rump-Oishi dot2: TwoProd per term, TwoSum into
the high accumulator, first-order terms compensated in a running low
part. Error is O(K^2 eps^2 cond) — at ELL-typical K <= 32 that is
f64-grade, the same order as the pairwise df-add tree it replaces.

Reference analogue: the fsparsex value-policy kernels
(/root/reference/libspmv/fsparsex.c) pick precision per backend; here the
df64 policy gets its own fused TPU kernel instead of an op chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_SPLIT = 4097.0  # 2^12 + 1 (f32 Dekker split)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _two_prod(a, b):
    p = a * b
    t = _SPLIT * a
    ahi = t - (t - a)
    alo = a - ahi
    t2 = _SPLIT * b
    bhi = t2 - (t2 - b)
    blo = b - bhi
    return p, ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo


def _kern(K, vh_ref, vl_ref, xh_ref, xl_ref, yh_ref, yl_ref):
    s = jnp.zeros(vh_ref.shape[1:], jnp.float32)
    c = s
    for k in range(K):  # static unroll over the ELL width
        vh = vh_ref[k]
        vl = vl_ref[k]
        xh = xh_ref[k]
        xl = xl_ref[k]
        p, ep = _two_prod(vh, xh)
        # first-order cross terms of the df x df product
        ep = ep + (vh * xl + vl * xh)
        s, es = _two_sum(s, p)
        c = c + (es + ep)
    hi, lo = _two_sum(s, c)
    yh_ref[...] = hi
    yl_ref[...] = lo


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dfmulred_call(vh, vl, xh, xl, *, interpret=False):
    K, R = vh.shape
    # VMEM: 4 in-planes K*bw*4B double-buffered + 2 out *bw; ~14MB budget.
    # The 1D outputs take XLA's T(1024) tiling, so the out block (= bw)
    # must be a 1024-multiple or Mosaic rejects the layout (measured:
    # "XLA layout {0:T(1024)} does not match Mosaic layout {0:T(512)}").
    bw = 1024
    while (
        bw * 2 <= R
        and R % (bw * 2) == 0  # blocks must tile R exactly
        and (4 * K * (bw * 2) * 4) * 2 <= 14_000_000
    ):
        bw *= 2
    grid = (R // bw,)
    in_spec = pl.BlockSpec((K, bw), lambda i: (0, i))
    out_spec = pl.BlockSpec((bw,), lambda i: (i,))
    yh, yl = pl.pallas_call(
        functools.partial(_kern, K),
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((R,), jnp.float32)] * 2,
        interpret=interpret,
    )(vh, vl, xh, xl)
    return yh, yl


def dfmulred(vh, vl, xh, xl, rows, *, interpret=False):
    """Fused df64 dot of [K, R] value/x planes -> ([rows], [rows]).

    The planes are padded to a 1024-multiple row count (XLA's 1D f32
    tile); `rows` trims the output. K is static (chunk ELL width)."""
    K, R = vh.shape
    pad = (-R) % 1024
    if pad:
        z = [(0, 0), (0, pad)]
        vh, vl, xh, xl = (jnp.pad(a, z) for a in (vh, vl, xh, xl))
    yh, yl = _dfmulred_call(vh, vl, xh, xl, interpret=interpret)
    return yh[:rows], yl[:rows]


def fused_available() -> bool:
    """The fused kernel is compiled (not interpreted) only on TPU; the
    XLA chain stays the CPU path (interpret-mode pallas is orders of
    magnitude slower than XLA's CPU codegen)."""
    from lilac_tpu.config import cfg

    if not cfg().df_fused:
        return False
    return jax.default_backend() != "cpu"


def chunk_mulreduce_df(vals, o_hi, o_lo, chlist, colmajor, *,
                       interpret=False, force_fused=None):
    """df64 per-net ELL mul+row-sum: vals [m, 2] (or a (hi, lo) tuple of
    [m] planes — the packed groups' padding-free storage), o planes [m]
    -> (hi, lo) concatenated row sums over the (s0, rows_c, K) chunks.

    Column-major chunks on TPU run the fused Pallas kernel; everything
    else falls back to the barriered XLA chain (df.mul + sum tree)."""
    from lilac_tpu.ops import dfloat as df

    if isinstance(vals, tuple):
        vh_m, vl_m = vals
    else:
        vh_m, vl_m = vals[..., 0], vals[..., 1]
    fused = force_fused if force_fused is not None else fused_available()
    # even the smallest block (bw=1024) must fit the ~14 MB scoped-VMEM
    # budget: 4 double-buffered [K, 1024] in-planes — K beyond ~427 would
    # fail the Mosaic compile with no recourse (round-4 advisor), so such
    # chunks take the barriered XLA chain instead
    if fused and any((4 * K * 1024 * 4) * 2 > 14_000_000 for _, _, K in chlist):
        fused = False
    if not (colmajor and fused):
        a = df.DF(vh_m, vl_m)
        prod = df.mul(a, df.DF(o_hi, o_lo))
        from lilac_tpu.kernels.routed_spmv import _chunk_reduce_net_df

        return _chunk_reduce_net_df(prod, chlist, colmajor)
    his, los = [], []
    for (s0, rows_c, K) in chlist:
        sl = slice(s0, s0 + rows_c * K)
        h, l_ = dfmulred(
            vh_m[sl].reshape(K, rows_c),
            vl_m[sl].reshape(K, rows_c),
            o_hi[sl].reshape(K, rows_c),
            o_lo[sl].reshape(K, rows_c),
            rows_c,
            interpret=interpret,
        )
        his.append(h)
        los.append(l_)
    hi = his[0] if len(his) == 1 else jnp.concatenate(his)
    lo = los[0] if len(los) == 1 else jnp.concatenate(los)
    return hi, lo
