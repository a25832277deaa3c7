"""Fused df64 multiply+reduce kernel (kernels/dfmulred.py)."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_dfmulred_matches_f64(rng):
    """Fused kernel == f64 row sums to df64 accuracy (interpret mode)."""
    import jax.numpy as jnp

    from lilac_tpu.kernels.dfmulred import dfmulred
    from lilac_tpu.ops import dfloat as df

    for K, rows in ((1, 300), (7, 513), (27, 1024)):
        v = rng.standard_normal((K, rows)) * 10.0 ** rng.uniform(-6, 6)
        x = rng.standard_normal((K, rows)) * 10.0 ** rng.uniform(-6, 6)
        vs = df.split_f64_np(v)
        xs = df.split_f64_np(x)
        yh, yl = dfmulred(
            jnp.asarray(vs[..., 0]), jnp.asarray(vs[..., 1]),
            jnp.asarray(xs[..., 0]), jnp.asarray(xs[..., 1]),
            rows, interpret=True,
        )
        got = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
        # longdouble oracle: a plain f64 sum carries K*eps64*sum|terms|
        # of its own error under cancellation, which would dominate the
        # comparison; the bound below is conditioning-aware (dot2 error
        # is O(K^2 eps32^2 * sum|terms|), eps32^2 = 3.6e-15)
        prod = v.astype(np.longdouble) * x.astype(np.longdouble)
        want = prod.sum(axis=0).astype(np.float64)
        bound = 1e-11 * np.abs(prod).sum(axis=0).astype(np.float64) + 1e-30
        assert (np.abs(got - want) <= bound).all(), (
            K, rows, np.abs(got - want).max(), bound.min(),
        )


def test_chunk_mulreduce_fused_matches_xla_chain(rng):
    """chunk_mulreduce_df fused path == the barriered XLA chain across a
    multi-chunk col-major layout."""
    import jax.numpy as jnp

    from lilac_tpu.kernels.dfmulred import chunk_mulreduce_df
    from lilac_tpu.ops import dfloat as df

    chlist = ((0, 400, 5), (2000, 100, 13))
    m = 4096
    vals64 = rng.standard_normal(m)
    o64 = rng.standard_normal(m)
    vals = jnp.asarray(df.split_f64_np(vals64))
    os_ = df.split_f64_np(o64)
    oh, ol = jnp.asarray(os_[..., 0]), jnp.asarray(os_[..., 1])

    h_x, l_x = chunk_mulreduce_df(
        vals, oh, ol, chlist, True, force_fused=False
    )
    h_f, l_f = chunk_mulreduce_df(
        vals, oh, ol, chlist, True, interpret=True, force_fused=True
    )
    ref = np.asarray(h_x, np.float64) + np.asarray(l_x, np.float64)
    got = np.asarray(h_f, np.float64) + np.asarray(l_f, np.float64)
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-15)

    # and both equal the f64 oracle per chunk
    want = []
    for (s0, rows_c, K) in chlist:
        seg = (vals64[s0 : s0 + rows_c * K] * o64[s0 : s0 + rows_c * K])
        want.append(seg.reshape(K, rows_c).sum(axis=0))
    want = np.concatenate(want)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)
