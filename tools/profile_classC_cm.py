#!/usr/bin/env python
"""Stage profile of the class-C col-major df64 matvec on chip.

Times (a) the routed passes alone, (b) passes + mul/reduce glue
(XLA chain), (c) the full factored matvec, so the remaining df64 glue
share is measured, not guessed (decides whether the batched fused
kernel is worth its complexity)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lilac_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()
os.environ["LILAC_FACTORED_SEGMODE"] = "routed"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lilac_tpu.kernels import factored as F  # noqa: E402
from lilac_tpu.kernels import routed as rd  # noqa: E402
from lilac_tpu.kernels import routed_spmv as rs  # noqa: E402
from lilac_tpu.ops import dfloat as df  # noqa: E402

cont, nnz = F.build_factored("C", dtype="df64")
V = cont.V
print(f"V: {type(V).__name__} m={V.m} chunks={len(V.chunks)} colmajor={V.colmajor}", flush=True)

n = cont.s.shape[0]
x = df.from_f64(np.random.default_rng(0).standard_normal(n))
REPS = 50


def bench(tag, fn, *args):
    c = jax.jit(lambda *a: jax.lax.fori_loop(
        0, REPS, lambda i, carry: fn(*carry), a))
    r = c(*args)
    jax.tree_util.tree_map(np.asarray, r)
    t0 = time.time()
    r = c(*args)
    jax.tree_util.tree_map(np.asarray, r)
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{tag:30s} {dt:8.3f} ms", flush=True)
    return dt


ph = rs._pad_plane(x.hi, V.m)
pl_ = rs._pad_plane(x.lo, V.m)

# (a) passes only (carry one m-plane back through)
def passes_only(ph, pl_):
    oh, ol = rd.routed_apply([ph, pl_], V.masks, V.kinds, V.dists)
    B = len(V.chunks)
    return (oh.reshape(B, V.m)[0].reshape(V.m // 128, 128),
            ol.reshape(B, V.m)[0].reshape(V.m // 128, 128))

# (b) passes + mul/reduce to df vector, re-pad to planes
def passes_glue(ph, pl_):
    oh, ol = rd.routed_apply([ph, pl_], V.masks, V.kinds, V.dists)
    B = len(V.chunks)
    hi, lo = rs._mulreduce_df_2d(
        V.vals, oh.reshape(B, V.m), ol.reshape(B, V.m), V.chunks, V.colmajor
    )
    return rs._pad_plane(hi, V.m), rs._pad_plane(lo, V.m)

# (c) full factored matvec chained
def full_mv(h, l_):
    y = F.factored_spmv_df(cont, df.DF(h, l_))
    return y.hi * 1e-1, y.lo * 1e-1

t_a = bench("V passes only (df64)", passes_only, ph, pl_)
t_b = bench("V passes + mul/reduce", passes_glue, ph, pl_)
t_c = bench("full factored matvec", full_mv, x.hi, x.lo)
print(f"glue per side = {t_b - t_a:.3f} ms; non-pass share of matvec = "
      f"{(t_c - 2 * t_a) / t_c * 100:.0f}%", flush=True)
os._exit(0)
