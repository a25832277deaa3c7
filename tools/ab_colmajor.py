#!/usr/bin/env python
"""A/B the hier df64 matvec: row-major vs column-major chunk layout.

Builds the same random spread CSR (big_gen semantics) as hier plans in
both layouts (cached under data/ for re-runs), then times the packed
df64 matvec on the live device. The row-major glue — (rows_c, K)
reshapes with K-minor tile padding under barriered EFT ops — measured
~350 ms of a 467 ms matvec at SparseBench-160 scale (round 3,
tools/out4/profile_sb160.log); column-major reduces over the major axis
of (K, rows_c) views instead.

Usage: python tools/ab_colmajor.py [size=100] [reps=20]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lilac_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lilac_tpu.generate.random_crs import random_crs  # noqa: E402
from lilac_tpu.kernels import routed_spmv as rs  # noqa: E402
from lilac_tpu.ops import dfloat as df  # noqa: E402

size = int(sys.argv[1]) if len(sys.argv) > 1 else 100
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

indptr, indices, data, shape = random_crs(size, seed=7)
n = shape[0]
print(f"n={n} nnz={len(indices)}", flush=True)

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)

mats = {}
for cm in (False, True):
    tag = "cm" if cm else "rm"
    path = os.path.join(
        os.path.dirname(__file__), "..", "data", f"ab_colmajor_{size}_{tag}.npz"
    )
    M = rs.load_routed(path) if os.path.exists(path) else None
    if M is None or getattr(M, "colmajor", None) is not cm:
        t0 = time.time()
        M = rs.build_routed_csr_hier(
            indptr, indices, data, shape, dtype="df64", colmajor=cm,
            verbose=True,
        )
        print(f"{tag}: built in {time.time() - t0:.0f}s", flush=True)
        rs.save_routed(path, M)
    mats[tag] = rs.pack_hier(M)

x0 = np.random.default_rng(0).standard_normal(n)


def timeit(tag, A):
    @jax.jit
    def chain(xh, xl):
        def body(i, c):
            y = rs.routed_hier_spmv_df(A, df.DF(c[0], c[1]))
            # rescale so the chained iterates stay finite
            return (y.hi * 1e-2, y.lo * 1e-2)

        return jax.lax.fori_loop(0, reps, body, (xh, xl))

    xh = jnp.asarray(x0, jnp.float32)
    xl = jnp.zeros_like(xh)
    r = chain(xh, xl)
    np.asarray(r[0])  # compile + warm
    t0 = time.time()
    r = chain(xh, xl)
    h = np.asarray(r[0])
    dt = (time.time() - t0) / reps
    print(f"{tag}: {dt * 1e3:8.2f} ms/matvec   (checksum {h[:4]})", flush=True)
    return dt


t_rm = timeit("row-major", mats["rm"])
t_cm = timeit("col-major", mats["cm"])
print(f"speedup col/row = {t_rm / t_cm:.2f}x", flush=True)
os._exit(0)
