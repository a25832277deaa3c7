#!/usr/bin/env python
"""Stage class E (mixed mode) and time ONE matvec on chip — bounds the
solve wall for the full run without committing a 3 h window."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from lilac_tpu.config import enable_compile_cache
enable_compile_cache()
import jax, numpy as np
from lilac_tpu.kernels import factored as F
from lilac_tpu.ops import dfloat as df

t0 = time.time()
cont, nnz = F.build_factored("E", dtype="df64")
print(f"staged in {time.time()-t0:.0f}s: V={type(cont.V).__name__} VT={type(cont.VT).__name__}", flush=True)

n = cont.s.shape[0]
x = df.from_f64(np.ones(n))
# cont MUST be a jit ARGUMENT: closing over it captures the 12 GB of
# plan arrays as program CONSTANTS, and serializing those through the
# remote-compile tunnel wedges the session (observed 2026-08-20)
mv = jax.jit(lambda A, h, l: F.factored_spmv_df(A, df.DF(h, l)))
t0 = time.time()
y = mv(cont, x.hi, x.lo)
np.asarray(y.hi[:4])
print(f"compile+first matvec: {time.time()-t0:.0f}s", flush=True)
for _ in range(3):
    t0 = time.time()
    y = mv(cont, y.hi, y.lo)
    np.asarray(y.hi[:4])
    print(f"matvec: {time.time()-t0:.3f}s", flush=True)
print("checksum", np.asarray(y.hi[:3]), flush=True)
os._exit(0)
