#!/usr/bin/env python
"""Validate error-free transformations inside a Mosaic (Pallas TPU) kernel.

The XLA-level df64 ops need optimization_barriers because the HLO
algebraic simplifier cancels patterns like `a*b - a*b` (dfloat.py:40-70).
A Pallas kernel lowers through Mosaic/MLIR arith, which must NOT fold
FP expressions without fast-math. This probe computes TwoSum and TwoProd
(barrier-free) inside a kernel and checks the error terms against exact
host f64 — if they come back zero (folded) or wrong, fused-EFT kernels
are off the table; if exact, the fused df64 mul+reduce kernel is safe.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

SPLIT = 4097.0


def kern(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    # TwoSum (no barriers)
    s = a + b
    bb = s - a
    e_sum = (a - (s - bb)) + (b - bb)
    # Dekker TwoProd (no barriers, no fma dependence)
    p = a * b
    t = SPLIT * a
    ahi = t - (t - a)
    alo = a - ahi
    t2 = SPLIT * b
    bhi = t2 - (t2 - b)
    blo = b - bhi
    e_prod = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    o_ref[0] = s
    o_ref[1] = e_sum
    o_ref[2] = p
    o_ref[3] = e_prod


def main():
    rng = np.random.default_rng(0)
    n = 1024
    a = (rng.standard_normal(n) * np.exp(rng.uniform(-18, 18, n) * np.log(2))).astype(np.float32)
    b = (rng.standard_normal(n) * np.exp(rng.uniform(-18, 18, n) * np.log(2))).astype(np.float32)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((4, n), jnp.float32),
    )(jnp.asarray(a), jnp.asarray(b))
    out = np.asarray(out)
    s, e_sum, p, e_prod = out

    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    # exact checks: s + e == a + b and p + e == a*b in f64 (both
    # identities are exact when EFT intermediates round correctly)
    sum_exact = a64 + b64
    prod_exact = a64 * b64
    sum_err = np.abs((s.astype(np.float64) + e_sum.astype(np.float64)) - sum_exact)
    prod_err = np.abs((p.astype(np.float64) + e_prod.astype(np.float64)) - prod_exact)
    nz_sum = int(np.count_nonzero(e_sum))
    nz_prod = int(np.count_nonzero(e_prod))
    print(f"two_sum : max |s+e - exact| = {sum_err.max():.3e}   nonzero e: {nz_sum}/{n}")
    print(f"two_prod: max |p+e - exact| = {prod_err.max():.3e}   nonzero e: {nz_prod}/{n}")
    ok = sum_err.max() == 0.0 and prod_err.max() == 0.0 and nz_sum > 0 and nz_prod > 0
    print("MOSAIC EFT:", "EXACT (fused df64 kernels are safe)" if ok else "BROKEN")
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    main()
