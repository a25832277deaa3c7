"""Tiled Pallas GEMM (MXU) — the dense `mm_harness` counterpart.

The reference's dense sibling ABI multiplies C[m,n] = Σ_k A[m,k]·B[n,k]
(A, B column-major; B effectively transposed —
/root/reference/parboil/benchmarks/sgemm/src/base/sgemm_kernel.cc:16-40).
XLA's jnp.dot is already near-roofline for large shapes; this kernel exists
as the tuned-GEMM registry entry (the OpenBLAS/cuBLAS analogue) and as the
template for fused sparse-dense epilogues. 128x128 output tiles, K-major
accumulation grid, f32 accumulation via preferred_element_type.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jnp.dot(
        a_ref[...], b_ref[...], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
def matmul_nt(a: jax.Array, bt: jax.Array, *, tm=256, tn=256, tk=512):
    """C = a @ bt.T with a [M, K], bt [N, K] (the parboil 'NT' layout)."""
    m, k = a.shape
    n, k2 = bt.shape
    assert k == k2
    pm, pn, pk = (-m) % tm, (-n) % tn, (-k) % tk
    if pm or pk:
        a = jnp.pad(a, ((0, pm), (0, pk)))
    if pn or pk:
        bt = jnp.pad(bt, ((0, pn), (0, pk)))
    mp, kp = a.shape
    np_, _ = bt.shape

    out = pl.pallas_call(
        _kernel,
        grid=(mp // tm, np_ // tn, kp // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, q: (i, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, q: (q, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, q: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        # CPU (unit tests / virtual meshes) runs Pallas in interpreter mode
        interpret=jax.default_backend() == "cpu",
    )(a, bt.T)
    return out[:m, :n]


def matmul_nt_xla(a: jax.Array, bt: jax.Array):
    """XLA reference path (the registry's portable entry)."""
    return jax.lax.dot_general(
        a, bt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
