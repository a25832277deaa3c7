#!/usr/bin/env python
"""Attribute the sb160 matvec gap: passes sum ~82ms but the matvec is
467ms. Times each stage of _routed_hier_spmv_packed_df separately."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("LILAC_HIER_GMAX", "3")

from lilac_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lilac_tpu.kernels import routed as rd  # noqa: E402
from lilac_tpu.kernels.routed_spmv import _chunk_reduce_net, _pad_plane, hier_net_apply  # noqa: E402
from lilac_tpu.ops import dfloat as df  # noqa: E402

REPS = 10


def fence(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timeit(label, fn, *args, reps=REPS):
    y = fn(*args)
    fence(y)
    t0 = time.perf_counter()
    y = fn(*args)
    fence(y)
    t = (time.perf_counter() - t0) / reps
    print(f"  {label:28s} {t * 1e3:8.2f} ms", flush=True)
    return t


from lilac_tpu.workloads import sparsebench as sb  # noqa: E402

t0 = time.perf_counter()
plan, plan_t, n, _csr = sb.build_bench_plans(
    160, dtype="df64", kernel="routed", sigma_relabel=True
)
print(f"loaded in {time.perf_counter() - t0:.0f}s", flush=True)
A = plan.A
x = plan.vec_in(np.random.default_rng(0).normal(size=n))

ph = _pad_plane(np.asarray(df.to_f64(x), np.float32) * 0 + 1.0, A.m)  # dummy f32
pl_ = ph * 0.5


def chain(body):
    @jax.jit
    def run(*args):
        def step(_, a):
            return body(*a) if isinstance(a, tuple) else body(a)

        # close over args; chain on the first arg shape only when possible
        out = args
        return jax.lax.fori_loop(
            0, REPS, lambda i, o: body(*args), body(*args)
        )

    return run


# 1. both groups' passes only (fori chains re-running the same apply)
@jax.jit
def groups_only(ph, pl_):
    def step(_, acc):
        outs = []
        for grp in A.groups:
            oh, ol = rd.hier_apply_batched(
                (ph, pl_), grp.pass_meta, grp.pass_masks, A.bl
            )
            outs.append(oh[0, 0, 0] + ol[0, 0, 0])
        return acc + outs[0] + outs[1]

    return jax.lax.fori_loop(0, REPS, step, jnp.float32(0))


timeit("groups passes only", groups_only, ph, pl_)


# 2. + df mul + chunk reduce (everything except unperm)
@jax.jit
def upto_reduce(ph, pl_):
    def step(_, acc):
        nnets = len(A.chunks)
        parts_h = [None] * nnets
        for grp in A.groups:
            oh, ol = rd.hier_apply_batched(
                (ph, pl_), grp.pass_meta, grp.pass_masks, A.bl
            )
            Ng = len(grp.net_ids)
            a = df.DF(grp.vals[0], grp.vals[1])  # plane-shaped [Ng, R, 128]
            prod = df.mul(a, df.DF(oh, ol))
            for li, ni in enumerate(grp.net_ids):
                parts_h[ni] = _chunk_reduce_net(
                    prod.hi[li].reshape(A.m), A.chunks[ni], A.colmajor
                )
        return acc + jnp.concatenate(parts_h)[0]

    return jax.lax.fori_loop(0, REPS, step, jnp.float32(0))


timeit("passes + mul + reduce(hi)", upto_reduce, ph, pl_)

# 3. unperm alone
y0h = jnp.zeros((A.m_out // 128, 128), jnp.float32)
y0l = y0h


@jax.jit
def unperm_only(yh, yl):
    def step(_, acc):
        uh, ul = hier_net_apply(A.unperm, (yh, yl), A.bl)
        return acc + uh[0, 0] + ul[0, 0]

    return jax.lax.fori_loop(0, REPS, step, jnp.float32(0))


if A.unperm is not None:
    print(f"unperm passes: {[m[0] for m in A.unperm.pass_meta]}", flush=True)
    timeit("unperm only", unperm_only, y0h, y0l)
else:
    print("unperm: None", flush=True)


# 4. full matvec reference
@jax.jit
def mv_chain(A_, v):
    def step(_, vv):
        return plan.matvec_with(A_, vv)

    return jax.lax.fori_loop(0, REPS, step, v)


timeit("full matvec", mv_chain, A, x)

os._exit(0)
