#!/usr/bin/env python
"""Per-pass profile of the sb160 hierarchical routed matvec (packed).

Loads the cached sb160 forward plan, then times on chip:
  - raw HBM speed-of-light probe (big-array add: read+write GB/s),
  - the full packed matvec (chained),
  - each DISTINCT pass of group 0's schedule, repeated in a chain,
reporting achieved GB/s per pass against its true traffic (planes
in+out per net + masks). Separates kernel inefficiency from session
throttling (the HBM probe moves the same bytes with no pallas)."""

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
from lilac_tpu.ops import dfloat as df  # noqa: E402

REPS = 10


def fence(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    return np.asarray(jnp.ravel(leaf)[0])


def timeit(fn, *args, reps=REPS):
    y = fn(*args)
    fence(y)
    t0 = time.perf_counter()
    y = fn(*args)
    fence(y)
    return (time.perf_counter() - t0) / reps


# --- HBM speed-of-light probe -------------------------------------------
nbig = 1 << 27  # 512 MB f32


@jax.jit
def hbm_probe(v):
    def step(_, vv):
        return vv + 1.0

    return jax.lax.fori_loop(0, REPS, step, v)


v = jnp.zeros(nbig, jnp.float32)
t = timeit(hbm_probe, v)
print(
    f"HBM probe (read+write {nbig * 4 / 2 ** 30:.1f} GiB x2): "
    f"{2 * nbig * 4 / t / 1e9:.0f} GB/s",
    flush=True,
)

# --- load + pack the sb160 forward plan ----------------------------------
from lilac_tpu.workloads import sparsebench as sb  # noqa: E402

t0 = time.perf_counter()
plan, plan_t, n, _csr = sb.build_bench_plans(
    160, dtype="df64", kernel="routed", sigma_relabel=True
)
print(f"plans loaded+packed in {time.perf_counter() - t0:.0f}s "
      f"(kernel={plan.kernel})", flush=True)
A = plan.A
print(f"groups={len(A.groups)} nets/group="
      f"{[len(g.net_ids) for g in A.groups]} m={A.m} bl={A.bl} "
      f"passes/group={[len(g.pass_meta) for g in A.groups]}", flush=True)
for g in A.groups[:1]:
    print("group0 schedule:", [m[0] for m in g.pass_meta], flush=True)

x = plan.vec_in(np.random.default_rng(0).normal(size=n))


@jax.jit
def mv_chain(A, v):
    def step(_, vv):
        return plan.matvec_with(A, vv)

    return jax.lax.fori_loop(0, REPS, step, v)


t_mv = timeit(mv_chain, A, x)
print(f"full matvec: {t_mv * 1e3:.1f} ms", flush=True)

# --- per-pass timing (group 0, distinct pass descriptors) ----------------
grp = A.groups[0]
Ng = len(grp.net_ids)
R = A.bl // 128
mrows = A.m // 128
ph = jnp.zeros((mrows, 128), jnp.float32)
pl_ = jnp.zeros((mrows, 128), jnp.float32)
pern_h = jnp.zeros((Ng, mrows, 128), jnp.float32)
pern_l = jnp.zeros((Ng, mrows, 128), jnp.float32)

seen = set()
for j, meta in enumerate(grp.pass_meta):
    kind = meta[0]
    key = meta
    if key in seen:
        continue
    seen.add(key)
    mk = grp.pass_masks[j]

    def one(planes, mk=mk, meta=meta):
        if meta[0] == "inner":
            return rd.routed_apply_sliced_b(planes, mk, meta[1], meta[2])
        if meta[0] == "butterfly":
            o, _ = rd.butterfly_apply_b(planes, mk, meta[1], A.bl)
            return o
        if meta[0] == "bigshift":
            return rd.bigshift_apply_b(planes, mk, meta[1], A.bl)
        return rd.window_shift_apply_b(planes, mk, meta[1], A.bl)

    @jax.jit
    def chain(p_h, p_l, mk=mk, meta=meta):
        def step(_, pp):
            return tuple(one(pp, mk=mk, meta=meta))

        return jax.lax.fori_loop(0, REPS, step, (p_h, p_l))

    tp = timeit(chain, pern_h, pern_l)
    # true traffic: per-net planes in+out (2 planes f32) + mask bytes
    bytes_planes = Ng * A.m * 4 * 2 * 2
    bytes_mask = int(np.asarray(mk).nbytes)
    gbps = (bytes_planes + bytes_mask) / tp / 1e9
    print(
        f"  pass[{j}] {kind:9s} {str(meta[1])[:24]:24s} {tp * 1e3:8.2f} ms "
        f"{gbps:7.1f} GB/s ({bytes_planes / 2 ** 20:.0f}MB planes + "
        f"{bytes_mask / 2 ** 20:.0f}MB mask)",
        flush=True,
    )

os._exit(0)
