"""Checkpoint / resume for iterative solves — a capability the reference
lacks entirely (SURVEY §5: its only persistence is saving generated
matrices to disk). Long CG/power-method runs on preemptible TPU slices need
solver-state checkpointing; state is a pytree of device arrays plus a
metadata dict, stored as an .npz (orbax is available for multi-host async
checkpointing, but a single-file format keeps the restore path trivially
inspectable and dependency-free).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np


def save_state(path: str, state, meta: Dict[str, Any]) -> None:
    """state: arbitrary pytree of arrays (DF pairs included)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(dict(meta=meta, nleaves=len(leaves))).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_state(path: str, treedef_like) -> Tuple[Any, Dict[str, Any]]:
    """treedef_like: a pytree with the same structure (values ignored)."""
    import jax
    import jax.numpy as jnp

    z = np.load(path)
    info = json.loads(bytes(z["__meta__"]).decode())
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(info["nleaves"])]
    _, treedef = jax.tree_util.tree_flatten(treedef_like)
    return jax.tree_util.tree_unflatten(treedef, leaves), info["meta"]


def checkpointed_power_method(
    plan, x0, shift: float, niter: int, *, path: str, every: int = 5, alg=None
):
    """NPB outer loop with periodic checkpointing; resumes automatically
    when `path` exists. Returns (zeta_history, x_final, start_iter)."""
    import jax

    from lilac_tpu.solvers.algebra import get_algebra
    from lilac_tpu.solvers.cg import npb_power_method

    alg = alg or get_algebra(plan.dtype)
    start = 0
    zetas: list = []
    x = x0
    if os.path.exists(path):
        (x,), meta = load_state(path, (x0,))
        start = meta["iter"]
        zetas = list(meta["zetas"])

    it = start
    while it < niter:
        step = min(every, niter - it)
        z, r, x = npb_power_method_jit(plan, alg, x, shift, step)
        zetas.extend(np.asarray(_to_f64(alg, z)).tolist())
        it += step
        save_state(path, (x,), dict(iter=it, zetas=zetas))
    return np.asarray(zetas), x, start


# jit closures are cached per (plan, alg, shift): jax.jit keys its compile
# cache on function identity, so building a fresh closure per call would
# recompile on every resume chunk (advisor r1 finding)
_JIT_CACHE: dict = {}


def npb_power_method_jit(plan, alg, x, shift, length):
    import functools

    import jax

    from lilac_tpu.solvers.cg import npb_power_method

    key = (id(plan), id(alg), float(shift))
    run = _JIT_CACHE.get(key)
    if run is None:

        @functools.partial(jax.jit, static_argnums=(2,))
        def run(A, x, length):
            return npb_power_method(plan.matvec_with, alg, A, x, shift, length)

        # bound the cache: each closure pins its plan's staged device
        # arrays (GBs at large classes), so evict oldest beyond a few
        # entries. Holding (plan, alg) in the value also keeps the id()
        # keys valid while cached (no id-reuse aliasing).
        while len(_JIT_CACHE) >= 4:
            _JIT_CACHE.pop(next(iter(_JIT_CACHE)))
        _JIT_CACHE[key] = (run, plan, alg)
    else:
        run = run[0]
    return run(plan.A, x, length)


def _to_f64(alg, z):
    from lilac_tpu.ops import dfloat as df

    if isinstance(z, df.DF):
        return df.to_f64(z)
    return np.asarray(z, dtype=np.float64)
