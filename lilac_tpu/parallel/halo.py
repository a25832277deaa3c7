"""Halo-exchange distributed SpMV: ppermute ring instead of all-gather.

DistSpmvPlan (dist.py) all-gathers x every matvec — optimal when each row
shard references most columns (NPB CG's uniformly random pattern). For
matrices with column locality (stencils: SparseBench structure=1,
regular meshes — the reference's `regular.f` family), each shard's column
footprint outside its own block is a thin halo; gathering everything wastes
ICI bandwidth. This plan precomputes, per (source, destination) shard pair,
exactly which x entries travel, and exchanges them with a lax.ppermute
ring — the TPU-native form of the MPI-NPB halo bookkeeping the serial
reference inherited (cg.f:116-119) but never exercised.

Ghost layout: received segments concatenate after the local block (uniform
pad H per pair), and ELL column ids are remapped at plan-build time into
the [local | ghost] space — so the device matvec is gather-free beyond the
usual ELL gather, with zero scatter.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lilac_tpu.formats import convert
from lilac_tpu.solvers.algebra import get_algebra
from lilac_tpu.parallel.dist import DistAlg


@dataclasses.dataclass
class HaloSpmvPlan:
    """Row-block ELL plan with ring halo exchange (f32/f64)."""

    mesh: Mesh
    axis: str
    data: jax.Array  # [ndev, rps, K]
    indices: jax.Array  # [ndev, rps, K] int32 ids into [local | ghost]
    send_tbl: jax.Array  # [ndev, ndev-1, H] int32 local positions to send
    shape: Tuple[int, int]
    n_pad: int
    rps: int
    halo: int  # H
    dtype: str

    @staticmethod
    def build(indptr, indices, data, shape, mesh, *, dtype="f32", axis="x"):
        ndev = mesh.shape[axis]
        n = shape[0]
        assert shape[0] == shape[1]
        rps = convert.round_up(-(-n // ndev), 8)
        n_pad = ndev * rps
        np_t = {"f32": np.float32, "f64": np.float64}[dtype]
        ev, ec = convert.csr_to_ell_arrays(
            indptr, indices, data.astype(np_t), shape, row_pad=n_pad
        )
        K = ev.shape[1]
        ev = ev.reshape(ndev, rps, K)
        ec = ec.reshape(ndev, rps, K).astype(np.int64)

        # per (dst, src) needed columns; H = max over pairs
        owner = ec // rps
        needed = {}  # (dst, src) -> sorted unique local positions on src
        for d in range(ndev):
            used_mask = ev[d] != 0.0
            for s in range(ndev):
                if s == d:
                    continue
                sel = used_mask & (owner[d] == s)
                cols = np.unique(ec[d][sel]) if sel.any() else np.empty(0, np.int64)
                needed[(d, s)] = cols - s * rps
        H = max((len(v) for v in needed.values()), default=0)
        H = max(H, 1)

        send_tbl = np.zeros((ndev, ndev - 1, H), dtype=np.int64)
        for s in range(ndev):
            for k in range(1, ndev):
                dsh = (s + k) % ndev
                pos = needed[(dsh, s)]
                send_tbl[s, k - 1, : len(pos)] = pos

        # remap ELL ids into [local(rps) | ghosts((ndev-1)*H)]
        new_ec = np.zeros_like(ec)
        for d in range(ndev):
            local = owner[d] == d
            new_ec[d] = np.where(local, ec[d] - d * rps, 0)
            for k in range(1, ndev):
                s = (d - k) % ndev
                pos = needed[(d, s)]
                lookup = np.full(rps, 0, dtype=np.int64)
                lookup[pos] = rps + (k - 1) * H + np.arange(len(pos))
                sel = owner[d] == s
                new_ec[d] = np.where(sel, lookup[np.clip(ec[d] - s * rps, 0, rps - 1)], new_ec[d])
            # padding slots (value 0) may point anywhere valid
        sh3 = NamedSharding(mesh, P(axis, None, None))
        return HaloSpmvPlan(
            mesh=mesh,
            axis=axis,
            data=jax.device_put(jnp.asarray(ev), sh3),
            indices=jax.device_put(jnp.asarray(new_ec, dtype=jnp.int32), sh3),
            send_tbl=jax.device_put(jnp.asarray(send_tbl, dtype=jnp.int32), sh3),
            shape=tuple(shape),
            n_pad=n_pad,
            rps=rps,
            halo=H,
            dtype=dtype,
        )

    # -- vectors ---------------------------------------------------------

    def vec_in(self, x: np.ndarray):
        xp = np.zeros(self.n_pad, dtype=np.float64)
        xp[: self.shape[0]] = np.asarray(x, dtype=np.float64)
        jt = {"f32": jnp.float32, "f64": jnp.float64}[self.dtype]
        sh = NamedSharding(self.mesh, P(self.axis))
        return jax.device_put(jnp.asarray(xp, dtype=jt), sh)

    def vec_out(self, y) -> np.ndarray:
        return np.asarray(y, dtype=np.float64)[: self.shape[0]]

    # -- per-shard matvec (call INSIDE shard_map) --------------------------

    def local_matvec(self, A_local, x_local):
        data, idx, send = A_local
        ndev = self.mesh.shape[self.axis]
        ghosts = []
        for k in range(1, ndev):
            buf = x_local[send[0, k - 1]]
            perm = [(i, (i + k) % ndev) for i in range(ndev)]
            ghosts.append(jax.lax.ppermute(buf, self.axis, perm))
        x_ext = jnp.concatenate([x_local] + ghosts) if ghosts else x_local
        gathered = x_ext[idx[0]]
        return jnp.sum(data[0] * gathered, axis=1)

    def alg(self) -> DistAlg:
        return DistAlg(get_algebra(self.dtype), self.axis)

    @property
    def a_specs(self):
        ax = self.axis
        return (P(ax, None, None), P(ax, None, None), P(ax, None, None))

    def vspec(self):
        return P(self.axis)


def halo_matvec(plan: HaloSpmvPlan, x):
    """Whole-mesh SPMD matvec (jit + shard_map wrapper)."""
    ax = plan.axis

    f = jax.jit(
        jax.shard_map(
            plan.local_matvec,
            mesh=plan.mesh,
            in_specs=(plan.a_specs, P(ax)),
            out_specs=P(ax),
            check_vma=False,
        )
    )
    return f((plan.data, plan.indices, plan.send_tbl), x)
