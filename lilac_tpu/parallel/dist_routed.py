"""Distributed SpMV through per-shard routing networks.

Row-block distribution as in parallel/dist.py (all-gather x over ICI,
psum dot products), but the per-shard gather runs through a plan-time
routing network (kernels/routenet + kernels/routed) instead of XLA's
gather engine — the multi-chip face of the routed kernels.

Sharding story: every shard owns rows [d*rps, (d+1)*rps) ELL-packed at a
COMMON width K, and one network per shard gathers the all-gathered x into
its term slots. All shards are built in a single `build_gather_network`
batch, so they share one canonical stage schedule (drop_empty=False) and
the only per-shard state is the bit-packed mask stack [ndev, P, R, 128] —
sharded on the mesh axis like the values. Inside shard_map each device
sees its [1, P, R, 128] slice, which is exactly the B=1 masks layout
`routed_apply` expects; the Pallas kernel runs per chip, collectives ride
ICI around it.

v1 scope: one network per shard (rps * K <= m); matrices with near-
uniform rows (NPB CG class shapes) — the single-chip hierarchical/chunked
machinery generalizes this when real multi-chip hardware is available.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lilac_tpu.formats import convert
from lilac_tpu.kernels import routed as rd
from lilac_tpu.kernels import routenet as rn
from lilac_tpu.ops import dfloat as df
from lilac_tpu.parallel.dist import DistAlg
from lilac_tpu.solvers.algebra import get_algebra


@dataclasses.dataclass
class DistRoutedPlan:
    mesh: Mesh
    axis: str
    masks: jax.Array  # [ndev, P, R, 128] int8, sharded on axis
    vals: jax.Array  # [ndev, rps, K] (or [..., 2]), sharded on axis
    kinds: Tuple[str, ...]
    dists: Tuple[int, ...]
    shape: Tuple[int, int]
    n_pad: int
    m: int
    rps: int
    K: int
    dtype: str

    @staticmethod
    def build(
        indptr: np.ndarray,
        indices: np.ndarray,
        data: np.ndarray,
        shape: Tuple[int, int],
        mesh: Mesh,
        *,
        dtype: str = "f32",
        axis: str = "x",
    ) -> "DistRoutedPlan":
        ndev = mesh.shape[axis]
        n = shape[0]
        assert shape[0] == shape[1], "distributed plan assumes square matrices"
        rps = convert.round_up(-(-n // ndev), 8)
        n_pad = ndev * rps

        if dtype == "df64":
            vals = df.split_f64_np(data)
        else:
            vals = data.astype({"f32": np.float32, "f64": np.float64}[dtype])

        ev, ec = convert.csr_to_ell_arrays(indptr, indices, vals, shape, row_pad=n_pad)
        K = ec.shape[1]
        m = max(1024, 1 << int(np.ceil(np.log2(max(n_pad, rps * K)))))
        assert rps * K <= m, "v1: one network per shard"
        idx = np.tile(np.arange(m, dtype=np.int64) % n_pad, (ndev, 1))
        flat = ec.reshape(ndev, rps * K)
        idx[:, : rps * K] = flat
        net = rn.build_gather_network(idx, n_pad, m, drop_empty=False)

        sh = NamedSharding(mesh, P(axis, *(None,) * 3))
        vsh = NamedSharding(
            mesh, P(axis, *(None,) * (ev.ndim - 1))
        )
        return DistRoutedPlan(
            mesh=mesh,
            axis=axis,
            masks=jax.device_put(rd.masks_device(net), sh),
            vals=jax.device_put(
                jnp.asarray(ev.reshape((ndev, rps, K) + ev.shape[2:])), vsh
            ),
            kinds=net.kinds,
            dists=net.dists,
            shape=tuple(shape),
            n_pad=n_pad,
            m=m,
            rps=rps,
            K=K,
            dtype=dtype,
        )

    # -- vectors (same conventions as DistSpmvPlan) ----------------------

    def vec_in(self, x: np.ndarray):
        xp = np.zeros(self.n_pad, dtype=np.float64)
        xp[: self.shape[0]] = np.asarray(x, dtype=np.float64)
        sh = NamedSharding(self.mesh, P(self.axis))
        if self.dtype == "df64":
            hi = xp.astype(np.float32)
            lo = (xp - hi.astype(np.float64)).astype(np.float32)
            return df.DF(
                jax.device_put(jnp.asarray(hi), sh),
                jax.device_put(jnp.asarray(lo), sh),
            )
        jt = {"f32": jnp.float32, "f64": jnp.float64}[self.dtype]
        return jax.device_put(jnp.asarray(xp, dtype=jt), sh)

    def vec_out(self, y) -> np.ndarray:
        if self.dtype == "df64":
            return df.to_f64(y)[: self.shape[0]]
        return np.asarray(y, dtype=np.float64)[: self.shape[0]]

    # -- per-shard matvec (call INSIDE shard_map) ------------------------

    def _route(self, masks_local, planes):
        pads = [
            jnp.pad(p, (0, self.m - p.shape[0])).reshape(self.m // 128, 128)
            for p in planes
        ]
        outs = rd.routed_apply(pads, masks_local, self.kinds, self.dists)
        return [
            o.reshape(self.m)[: self.rps * self.K].reshape(self.rps, self.K)
            for o in outs
        ]

    def local_matvec(self, A_local, x_local):
        masks, vals = A_local  # [1, P, R, 128], [1, rps, K(,2)]
        if self.dtype == "df64":
            x_full = df.DF(
                jax.lax.all_gather(x_local.hi, self.axis, tiled=True),
                jax.lax.all_gather(x_local.lo, self.axis, tiled=True),
            )
            gh, gl = self._route(masks, (x_full.hi, x_full.lo))
            a = df.DF(vals[0, ..., 0], vals[0, ..., 1])
            return df.sum_df(df.mul(a, df.DF(gh, gl)), axis=1)
        x_full = jax.lax.all_gather(x_local, self.axis, tiled=True)
        (g,) = self._route(masks, (x_full,))
        return jnp.sum(vals[0] * g, axis=1)

    def alg(self) -> DistAlg:
        return DistAlg(get_algebra(self.dtype), self.axis)

    @property
    def a_specs(self):
        ax = self.axis
        vdims = self.vals.ndim - 1
        return (P(ax, None, None, None), P(ax, *(None,) * vdims))

    def vspec(self):
        return P(self.axis)

    @property
    def a_arrays(self):
        return (self.masks, self.vals)
