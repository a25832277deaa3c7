"""Distributed SpMV through per-shard routing networks.

Row-block distribution as in parallel/dist.py (all-gather x over ICI,
psum dot products), but the per-shard gather runs through plan-time
routing networks (kernels/routenet + kernels/routed) instead of XLA's
gather engine — the multi-chip face of the routed kernels.

Sharding story: shard_map traces ONE program for every device, so all
per-shard network state must share a single static schedule. Two plan-
build tricks make that true while still adapting to each shard's rows:

  1. every shard's networks are built in a single batched
     `build_gather_network` call (drop_empty=False), so (kinds, dists)
     are canonical and the only per-shard state is the bit-packed mask
     stack [ndev, B, P, R, 128], sharded on the mesh axis like the
     values;
  2. the row-chunk schedule ((rows_c, K_c) per network) is computed from
     the ELEMENTWISE-MAX length profile across shards (each shard sorts
     its rows by length descending; position p's budget is the longest
     row any shard has at p), so one static chunk tuple covers every
     shard — heavy-tailed shards just pad their short rows.

v2 (this file) generalizes round 1's v1 (single network per shard,
uniform-length rows) to B chunked networks per shard with per-chunk
widths and a per-shard un-permute — the same JDS/SELL-style layout the
single-chip RoutedMat uses (kernels/routed_spmv.py), sharded.

HaloRoutedPlan composes the two round-1 capabilities the verdict asked
to combine: ring halo exchange (parallel/halo.py — only the x entries a
shard actually references travel, over ppermute) feeding per-shard
routing networks whose input table is the small [local | ghost] vector
instead of the all-gathered x — fewer stages (table size ~ rps + halo,
not n), less ICI traffic.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lilac_tpu.formats import convert
from lilac_tpu.kernels import routed as rd
from lilac_tpu.kernels import routenet as rn
from lilac_tpu.kernels.routed_spmv import _chunk_reduce, _pow2_at_least
from lilac_tpu.ops import dfloat as df
from lilac_tpu.parallel.dist import DistAlg
from lilac_tpu.solvers.algebra import get_algebra


def _common_chunk_schedule(counts: np.ndarray, m: int):
    """Static (rows_c, K_c) chunks valid for EVERY shard.

    counts: [ndev, rps] row lengths in each shard's packing order. The
    max-profile over shards bounds position p's width, so chunks cut from
    it fit all shards (greedy, K widened to the true in-chunk max as in
    build_routed_csr).
    """
    profile = counts.max(axis=0)
    rps = len(profile)
    chunks = []
    i0 = 0
    while i0 < rps:
        k_c = max(int(profile[i0]), 1)
        rows_c = min(m // k_c, rps - i0)
        k_true = max(int(profile[i0 : i0 + rows_c].max()), 1)
        if k_true > k_c:
            rows_c = min(m // k_true, rps - i0)
            k_c = max(int(profile[i0 : i0 + rows_c].max()), 1)
        chunks.append((rows_c, k_c))
        i0 += rows_c
    return tuple(chunks)


def _pack_shard_chunks(
    indptr, indices, data, shape, ndev, *, dtype, m_floor, sort_rows=True
):
    """Shared shard / sort / chunk-schedule / slot packing for the routed
    distributed plans. Returns a dict with:
      rps, n_pad, m, sort_rows (resolved), rank [ndev, rps],
      chunks ((rows_c, K_c), ...), base [ndev*B, m] gather indices laid
      out d-major (row d*B+b), vals [ndev, B, m(,2)] slot-ordered values.
    """
    n = shape[0]
    assert shape[0] == shape[1], "distributed plan assumes square matrices"
    rps = convert.round_up(-(-n // ndev), 8)
    n_pad = ndev * rps
    counts = np.zeros(n_pad, dtype=np.int64)
    counts[:n] = np.diff(indptr)
    counts2 = counts.reshape(ndev, rps)
    kmax = max(int(counts.max()), 1)
    m = max(m_floor, _pow2_at_least(max(n_pad, kmax)))

    if sort_rows == "auto":
        sort_rows = bool(kmax > 1.25 * max(counts.mean(), 1.0) + 2)
    if sort_rows:
        order = np.argsort(-counts2, axis=1, kind="stable")  # [ndev, rps]
        if np.array_equal(order, np.tile(np.arange(rps), (ndev, 1))):
            sort_rows = False
    if not sort_rows:
        order = np.tile(np.arange(rps), (ndev, 1))
    rank = np.empty_like(order)
    np.put_along_axis(rank, order, np.tile(np.arange(rps), (ndev, 1)), axis=1)
    sorted_counts = np.take_along_axis(counts2, order, axis=1)

    chunks = _common_chunk_schedule(sorted_counts, m)
    B = len(chunks)
    chunk_of = np.empty(rps, dtype=np.int64)
    slot0_of = np.empty(rps, dtype=np.int64)
    p0 = 0
    for b, (rows_c, k_c) in enumerate(chunks):
        chunk_of[p0 : p0 + rows_c] = b
        slot0_of[p0 : p0 + rows_c] = np.arange(rows_c) * k_c
        p0 += rows_c

    if dtype == "df64":
        dvals = df.split_f64_np(data)
    else:
        dvals = data.astype({"f32": np.float32, "f64": np.float64}[dtype])

    rows_rep = np.repeat(np.arange(n), np.diff(indptr))
    slot_in_row = np.arange(len(indices)) - np.repeat(
        indptr[:-1], np.diff(indptr)
    )
    d_e = rows_rep // rps
    p_e = rank[d_e, rows_rep % rps]
    b_e = chunk_of[p_e]
    t_e = slot0_of[p_e] + slot_in_row

    base = np.tile(np.arange(m, dtype=np.int64) % n_pad, (ndev * B, 1))
    base[d_e * B + b_e, t_e] = indices
    vals = np.zeros((ndev, B, m) + dvals.shape[1:], dtype=dvals.dtype)
    vals[d_e, b_e, t_e] = dvals
    return dict(
        rps=rps, n_pad=n_pad, m=m, sort_rows=sort_rows, rank=rank,
        chunks=chunks, base=base, vals=vals,
    )


@dataclasses.dataclass
class DistRoutedPlan:
    mesh: Mesh
    axis: str
    masks: jax.Array  # [ndev, B, P, R, 128] int8, sharded on axis
    vals: jax.Array  # [ndev, B, m] (or [..., 2]), sharded on axis
    inv_perm: Optional[jax.Array]  # [ndev, rps] int32 or None (no sort)
    kinds: Tuple[str, ...]
    dists: Tuple[int, ...]
    chunks: Tuple[Tuple[int, int], ...]
    shape: Tuple[int, int]
    n_pad: int
    m: int
    rps: int
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
        sort_rows="auto",
    ) -> "DistRoutedPlan":
        ndev = mesh.shape[axis]
        pk = _pack_shard_chunks(
            indptr, indices, data, shape, ndev, dtype=dtype, m_floor=1024,
            sort_rows=sort_rows,
        )
        rps, n_pad, m = pk["rps"], pk["n_pad"], pk["m"]
        sort_rows, rank = pk["sort_rows"], pk["rank"]
        chunks, base, vals = pk["chunks"], pk["base"], pk["vals"]
        B = len(chunks)

        # single-table per-shard nets: the monotone schedule applies (the
        # batched build shares one canonical stage list across shards);
        # LILAC_NET_MODE=benes remains the escape hatch / A-B lever
        from lilac_tpu.config import cfg as _cfg

        net = rn.build_gather_network(
            base, n_pad, m, drop_empty=False, mode=_cfg().net_mode
        )
        masks = rd.masks_device(net)  # [ndev*B, P, R, 128]
        masks = masks.reshape((ndev, B) + masks.shape[1:])

        msh = NamedSharding(mesh, P(axis, *(None,) * 4))
        vsh = NamedSharding(mesh, P(axis, *(None,) * (vals.ndim - 1)))
        inv = None
        if sort_rows:
            inv = jax.device_put(
                jnp.asarray(rank, dtype=jnp.int32),
                NamedSharding(mesh, P(axis, None)),
            )
        return DistRoutedPlan(
            mesh=mesh,
            axis=axis,
            masks=jax.device_put(masks, msh),
            vals=jax.device_put(jnp.asarray(vals), vsh),
            inv_perm=inv,
            kinds=net.kinds,
            dists=net.dists,
            chunks=chunks,
            shape=tuple(shape),
            n_pad=n_pad,
            m=m,
            rps=rps,
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
        B = len(self.chunks)
        outs = rd.routed_apply(pads, masks_local, self.kinds, self.dists)
        return [o.reshape(B, self.m) for o in outs]

    def local_matvec(self, A_local, x_local):
        if self.inv_perm is None:
            masks, vals = A_local
            inv = None
        else:
            masks, vals, inv_a = A_local
            inv = inv_a[0]
        if self.dtype == "df64":
            x_full = df.DF(
                jax.lax.all_gather(x_local.hi, self.axis, tiled=True),
                jax.lax.all_gather(x_local.lo, self.axis, tiled=True),
            )
            g = self._route(masks[0], (x_full.hi, x_full.lo))
        else:
            x_full = jax.lax.all_gather(x_local, self.axis, tiled=True)
            g = self._route(masks[0], (x_full,))
        return _finish_routed_matvec(self, g, vals[0], inv)

    def alg(self) -> DistAlg:
        return DistAlg(get_algebra(self.dtype), self.axis)

    @property
    def a_specs(self):
        ax = self.axis
        specs = [P(ax, *(None,) * 4), P(ax, *(None,) * (self.vals.ndim - 1))]
        if self.inv_perm is not None:
            specs.append(P(ax, None))
        return tuple(specs)

    def vspec(self):
        return P(self.axis)

    @property
    def a_arrays(self):
        if self.inv_perm is not None:
            return (self.masks, self.vals, self.inv_perm)
        return (self.masks, self.vals)


def _finish_routed_matvec(plan, g_planes, vals, inv):
    """Shared tail: slot-ordered values x routed gather -> per-chunk
    K-axis reduce -> optional un-permute. g_planes: [B, m] per value
    plane; vals: the shard's [B, m(,2)] block."""
    if plan.dtype == "df64":
        gh, gl = g_planes
        a = df.DF(vals[..., 0], vals[..., 1])
        prod = df.mul(a, df.DF(gh, gl))
        his, los = [], []
        for c, (rows_c, k_c) in enumerate(plan.chunks):
            t = df.sum_df(
                df.DF(
                    prod.hi[c, : rows_c * k_c].reshape(rows_c, k_c),
                    prod.lo[c, : rows_c * k_c].reshape(rows_c, k_c),
                ),
                axis=1,
            )
            his.append(t.hi)
            los.append(t.lo)
        hi, lo = jnp.concatenate(his), jnp.concatenate(los)
        if inv is not None:
            pair = jnp.stack([hi, lo], axis=-1)[inv]
            return df.DF(pair[..., 0], pair[..., 1])
        return df.DF(hi, lo)
    (g,) = g_planes
    y = _chunk_reduce(vals * g, plan.chunks, plan.m)
    if inv is not None:
        from lilac_tpu.kernels.xla import pair_gather

        y = pair_gather(y, inv)
    return y


@dataclasses.dataclass
class DistRoutedHierPlan:
    """Per-shard HIERARCHICAL routing networks inside shard_map.

    DistRoutedPlan's networks keep the whole [m] table VMEM-resident per
    Pallas program, which caps each shard's table at ~2^18 slots. This
    plan lifts that cap the same way the single-chip RoutedMatHier does
    (kernels/routed_spmv.py): stage distances below `bl` run as
    VMEM-resident inner passes, distances above as butterfly/window/
    bigshift passes streaming HBM once each.

    shard_map uniformity: for each net index b the ndev shards' networks
    are built in ONE batched build_gather_network call (canonical
    (kinds, dists) with drop_empty=False), so compile_hier emits the
    same static pass structure on every shard and the only per-shard
    state is the per-pass mask arrays, stacked [ndev, ...] and sharded
    on the mesh axis.
    """

    mesh: Mesh
    axis: str
    flat_masks: Tuple[jax.Array, ...]  # all pass masks, each [ndev, ...]
    net_meta: Tuple[tuple, ...]  # per net: static pass meta tuples
    vals: jax.Array  # [ndev, B, m] (or [..., 2])
    inv_perm: Optional[jax.Array]  # [ndev, rps] or None
    chunks: Tuple[Tuple[int, int], ...]
    shape: Tuple[int, int]
    n_pad: int
    m: int
    rps: int
    bl: int
    dtype: str

    @staticmethod
    def build(
        indptr, indices, data, shape, mesh, *,
        dtype: str = "f32", axis: str = "x", bl: int = 1 << 16,
    ) -> "DistRoutedHierPlan":
        ndev = mesh.shape[axis]
        pk = _pack_shard_chunks(
            indptr, indices, data, shape, ndev, dtype=dtype, m_floor=2 * bl,
            sort_rows=True,
        )
        rps, n_pad, m = pk["rps"], pk["n_pad"], pk["m"]
        sort_rows, rank = pk["sort_rows"], pk["rank"]
        chunks, base, vals = pk["chunks"], pk["base"], pk["vals"]
        B = len(chunks)

        gmax = rd.hier_gmax(bl, 2 if dtype == "df64" else 1)
        flat_masks, net_meta = [], []
        mask_sh = lambda a: NamedSharding(  # noqa: E731
            mesh, P(axis, *(None,) * (a.ndim - 1))
        )
        for b in range(B):
            # one batched build across shards -> canonical (kinds, dists)
            net_b = rn.build_gather_network(
                base[b::B], n_pad, m, drop_empty=False
            )
            per_dev = [
                rd.compile_hier(
                    net_b.kinds, net_b.dists,
                    np.asarray(net_b.masks[:, d, :]), bl, gmax=gmax,
                )
                for d in range(ndev)
            ]
            meta_b = tuple(p[:-1] for p in per_dev[0])
            for pd in per_dev[1:]:
                assert tuple(p[:-1] for p in pd) == meta_b, (
                    "hier pass schedule diverged across shards"
                )
            net_meta.append(meta_b)
            for j in range(len(meta_b)):
                stacked = jnp.stack([pd[j][-1] for pd in per_dev])
                flat_masks.append(jax.device_put(stacked, mask_sh(stacked)))

        msh = NamedSharding(mesh, P(axis, *(None,) * (vals.ndim - 1)))
        inv = None
        if sort_rows:
            inv = jax.device_put(
                jnp.asarray(rank, dtype=jnp.int32),
                NamedSharding(mesh, P(axis, None)),
            )
        return DistRoutedHierPlan(
            mesh=mesh, axis=axis,
            flat_masks=tuple(flat_masks), net_meta=tuple(net_meta),
            vals=jax.device_put(jnp.asarray(vals), msh), inv_perm=inv,
            chunks=chunks, shape=tuple(shape), n_pad=n_pad, m=m, rps=rps,
            bl=bl, dtype=dtype,
        )

    vec_in = DistRoutedPlan.vec_in
    vec_out = DistRoutedPlan.vec_out

    def _route(self, masks_local, planes):
        pads = [
            jnp.pad(p, (0, self.m - p.shape[0])).reshape(self.m // 128, 128)
            for p in planes
        ]
        per_plane = [[] for _ in planes]
        off = 0
        for meta_b in self.net_meta:
            passes = [
                meta_b[j] + (masks_local[off + j][0],)
                for j in range(len(meta_b))
            ]
            outs = rd.hier_apply(pads, passes, self.bl)
            for i, o in enumerate(outs):
                per_plane[i].append(o.reshape(self.m))
            off += len(meta_b)
        return [jnp.stack(o) for o in per_plane]  # [B, m] per plane

    def local_matvec(self, A_local, x_local):
        vals = A_local[0]
        if self.inv_perm is None:
            inv, masks = None, A_local[1:]
        else:
            inv, masks = A_local[1][0], A_local[2:]
        if self.dtype == "df64":
            x_full = df.DF(
                jax.lax.all_gather(x_local.hi, self.axis, tiled=True),
                jax.lax.all_gather(x_local.lo, self.axis, tiled=True),
            )
            g = self._route(masks, (x_full.hi, x_full.lo))
        else:
            x_full = jax.lax.all_gather(x_local, self.axis, tiled=True)
            g = self._route(masks, (x_full,))
        return _finish_routed_matvec(self, g, vals[0], inv)

    def alg(self) -> DistAlg:
        return DistAlg(get_algebra(self.dtype), self.axis)

    @property
    def a_specs(self):
        ax = self.axis
        specs = [P(ax, *(None,) * (self.vals.ndim - 1))]
        if self.inv_perm is not None:
            specs.append(P(ax, None))
        specs += [P(ax, *(None,) * (mk.ndim - 1)) for mk in self.flat_masks]
        return tuple(specs)

    @property
    def a_arrays(self):
        base = (self.vals,)
        if self.inv_perm is not None:
            base = base + (self.inv_perm,)
        return base + self.flat_masks

    def vspec(self):
        return P(self.axis)


# ---------------------------------------------------------------------------
# halo exchange x routed gather
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HaloRoutedPlan:
    """Ring halo exchange feeding per-shard routing networks.

    The network input table is [local rps | ghosts (ndev-1)*H] — for
    column-local matrices (stencils) this is far smaller than the
    all-gathered x, so the Benes networks are shallower AND the ICI
    traffic is the thin halo instead of the whole vector. Built on the
    halo index machinery of parallel/halo.py with the common-schedule
    chunked networks of DistRoutedPlan.
    """

    mesh: Mesh
    axis: str
    masks: jax.Array  # [ndev, B, P, R, 128]
    vals: jax.Array  # [ndev, B, m]
    send_tbls: Tuple[jax.Array, ...]  # per kept ring distance [ndev, H_k]
    dist_ks: Tuple[int, ...]
    halos: Tuple[int, ...]
    kinds: Tuple[str, ...]
    dists: Tuple[int, ...]
    chunks: Tuple[Tuple[int, int], ...]
    shape: Tuple[int, int]
    n_pad: int
    m: int
    rps: int
    dtype: str

    @property
    def total_ghost(self) -> int:
        return sum(self.halos)

    @staticmethod
    def build(indptr, indices, data, shape, mesh, *, dtype="f32", axis="x"):
        from lilac_tpu.parallel.halo import HaloSpmvPlan

        ndev = mesh.shape[axis]
        n = shape[0]
        # reuse the halo plan's send tables + [local|ghost] ELL remap
        hp = HaloSpmvPlan.build(
            indptr, indices, data, shape, mesh,
            dtype="f64" if dtype in ("f64", "df64") else "f32", axis=axis,
        )
        rps = hp.rps
        T = rps + hp.total_ghost  # per-shard table length
        ec = np.asarray(hp.indices, dtype=np.int64)  # [ndev, rps, K]
        ev64 = np.asarray(hp.data, dtype=np.float64)
        K = ec.shape[2]
        m = max(1024, _pow2_at_least(max(T, K)))

        if dtype == "df64":
            dvals = df.split_f64_np(ev64.reshape(-1)).reshape(ndev, rps, K, 2)
        else:
            dvals = ev64.astype({"f32": np.float32, "f64": np.float64}[dtype])

        counts = np.full((ndev, rps), K, dtype=np.int64)  # ELL-uniform
        chunks = _common_chunk_schedule(counts, m)
        B = len(chunks)
        base = np.tile(np.arange(m, dtype=np.int64) % T, (ndev * B, 1))
        vals = np.zeros(
            (ndev, B, m) + (dvals.shape[3:] if dvals.ndim > 3 else ()),
            dtype=dvals.dtype,
        )
        p0 = 0
        for b, (rows_c, k_c) in enumerate(chunks):
            seg_i = ec[:, p0 : p0 + rows_c, :]  # [ndev, rows_c, K]
            seg_v = dvals[:, p0 : p0 + rows_c]
            base[b :: B, : rows_c * k_c] = seg_i.reshape(ndev, rows_c * K)
            vals[:, b, : rows_c * k_c] = seg_v.reshape(
                (ndev, rows_c * K) + seg_v.shape[3:]
            )
            p0 += rows_c
        # base[b::B] rows are indices d*B+b, so base is ALREADY laid out
        # d-major (net of shard d, chunk b, at row d*B+b) — matching the
        # masks reshape below. (A former transpose here re-ordered rows as
        # if b-major, scrambling every shard's networks whenever B > 1;
        # caught by the B=2 oracle regression test.)

        from lilac_tpu.config import cfg as _cfg

        net = rn.build_gather_network(
            base, T, m, drop_empty=False, mode=_cfg().net_mode
        )
        masks = rd.masks_device(net)
        masks = masks.reshape((ndev, B) + masks.shape[1:])

        msh = NamedSharding(mesh, P(axis, *(None,) * 4))
        vsh = NamedSharding(mesh, P(axis, *(None,) * (vals.ndim - 1)))
        return HaloRoutedPlan(
            mesh=mesh,
            axis=axis,
            masks=jax.device_put(masks, msh),
            vals=jax.device_put(jnp.asarray(vals), vsh),
            send_tbls=hp.send_tbls,
            dist_ks=hp.dist_ks,
            halos=hp.halos,
            kinds=net.kinds,
            dists=net.dists,
            chunks=chunks,
            shape=tuple(shape),
            n_pad=hp.n_pad,
            m=m,
            rps=rps,
            dtype=dtype,
        )

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

    def _ghost_concat(self, x_local, sends):
        from lilac_tpu.parallel.halo import HaloSpmvPlan

        return HaloSpmvPlan.ghost_concat(self, x_local, sends)

    def _route(self, masks_local, planes):
        pads = [
            jnp.pad(p, (0, self.m - p.shape[0])).reshape(self.m // 128, 128)
            for p in planes
        ]
        B = len(self.chunks)
        outs = rd.routed_apply(pads, masks_local, self.kinds, self.dists)
        return [o.reshape(B, self.m) for o in outs]

    def local_matvec(self, A_local, x_local):
        masks, vals, sends = A_local[0], A_local[1], A_local[2:]
        if self.dtype == "df64":
            xh = self._ghost_concat(x_local.hi, sends)
            xl = self._ghost_concat(x_local.lo, sends)
            g = self._route(masks[0], (xh, xl))
        else:
            x_ext = self._ghost_concat(x_local, sends)
            g = self._route(masks[0], (x_ext,))
        return _finish_routed_matvec(self, g, vals[0], None)

    def alg(self) -> DistAlg:
        return DistAlg(get_algebra(self.dtype), self.axis)

    @property
    def a_specs(self):
        ax = self.axis
        return (
            P(ax, *(None,) * 4),
            P(ax, *(None,) * (self.vals.ndim - 1)),
        ) + tuple(P(ax, None) for _ in self.send_tbls)

    @property
    def a_arrays(self):
        return (self.masks, self.vals) + self.send_tbls

    def vspec(self):
        return P(self.axis)
