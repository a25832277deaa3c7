"""Device applier for plan-time gather routing networks (Pallas).

Applies the stage schedule built by kernels/routenet.py entirely inside
VMEM: the network's working set (one [m] = [R, 128] block per value plane)
stays on-chip for all S stages; switch masks stream from HBM with a
double-buffered async DMA, one [R, 128] int8 plane per stage, overlapped
with the previous stage's compute. Measured stage cost ~0.0045 ns/elem
(masked roll+select, v5e) vs 1.4-5.3 ns/elem for XLA's gather engine —
the whole point of routing gathers through static networks.

Grid: one program per network (B networks share one input table x, e.g.
all row-chunks of one column segment in a routed SpMV).

Stage primitive (same semantics as routenet.GatherPlanHost.apply_host):
    xor  d: y[i] <- mask[i] ? y[i ^ d] : y[i]
    shift d: y[i] <- mask[i] ? y[i - d] : y[i]   (cyclic)
realized with lane rolls (d < 128) / sublane rolls (d >= 128) + selects.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Mosaic's default scoped-VMEM guard is 16 MB — below what forced hier
# configs legitimately use (g=3 at bl=2^16 df64 streams ~18 MB of
# double-buffered blocks; observed compile failure 2026-08-19:
# 'exceeded scoped vmem limit by 268.0K'). Every routed pallas_call
# raises its own limit; v5e VMEM is 128 MB, so 100 MB leaves headroom
# for XLA's own scratch.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024


def _stage_partner(y, kind: str, d: int, R: int, rowid, laneid):
    """partner values for one stage on a [R, 128] plane."""
    if kind == "xor":
        if d >= 128:
            dr = d // 128
            up = pltpu.roll(y, R - dr, 0)
            down = pltpu.roll(y, dr, 0)
            return jnp.where((rowid & dr) == 0, up, down)
        up = pltpu.roll(y, 128 - d, 1)
        down = pltpu.roll(y, d, 1)
        return jnp.where((laneid & d) == 0, up, down)
    if kind == "shiftl":
        # flat source i + d (cyclic): mirror of shift
        if d >= 128:
            return pltpu.roll(y, R - d // 128, 0)
        a = pltpu.roll(y, 128 - d, 1)
        b = pltpu.roll(a, R - 1, 0)
        return jnp.where(laneid < 128 - d, a, b)
    # shift: flat source i - d (cyclic over the whole [R*128] plane)
    if d >= 128:
        return pltpu.roll(y, d // 128, 0)
    a = pltpu.roll(y, d, 1)
    b = pltpu.roll(a, 1, 0)
    return jnp.where(laneid >= d, a, b)


def _routed_kernel(kinds, dists, R, nplanes, *refs):
    # refs: x_planes..., masks_hbm, out_planes..., scratch, sems
    x_refs = refs[:nplanes]
    masks_hbm = refs[nplanes]
    out_refs = refs[nplanes + 1 : nplanes + 1 + nplanes]
    scratch = refs[-2]
    sems = refs[-1]
    S = len(kinds)
    P = (S + 7) // 8  # 8 stages bit-packed per int8 mask plane
    b = pl.program_id(0)

    rowid = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    laneid = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    def mask_dma(slot, p):
        return pltpu.make_async_copy(
            masks_hbm.at[b, p], scratch.at[slot], sems.at[slot]
        )

    # shared-table specs give (R, 128) refs, per-block sliced specs give
    # (1, R, 128) — normalize after load
    planes = [r[:].reshape(R, 128) for r in x_refs]
    if S:
        mask_dma(0, 0).start()
    plane_bits = None
    for s in range(S):
        p, bit = divmod(s, 8)
        if bit == 0:
            if p + 1 < P:
                mask_dma((p + 1) % 2, p + 1).start()
            mask_dma(p % 2, p).wait()
            plane_bits = scratch[p % 2].astype(jnp.int32)
        mask = ((plane_bits >> bit) & 1) != 0
        kind, d = kinds[s], dists[s]
        planes = [
            jnp.where(mask, _stage_partner(y, kind, d, R, rowid, laneid), y)
            for y in planes
        ]
    for o, y in zip(out_refs, planes):
        # [B, R, 128]-blocked out refs slice to (1, R, 128); per-block
        # (R, 128) refs write directly — one kernel serves both callers
        if len(o.shape) == 3:
            o[0] = y
        else:
            o[:] = y


def routed_apply(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    kinds: Tuple[str, ...],
    dists: Tuple[int, ...],
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Run B gather networks over shared input planes.

    x_planes: one or more [R, 128] value planes (e.g. (hi, lo) for df64),
              all routed through identical switches.
    masks:    [B, ceil(S/8), R, 128] int8 BIT-PACKED switch masks (HBM):
              bit (s % 8) of plane s // 8 is stage s's mask. Packing 8
              stages per plane cuts the per-stage mask DMA 8x — the
              dominant cost of the unpacked kernel — at 2 VPU ops to
              unpack (no relayout: planes share the [R, 128] shape).
    returns:  tuple of [B, R, 128] routed planes.
    """
    B, P, R, _ = masks.shape
    S = len(kinds)
    assert P == (S + 7) // 8 and S == len(dists)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True  # tests / CPU fallback: no Mosaic lowering
    nplanes = len(x_planes)
    dtype = x_planes[0].dtype
    kern = functools.partial(_routed_kernel, tuple(kinds), tuple(dists), R, nplanes)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, R, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=[
            pl.BlockSpec((R, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(nplanes)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(nplanes)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


_INV_KIND = {"shift": "shiftl", "shiftl": "shift", "xor": "xor"}


def _adj_two_sum(a, b):
    """Knuth TwoSum, barrier-free: exactly rounded inside Mosaic (no HLO
    algebraic simplifier there — proven on chip by tools/eft_mosaic_check)
    and in interpret mode (the Pallas interpreter evaluates primitives
    individually, so no fusion-level FMA contraction either)."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _stage_adj(planes, mask, kind, d, R, rowid, laneid, dfpair):
    """Adjoint of one forward stage `y' = where(m, partner_kind_d(y), y)`.

    xor stages are consistent exchanges (a self-inverse permutation): the
    adjoint IS the forward stage. shift/shiftl stages copy with fan-out;
    their adjoint is the add-merge

        u' = (1 - m) * u + partner_inv(m * u)

    with partner_inv swapping shift<->shiftl. When dfpair, planes are one
    (hi, lo) df64 pair and every merge is a compensated TwoSum add so the
    transpose product keeps f64-grade accuracy."""
    if kind == "xor":
        return [
            jnp.where(mask, _stage_partner(y, kind, d, R, rowid, laneid), y)
            for y in planes
        ]
    inv = _INV_KIND[kind]
    zero = jnp.zeros((R, 128), planes[0].dtype)
    kept = [jnp.where(mask, zero, y) for y in planes]
    moved = [
        _stage_partner(jnp.where(mask, y, zero), inv, d, R, rowid, laneid)
        for y in planes
    ]
    if dfpair and len(planes) == 2:
        s, e = _adj_two_sum(kept[0], moved[0])
        low = e + (kept[1] + moved[1])
        hi = s + low
        lo = low - (hi - s)  # quick_two_sum renormalization
        return [hi, lo]
    return [k + mv for k, mv in zip(kept, moved)]


def _routed_kernel_t(kinds, dists, R, nplanes, dfpair, *refs):
    """Adjoint (scatter-add) of _routed_kernel: runs the SAME bit-packed
    masks in REVERSE stage order with each stage's adjoint update (see
    _stage_adj). An input feeding several outputs — a broadcast — becomes
    an ADD of their cotangents, which is exactly what the add-merge
    computes."""
    x_refs = refs[:nplanes]
    masks_hbm = refs[nplanes]
    out_refs = refs[nplanes + 1 : nplanes + 1 + nplanes]
    scratch = refs[-2]
    sems = refs[-1]
    S = len(kinds)
    b = pl.program_id(0)

    rowid = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    laneid = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    def mask_dma(slot, p):
        return pltpu.make_async_copy(
            masks_hbm.at[b, p], scratch.at[slot], sems.at[slot]
        )

    planes = [r[:].reshape(R, 128) for r in x_refs]
    first_p = (S - 1) // 8
    if S:
        mask_dma(first_p % 2, first_p).start()
    plane_bits = None
    for s in range(S - 1, -1, -1):
        p, bit = divmod(s, 8)
        if s == S - 1 or bit == 7:
            if p - 1 >= 0:
                mask_dma((p - 1) % 2, p - 1).start()
            mask_dma(p % 2, p).wait()
            plane_bits = scratch[p % 2].astype(jnp.int32)
        mask = ((plane_bits >> bit) & 1) != 0
        planes = _stage_adj(
            planes, mask, kinds[s], dists[s], R, rowid, laneid, dfpair
        )
    for o, y in zip(out_refs, planes):
        if len(o.shape) == 3:
            o[0] = y
        else:
            o[:] = y


def routed_apply_t(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    kinds: Tuple[str, ...],
    dists: Tuple[int, ...],
    *,
    dfpair: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Adjoint of routed_apply: y = G^T u for the same switch masks.

    x_planes are per-NET [B, R, 128] cotangent planes (the forward's
    output space); returns [B, R, 128] planes in the forward's input
    space. Shares the masks with the forward — the transpose costs ZERO
    extra plan bytes (the reference keeps a second CSC copy per matrix
    for A^T products, e.g. SparseBench's BiCG; here the network IS its
    own adjoint machine). dfpair: planes are one (hi, lo) df64 pair and
    merges are compensated."""
    B, P, R, _ = masks.shape
    S = len(kinds)
    assert P == (S + 7) // 8 and S == len(dists)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    nplanes = len(x_planes)
    dtype = x_planes[0].dtype
    kern = functools.partial(
        _routed_kernel_t, tuple(kinds), tuple(dists), R, nplanes, dfpair
    )
    out = pl.pallas_call(
        kern,
        grid=(B,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, R, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=[
            pl.BlockSpec(
                (1, R, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
            for _ in range(nplanes)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(
                (1, R, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
            for _ in range(nplanes)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


def masks_device(net) -> jax.Array:
    """Host masks [S, B, m] bool -> device bit-packed [B, P, R, 128] int8
    (bit s%8 of plane s//8 = stage s; see routed_apply)."""
    S, B, m = net.masks.shape
    R = m // 128
    assert R * 128 == m and R % 8 == 0, "network size must be a multiple of 1024"
    P = (S + 7) // 8
    packed = np.zeros((B, P, R, 128), dtype=np.uint8)
    mk = net.masks.transpose(1, 0, 2).reshape(B, S, R, 128)
    for s in range(S):
        packed[:, s // 8] |= mk[:, s].astype(np.uint8) << (s % 8)
    return jnp.asarray(packed.view(np.int8))


# ---------------------------------------------------------------------------
# hierarchical passes: networks larger than one VMEM block
# ---------------------------------------------------------------------------
#
# A gather network on m > BL elements splits by stage distance:
#   d <  BL, XOR  -> block-local: inner pass (grid step routes one block of
#                    the planes entirely in VMEM — the bulk of the depth)
#   d >= BL, XOR  -> butterfly pass: the 2^g blocks whose indices differ in
#                    the g stage bits exchange elementwise per group
#   shift (bcast) -> window pass: block + left neighbor loaded, shift
#                    stages with cumulative span < BL fused in one pass;
#                    block-aligned longer shifts get their own pass
#
# All passes load inputs through BlockSpecs so Mosaic double-buffers the
# HBM streams. A butterfly pass writes its 2^g member blocks CONTIGUOUSLY
# (group-major): the physical block order leaves the pass scrambled, and
# the NEXT pass's index maps read through the tracked `layout` (logical
# block -> physical block) — block relayout costs nothing. Inner, window
# and bigshift passes write natural order (they restore the layout).


def _identity_bitmap(nbits):
    return tuple(range(nbits))


def _phys_expr(idx, bitmap):
    """Physical block index of logical `idx` (traced or int) under a block
    bit-permutation layout: physical bit k sources logical bit bitmap[k].
    Pure arithmetic — safe inside BlockSpec index maps."""
    out = 0
    for k, srcbit in enumerate(bitmap):
        out = out + ((idx // (1 << srcbit)) % 2) * (1 << k)
    return out


def routed_apply_sliced(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    kinds: Tuple[str, ...],
    dists: Tuple[int, ...],
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Inner pass: grid step b routes logical block b (physical block
    _phys_expr(b, layout)) of each [mrows, 128] plane; writes natural
    order. masks [nblocks, P, R, 128] bit-packed (logical block order).
    `layout` is a block-index bit-permutation (see _phys_expr)."""
    nblocks, P, R, _ = masks.shape
    S = len(kinds)
    assert P == (S + 7) // 8 and S == len(dists)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))
    nplanes = len(x_planes)
    dtype = x_planes[0].dtype
    mrows = x_planes[0].shape[0]

    kern = functools.partial(
        _routed_kernel, tuple(kinds), tuple(dists), R, nplanes
    )

    def in_map(b):
        return (_phys_expr(b, layout), 0)

    out = pl.pallas_call(
        kern,
        grid=(nblocks,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=[
            pl.BlockSpec((R, 128), in_map, memory_space=pltpu.VMEM)
            for _ in range(nplanes)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec((R, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
            for _ in range(nplanes)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


def butterfly_apply(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    block_bits: Tuple[int, ...],
    bl: int,
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
):
    """g fused XOR stages at distances bl * 2^block_bits[k], k in stage
    order. Reads logical blocks through `layout`; writes each group's 2^g
    member blocks contiguously (group-major). Returns (planes, new_layout).

    masks: [ngroups, G*R, 128] int8, bit k = stage k, member-major rows
    (logical grouping, independent of physical layout).
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    g = len(block_bits)
    G = 1 << g
    nplanes = len(x_planes)
    R = bl // 128
    mrows = x_planes[0].shape[0]
    nblocks = mrows // R
    nbits = int(np.log2(nblocks))
    ngroups = nblocks // G
    dtype = x_planes[0].dtype
    if layout is None:
        layout = _identity_bitmap(nbits)

    rest = [b for b in range(nbits) if b not in block_bits]

    def logical_bid_expr(gid, s):
        bid = 0
        for i, b in enumerate(rest):
            bid = bid + ((gid // (1 << i)) % 2) * (1 << b)
        for k, b in enumerate(block_bits):
            bid = bid + ((s >> k) & 1) * (1 << b)
        return bid

    # after the pass: physical = gid * G + s, i.e. low bits <- block_bits,
    # high bits <- rest (a pure bit permutation of the logical index)
    new_layout = tuple(block_bits) + tuple(rest)

    def kern(*refs):
        xs = refs[: nplanes * G]
        mref = refs[nplanes * G]
        outs = refs[nplanes * G + 1 :]
        cur = [[xs[p * G + s][:] for s in range(G)] for p in range(nplanes)]
        mbits = mref[0].astype(jnp.int32)
        for k in range(g):
            new = [[None] * G for _ in range(nplanes)]
            for s in range(G):
                partner = s ^ (1 << k)
                msk = ((mbits[s * R : (s + 1) * R, :] >> k) & 1) != 0
                for p in range(nplanes):
                    new[p][s] = jnp.where(msk, cur[p][partner], cur[p][s])
            cur = new
        for p in range(nplanes):
            for s in range(G):
                outs[p][s * R : (s + 1) * R, :] = cur[p][s]

    in_specs = []
    for _ in range(nplanes):
        for s in range(G):
            in_specs.append(
                pl.BlockSpec(
                    (R, 128),
                    (lambda gid, s=s: (
                        _phys_expr(logical_bid_expr(gid, s), layout), 0)),
                    memory_space=pltpu.VMEM,
                )
            )
    in_specs.append(
        pl.BlockSpec(
            (1, G * R, 128), lambda gid: (gid, 0, 0), memory_space=pltpu.VMEM
        )
    )
    out = pl.pallas_call(
        kern,
        grid=(ngroups,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((G * R, 128), lambda gid: (gid, 0), memory_space=pltpu.VMEM)
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*[p for p in x_planes for _ in range(G)], masks)
    out = out if isinstance(out, tuple) else (out,)
    return out, new_layout


def window_shift_apply(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    dists: Tuple[int, ...],
    bl: int,
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Fused shift stages (y[i] <- y[i-d] where mask) with sum(d) < bl.

    Reads logical blocks (b-1, b) through `layout`, applies every stage
    over the 2-block window (block b's values only depend on window
    positions >= b*bl - sum(d)), writes block b naturally (restores the
    identity layout). masks [nblocks, 2R, 128] int8, bit s = stage s.
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    S = len(dists)
    nplanes = len(x_planes)
    R = bl // 128
    mrows = x_planes[0].shape[0]
    nblocks = mrows // R
    dtype = x_planes[0].dtype
    assert sum(dists) < bl and S <= 8
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))

    def kern(*refs):
        lefts = refs[:nplanes]
        selves = refs[nplanes : 2 * nplanes]
        mref = refs[2 * nplanes]
        outs = refs[2 * nplanes + 1 :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * R, 128), 1)
        mbits = mref[0].astype(jnp.int32)
        for p in range(nplanes):
            y = jnp.concatenate([lefts[p][:], selves[p][:]], axis=0)
            for s, d in enumerate(dists):
                msk = ((mbits >> s) & 1) != 0
                if d >= 128:
                    shifted = pltpu.roll(y, d // 128, 0)
                else:
                    a = pltpu.roll(y, d, 1)
                    bwrap = pltpu.roll(a, 1, 0)
                    shifted = jnp.where(lane >= d, a, bwrap)
                y = jnp.where(msk, shifted, y)
            outs[p][:] = y[R:]

    in_specs = (
        [
            pl.BlockSpec(
                (R, 128),
                (lambda b: (
                    _phys_expr((b + nblocks - 1) % nblocks, layout), 0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [
            pl.BlockSpec(
                (R, 128),
                (lambda b: (_phys_expr(b, layout), 0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [pl.BlockSpec((1, 2 * R, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    )
    out = pl.pallas_call(
        kern,
        grid=(nblocks,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((R, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, *x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


def bigshift_apply(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    d: int,
    bl: int,
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """One shift stage with d a multiple of bl: y[i] <- y[i - d] where
    mask (source = same offset in logical block b - d//bl). Writes
    natural order. masks [nblocks, R, 128] int8 (0/1)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    nplanes = len(x_planes)
    R = bl // 128
    mrows = x_planes[0].shape[0]
    nblocks = mrows // R
    dtype = x_planes[0].dtype
    db = (d // bl) % nblocks
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))

    def kern(*refs):
        srcs = refs[:nplanes]
        selves = refs[nplanes : 2 * nplanes]
        mref = refs[2 * nplanes]
        outs = refs[2 * nplanes + 1 :]
        msk = mref[0] != 0
        for p in range(nplanes):
            outs[p][:] = jnp.where(msk, srcs[p][:], selves[p][:])

    in_specs = (
        [
            pl.BlockSpec(
                (R, 128),
                (lambda b: (
                    _phys_expr((b + nblocks - db) % nblocks, layout), 0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [
            pl.BlockSpec(
                (R, 128),
                (lambda b: (_phys_expr(b, layout), 0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    )
    out = pl.pallas_call(
        kern,
        grid=(nblocks,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((R, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, *x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


# ---------------------------------------------------------------------------
# hierarchical schedule compilation + application
# ---------------------------------------------------------------------------


def hier_gmax(bl: int, nplanes: int, budget: int = 14_000_000) -> int:
    """Largest butterfly group exponent g whose pass fits VMEM: Mosaic
    double-buffers each of the 2^g in and out blocks per plane plus the
    bit-packed mask block."""
    g = 0
    while g < 3:
        G = 1 << (g + 1)
        need = G * bl * (4 * 2 * nplanes + 1) * 2
        if need > budget:
            break
        g += 1
    if g == 0:
        raise ValueError(
            f"block size bl={bl} too large for VMEM with {nplanes} planes: "
            "even a pair butterfly pass does not fit — lower LILAC_HIER_BL"
        )
    return g


def pass_vmem_bytes(p, bl: int, nplanes: int) -> int:
    """Scoped-VMEM footprint of one compiled hier pass descriptor.

    Mirrors each applier's BlockSpecs with the measured Mosaic rule that
    every BlockSpec is double-buffered (2x); esize is 4 (f32 planes).
    Used by check_vmem_feasible at plan-build/load time so an infeasible
    bl/gmax config fails on the host in milliseconds instead of as an
    on-chip Mosaic 'exceeded scoped vmem limit' after a minutes-long
    remote compile (the round-2 sb160 failure mode)."""
    kind = p[0]
    if kind == "inner":
        # routed_apply_sliced: nplanes in + nplanes out blocks + 2-slot
        # int8 mask scratch (manual DMA)
        return nplanes * bl * 4 * 2 * 2 + 2 * bl
    if kind == "butterfly":
        G = 1 << len(p[1])
        # butterfly_apply: G in + G out blocks per plane + G*R mask block
        return G * bl * (4 * 2 * nplanes + 1) * 2
    if kind == "window":
        # window_shift_apply: (left, self) in + out per plane + 2R mask
        return nplanes * bl * 4 * 3 * 2 + 2 * bl * 2
    if kind == "bigshift":
        # bigshift_apply: (src, self) in + out per plane + R mask
        return nplanes * bl * 4 * 3 * 2 + bl * 2
    raise ValueError(f"unknown pass kind {kind!r}")


def table_vmem_bytes(m: int, nplanes: int) -> int:
    """Scoped-VMEM footprint of the single-table routed kernel at table
    size m (routed_apply: whole-table in + out per plane, 2-slot mask
    scratch; double-buffered)."""
    return nplanes * m * 4 * 2 * 2 + 2 * m


def check_vmem_feasible(passes_or_m, bl: int, nplanes: int, *, what: str = "") -> None:
    """Raise at plan-build time when any pass exceeds the pallas_call
    scoped-VMEM limit this module sets (_VMEM_LIMIT_BYTES). passes_or_m:
    a compile_hier pass tuple, or an int m for a single-table plan."""
    if isinstance(passes_or_m, int):
        worst = ("table", table_vmem_bytes(passes_or_m, nplanes))
    else:
        worst = max(
            ((p[0], pass_vmem_bytes(p, bl, nplanes)) for p in passes_or_m),
            key=lambda t: t[1],
            default=("none", 0),
        )
    if worst[1] > _VMEM_LIMIT_BYTES:
        raise ValueError(
            f"routed plan {what or 'config'} is VMEM-infeasible: pass "
            f"'{worst[0]}' needs {worst[1] / 2**20:.1f} MB scoped VMEM > "
            f"{_VMEM_LIMIT_BYTES / 2**20:.0f} MB limit (v5e VMEM 128 MB). "
            "Lower LILAC_HIER_BL or LILAC_HIER_GMAX."
        )


def compile_hier(kinds, dists, masks_host, bl: int, *, gmax: int = 2):
    """Split one network's stage schedule into hierarchical passes.

    gmax must be >= 1 (flush_outer pops at least one stage per pass; a
    zero group size would spin forever).

    masks_host: [S, m] bool (one network). Returns a tuple of pass
    descriptors with device-resident mask arrays:
      ('inner', kinds, dists, masks [nblocks, P, R, 128] int8 packed)
      ('butterfly', block_bits, masks [ngroups, G*R, 128] int8 bit-packed)
      ('window', dists, masks [nblocks, 2R, 128] int8 bit-packed)
      ('bigshift', d, masks [nblocks, R, 128] int8)
    """
    S, m = masks_host.shape
    R = bl // 128
    nblocks = m // bl
    nbits = int(np.log2(nblocks))
    assert gmax >= 1
    assert nblocks * bl == m and nblocks & (nblocks - 1) == 0
    # monotone ('shiftl') schedules are single-table-only by design: their
    # shift stages cannot group into butterfly passes, so at hier scale
    # they would cost more HBM pass traffic than the Benes schedule
    assert all(k in ("xor", "shift") for k in kinds), kinds

    def flush_inner(buf, out):
        if not buf:
            return
        ks = tuple(k for k, _, _ in buf)
        ds = tuple(d for _, d, _ in buf)
        mk = np.stack([mask for _, _, mask in buf])  # [S_run, m]
        Srun = len(buf)
        P = (Srun + 7) // 8
        mk = mk.reshape(Srun, nblocks, R, 128).transpose(1, 0, 2, 3)
        packed = np.zeros((nblocks, P, R, 128), dtype=np.uint8)
        for s in range(Srun):
            packed[:, s // 8] |= mk[:, s].astype(np.uint8) << (s % 8)
        out.append(("inner", ks, ds, jnp.asarray(packed.view(np.int8))))
        buf.clear()

    def flush_outer(buf, out, gmax=gmax):
        while buf:
            grp = []
            used_bits = set()
            while buf and len(grp) < gmax:
                d, mask = buf[0]
                bit = int(np.log2(d // bl))
                if bit in used_bits:
                    break
                used_bits.add(bit)
                grp.append(buf.pop(0))
            bits = tuple(int(np.log2(d // bl)) for d, _ in grp)
            g = len(bits)
            G = 1 << g
            rest = [b for b in range(nbits) if b not in bits]
            # member-major grouped mask rows: group gid, member s
            packed = np.zeros((nblocks // G, G * R, 128), dtype=np.uint8)
            for k, (_, mask) in enumerate(grp):
                mb = mask.reshape(nblocks, R, 128).astype(np.uint8)
                for gid in range(nblocks // G):
                    for s in range(G):
                        bid = 0
                        for i, b in enumerate(rest):
                            bid |= ((gid >> i) & 1) << b
                        for kk, b in enumerate(bits):
                            bid |= ((s >> kk) & 1) << b
                        packed[gid, s * R : (s + 1) * R] |= mb[bid] << k
            out.append(("butterfly", bits, jnp.asarray(packed.view(np.int8))))

    def flush_window(buf, out):
        if not buf:
            return
        ds = tuple(d for d, _ in buf)
        assert sum(ds) < bl and len(buf) <= 8
        packed = np.zeros((nblocks, 2 * R, 128), dtype=np.uint8)
        for s, (_, mask) in enumerate(buf):
            mk = mask.reshape(nblocks, R, 128).astype(np.uint8)
            packed[:, R:] |= mk << s
            packed[1:, :R] |= mk[:-1] << s  # left-neighbor; block 0 left = 0
        out.append(("window", ds, jnp.asarray(packed.view(np.int8))))
        buf.clear()

    passes = []
    inner_buf, outer_buf, win_buf = [], [], []
    for s in range(S):
        k, d, mk = kinds[s], dists[s], masks_host[s]
        if k == "xor" and d < bl:
            flush_outer(outer_buf, passes)
            flush_window(win_buf, passes)
            inner_buf.append((k, d, mk))
        elif k == "xor":
            flush_inner(inner_buf, passes)
            flush_window(win_buf, passes)
            outer_buf.append((d, mk))
        elif d >= bl:  # block-aligned long shift (very long broadcast run)
            assert d % bl == 0
            flush_inner(inner_buf, passes)
            flush_outer(outer_buf, passes)
            flush_window(win_buf, passes)
            passes.append(
                ("bigshift", d,
                 jnp.asarray(mk.reshape(nblocks, R, 128).astype(np.int8)))
            )
        else:  # short shift, fused into a window pass
            flush_inner(inner_buf, passes)
            flush_outer(outer_buf, passes)
            if win_buf and (
                sum(x for x, _ in win_buf) + d >= bl or len(win_buf) >= 8
            ):
                flush_window(win_buf, passes)
            win_buf.append((d, mk))
    flush_inner(inner_buf, passes)
    flush_outer(outer_buf, passes)
    flush_window(win_buf, passes)
    return tuple(passes)


# ---------------------------------------------------------------------------
# net-batched hierarchical application
#
# A hierarchical SpMV applies MANY networks (33 at NPB class D) that share
# one canonical pass schedule (build_gather_network keeps drop_empty=False
# for exactly this reason) to the SAME input planes — only the mask VALUES
# differ per net. Tracing them as per-net pallas_calls put ~500 ops in one
# XLA graph per matvec: a 45-minute remote compile and ~µs-scale dispatch
# overhead 500x per matvec (round-3 class-D capture: 1086 s vs round-1's
# 98 s). The batched appliers below stack the masks on a leading net axis
# and add a net grid dimension, collapsing each pass over all nets into
# ONE pallas_call (~15 ops per matvec). Per-grid-step VMEM footprint is
# unchanged, so pass_vmem_bytes stays the feasibility model.
# ---------------------------------------------------------------------------


def _routed_kernel_b(kinds, dists, R, nplanes, *refs):
    """Net-batched inner-pass kernel: grid (nblocks, N); masks_hbm is
    [N, nblocks, P, R, 128]; per-net out (and optionally in) blocks carry
    a leading 1-dim."""
    x_refs = refs[:nplanes]
    masks_hbm = refs[nplanes]
    out_refs = refs[nplanes + 1 : nplanes + 1 + nplanes]
    scratch = refs[-2]
    sems = refs[-1]
    S = len(kinds)
    P = (S + 7) // 8
    b = pl.program_id(0)
    n = pl.program_id(1)

    rowid = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    laneid = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    def mask_dma(slot, p):
        return pltpu.make_async_copy(
            masks_hbm.at[n, b, p], scratch.at[slot], sems.at[slot]
        )

    planes = [r[:].reshape(R, 128) for r in x_refs]
    if S:
        mask_dma(0, 0).start()
    plane_bits = None
    for s in range(S):
        p, bit = divmod(s, 8)
        if bit == 0:
            if p + 1 < P:
                mask_dma((p + 1) % 2, p + 1).start()
            mask_dma(p % 2, p).wait()
            plane_bits = scratch[p % 2].astype(jnp.int32)
        mask = ((plane_bits >> bit) & 1) != 0
        kind, d = kinds[s], dists[s]
        planes = [
            jnp.where(mask, _stage_partner(y, kind, d, R, rowid, laneid), y)
            for y in planes
        ]
    for o, y in zip(out_refs, planes):
        o[0] = y


def _in_specs_b(nplanes, R, shared, idx2, idx3):
    """Per-plane input BlockSpecs: shared [mrows,128] planes read block
    idx2(b) for every net; per-net [N,mrows,128] planes read (n, idx2(b))."""
    if shared:
        return [
            pl.BlockSpec((R, 128), lambda b, n: idx2(b), memory_space=pltpu.VMEM)
            for _ in range(nplanes)
        ]
    return [
        pl.BlockSpec((1, R, 128), lambda b, n: idx3(b, n), memory_space=pltpu.VMEM)
        for _ in range(nplanes)
    ]


def routed_apply_sliced_b(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    kinds: Tuple[str, ...],
    dists: Tuple[int, ...],
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Net-batched inner pass. masks [N, nblocks, P, R, 128]; x_planes
    each [mrows, 128] (shared input) or [N, mrows, 128] (per-net).
    Returns per-net [N, mrows, 128] planes in natural block order."""
    N, nblocks, P, R, _ = masks.shape
    S = len(kinds)
    assert P == (S + 7) // 8 and S == len(dists)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))
    nplanes = len(x_planes)
    shared = x_planes[0].ndim == 2
    dtype = x_planes[0].dtype
    mrows = x_planes[0].shape[-2]

    kern = functools.partial(
        _routed_kernel_b, tuple(kinds), tuple(dists), R, nplanes
    )
    out = pl.pallas_call(
        kern,
        grid=(nblocks, N),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=_in_specs_b(
            nplanes, R, shared,
            lambda b: (_phys_expr(b, layout), 0),
            lambda b, n: (n, _phys_expr(b, layout), 0),
        )
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(
                (1, R, 128), lambda b, n: (n, b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(nplanes)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


def butterfly_apply_b(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    block_bits: Tuple[int, ...],
    bl: int,
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
):
    """Net-batched butterfly pass. masks [N, ngroups, G*R, 128]; planes
    shared [mrows, 128] or per-net [N, mrows, 128]. Returns
    (per-net planes [N, mrows, 128] group-major, new_layout)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    g = len(block_bits)
    G = 1 << g
    nplanes = len(x_planes)
    R = bl // 128
    shared = x_planes[0].ndim == 2
    mrows = x_planes[0].shape[-2]
    nblocks = mrows // R
    nbits = int(np.log2(nblocks))
    ngroups = nblocks // G
    N = masks.shape[0]
    dtype = x_planes[0].dtype
    if layout is None:
        layout = _identity_bitmap(nbits)

    rest = [b for b in range(nbits) if b not in block_bits]

    def logical_bid_expr(gid, s):
        bid = 0
        for i, b in enumerate(rest):
            bid = bid + ((gid // (1 << i)) % 2) * (1 << b)
        for k, b in enumerate(block_bits):
            bid = bid + ((s >> k) & 1) * (1 << b)
        return bid

    new_layout = tuple(block_bits) + tuple(rest)

    def kern(*refs):
        xs = refs[: nplanes * G]
        mref = refs[nplanes * G]
        outs = refs[nplanes * G + 1 :]
        cur = [
            [xs[p * G + s][:].reshape(R, 128) for s in range(G)]
            for p in range(nplanes)
        ]
        mbits = mref[0, 0].astype(jnp.int32)
        for k in range(g):
            new = [[None] * G for _ in range(nplanes)]
            for s in range(G):
                partner = s ^ (1 << k)
                msk = ((mbits[s * R : (s + 1) * R, :] >> k) & 1) != 0
                for p in range(nplanes):
                    new[p][s] = jnp.where(msk, cur[p][partner], cur[p][s])
            cur = new
        for p in range(nplanes):
            for s in range(G):
                outs[p][0, s * R : (s + 1) * R, :] = cur[p][s]

    in_specs = []
    for _ in range(nplanes):
        for s in range(G):
            if shared:
                in_specs.append(
                    pl.BlockSpec(
                        (R, 128),
                        (lambda gid, n, s=s: (
                            _phys_expr(logical_bid_expr(gid, s), layout), 0)),
                        memory_space=pltpu.VMEM,
                    )
                )
            else:
                in_specs.append(
                    pl.BlockSpec(
                        (1, R, 128),
                        (lambda gid, n, s=s: (
                            n, _phys_expr(logical_bid_expr(gid, s), layout), 0)),
                        memory_space=pltpu.VMEM,
                    )
                )
    in_specs.append(
        pl.BlockSpec(
            (1, 1, G * R, 128), lambda gid, n: (n, gid, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    out = pl.pallas_call(
        kern,
        grid=(ngroups, N),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(
                (1, G * R, 128), lambda gid, n: (n, gid, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*[p for p in x_planes for _ in range(G)], masks)
    out = out if isinstance(out, tuple) else (out,)
    return out, new_layout


def window_shift_apply_b(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    dists: Tuple[int, ...],
    bl: int,
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Net-batched window pass. masks [N, nblocks, 2R, 128]."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    S = len(dists)
    nplanes = len(x_planes)
    R = bl // 128
    shared = x_planes[0].ndim == 2
    mrows = x_planes[0].shape[-2]
    nblocks = mrows // R
    N = masks.shape[0]
    dtype = x_planes[0].dtype
    assert sum(dists) < bl and S <= 8
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))

    def kern(*refs):
        lefts = refs[:nplanes]
        selves = refs[nplanes : 2 * nplanes]
        mref = refs[2 * nplanes]
        outs = refs[2 * nplanes + 1 :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * R, 128), 1)
        mbits = mref[0, 0].astype(jnp.int32)
        for p in range(nplanes):
            y = jnp.concatenate(
                [lefts[p][:].reshape(R, 128), selves[p][:].reshape(R, 128)],
                axis=0,
            )
            for s, d in enumerate(dists):
                msk = ((mbits >> s) & 1) != 0
                if d >= 128:
                    shifted = pltpu.roll(y, d // 128, 0)
                else:
                    a = pltpu.roll(y, d, 1)
                    bwrap = pltpu.roll(a, 1, 0)
                    shifted = jnp.where(lane >= d, a, bwrap)
                y = jnp.where(msk, shifted, y)
            outs[p][0] = y[R:]

    in_specs = (
        _in_specs_b(
            nplanes, R, shared,
            lambda b: (_phys_expr((b + nblocks - 1) % nblocks, layout), 0),
            lambda b, n: (n, _phys_expr((b + nblocks - 1) % nblocks, layout), 0),
        )
        + _in_specs_b(
            nplanes, R, shared,
            lambda b: (_phys_expr(b, layout), 0),
            lambda b, n: (n, _phys_expr(b, layout), 0),
        )
        + [
            pl.BlockSpec(
                (1, 1, 2 * R, 128), lambda b, n: (n, b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    )
    out = pl.pallas_call(
        kern,
        grid=(nblocks, N),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(
                (1, R, 128), lambda b, n: (n, b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, *x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


def bigshift_apply_b(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    d: int,
    bl: int,
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Net-batched block-aligned long shift. masks [N, nblocks, R, 128]."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    nplanes = len(x_planes)
    R = bl // 128
    shared = x_planes[0].ndim == 2
    mrows = x_planes[0].shape[-2]
    nblocks = mrows // R
    N = masks.shape[0]
    dtype = x_planes[0].dtype
    db = (d // bl) % nblocks
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))

    def kern(*refs):
        srcs = refs[:nplanes]
        selves = refs[nplanes : 2 * nplanes]
        mref = refs[2 * nplanes]
        outs = refs[2 * nplanes + 1 :]
        msk = mref[0, 0] != 0
        for p in range(nplanes):
            outs[p][0] = jnp.where(
                msk, srcs[p][:].reshape(R, 128), selves[p][:].reshape(R, 128)
            )

    in_specs = (
        _in_specs_b(
            nplanes, R, shared,
            lambda b: (_phys_expr((b + nblocks - db) % nblocks, layout), 0),
            lambda b, n: (n, _phys_expr((b + nblocks - db) % nblocks, layout), 0),
        )
        + _in_specs_b(
            nplanes, R, shared,
            lambda b: (_phys_expr(b, layout), 0),
            lambda b, n: (n, _phys_expr(b, layout), 0),
        )
        + [
            pl.BlockSpec(
                (1, 1, R, 128), lambda b, n: (n, b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    )
    out = pl.pallas_call(
        kern,
        grid=(nblocks, N),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(
                (1, R, 128), lambda b, n: (n, b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, *x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


def hier_apply_batched(
    x_planes: Sequence[jax.Array],
    pass_meta,
    pass_masks,
    bl: int,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Apply one shared pass schedule to N nets at once.

    x_planes: shared [mrows, 128] planes (every net routes the same
    input). pass_meta: the static HierNet.pass_meta tuple (shared by all
    N nets); pass_masks: per pass, the N nets' masks stacked on a leading
    axis. Returns per-net [N, mrows, 128] planes. Layout tracking matches
    hier_apply exactly — schedules are identical across the batch, so one
    layout serves all nets."""
    planes = tuple(x_planes)
    R = bl // 128
    mrows = planes[0].shape[-2]
    nblocks = mrows // R
    layout = None
    for meta, mk in zip(pass_meta, pass_masks):
        if meta[0] == "inner":
            _, ks, ds = meta
            planes = routed_apply_sliced_b(
                planes, mk, ks, ds, layout=layout, interpret=interpret
            )
            layout = None
        elif meta[0] == "butterfly":
            _, bits = meta
            planes, layout = butterfly_apply_b(
                planes, mk, bits, bl, layout=layout, interpret=interpret
            )
            if tuple(layout) == tuple(range(len(layout))):
                layout = None
        elif meta[0] == "bigshift":
            _, d = meta
            planes = bigshift_apply_b(
                planes, mk, d, bl, layout=layout, interpret=interpret
            )
            layout = None
        else:
            _, ds = meta
            planes = window_shift_apply_b(
                planes, mk, ds, bl, layout=layout, interpret=interpret
            )
            layout = None
    if layout is not None:
        phys = [0] * nblocks
        for b in range(nblocks):
            p = 0
            for k, srcbit in enumerate(layout):
                p |= ((b >> srcbit) & 1) << k
            phys[b] = p
        planes = tuple(
            jnp.concatenate(
                [pp[..., phys[b] * R : (phys[b] + 1) * R, :] for b in range(nblocks)],
                axis=-2,
            )
            for pp in planes
        )
    return planes


def hier_apply(
    x_planes: Sequence[jax.Array],
    passes,
    bl: int,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Apply a compile_hier pass sequence to [m//128, 128] planes.

    Tracks the block layout across butterfly passes (which write their
    groups contiguously); inner/window/bigshift passes restore natural
    order, and a final static block relayout runs if the sequence ends
    scrambled."""
    planes = tuple(x_planes)
    R = bl // 128
    mrows = planes[0].shape[0]
    nblocks = mrows // R
    layout = None  # None == identity
    for p in passes:
        if p[0] == "inner":
            _, ks, ds, mk = p
            planes = routed_apply_sliced(
                planes, mk, ks, ds, layout=layout, interpret=interpret
            )
            layout = None
        elif p[0] == "butterfly":
            _, bits, mk = p
            planes, layout = butterfly_apply(
                planes, mk, bits, bl, layout=layout, interpret=interpret
            )
            if tuple(layout) == tuple(range(len(layout))):
                layout = None
        elif p[0] == "bigshift":
            _, d, mk = p
            planes = bigshift_apply(
                planes, mk, d, bl, layout=layout, interpret=interpret
            )
            layout = None
        else:
            _, ds, mk = p
            planes = window_shift_apply(
                planes, mk, ds, bl, layout=layout, interpret=interpret
            )
            layout = None
    if layout is not None:
        # static relayout: logical block b lives at physical _phys(b)
        phys = [0] * nblocks
        for b in range(nblocks):
            p = 0
            for k, srcbit in enumerate(layout):
                p |= ((b >> srcbit) & 1) << k
            phys[b] = p
        planes = tuple(
            jnp.concatenate(
                [pp[phys[b] * R : (phys[b] + 1) * R] for b in range(nblocks)]
            )
            for pp in planes
        )
    return planes


# ---------------------------------------------------------------------------
# hierarchical ADJOINT application (the Beneš-reverse transpose)
#
# A routed SpMV's gather network G is a static linear operator; its
# transpose G^T is realized by running the SAME pass schedule in REVERSE
# with each stage's adjoint update (_stage_adj): xor exchanges are
# self-adjoint (pure permutation), shift/shiftl copies become add-merges
# (a broadcast's adjoint is the run-SUM). The transpose product
# A^T u = G^T (vals ⊙ expand(u)) therefore costs ZERO extra plan bytes —
# the reference stages a second CSC operator per matrix for A^T products
# (SparseBench BiCG, /root/reference/SparseBench/SRC/reference/iter.f:82-85;
# the harness even substitutes A for A^T, random.f:50-88); here one plan
# serves both directions, halving hier plan HBM (the class-E enabler).
#
# Layout bookkeeping mirrors the forward exactly: each adjoint pass reads
# LOGICAL blocks through the current cotangent layout (rlayout) and writes
# natural order, except the butterfly adjoint which writes group-major
# (same new_layout formula as the forward). The forward's final static
# relayout is free in the adjoint: the natural cotangent IS the
# logical-indexed view, so the reverse sweep simply starts rlayout=None.
# ---------------------------------------------------------------------------


def _routed_kernel_bt(kinds, dists, R, nplanes, dfpair, *refs):
    """Net-batched inner-pass adjoint: grid (nblocks, N); per-net in/out
    planes; masks [N, nblocks, P, R, 128] streamed in REVERSE bit order."""
    x_refs = refs[:nplanes]
    masks_hbm = refs[nplanes]
    out_refs = refs[nplanes + 1 : nplanes + 1 + nplanes]
    scratch = refs[-2]
    sems = refs[-1]
    S = len(kinds)
    b = pl.program_id(0)
    n = pl.program_id(1)

    rowid = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    laneid = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    def mask_dma(slot, p):
        return pltpu.make_async_copy(
            masks_hbm.at[n, b, p], scratch.at[slot], sems.at[slot]
        )

    planes = [r[:].reshape(R, 128) for r in x_refs]
    first_p = (S - 1) // 8
    if S:
        mask_dma(first_p % 2, first_p).start()
    plane_bits = None
    for s in range(S - 1, -1, -1):
        p, bit = divmod(s, 8)
        if s == S - 1 or bit == 7:
            if p - 1 >= 0:
                mask_dma((p - 1) % 2, p - 1).start()
            mask_dma(p % 2, p).wait()
            plane_bits = scratch[p % 2].astype(jnp.int32)
        mask = ((plane_bits >> bit) & 1) != 0
        planes = _stage_adj(
            planes, mask, kinds[s], dists[s], R, rowid, laneid, dfpair
        )
    for o, y in zip(out_refs, planes):
        o[0] = y


def routed_apply_sliced_bt(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    kinds: Tuple[str, ...],
    dists: Tuple[int, ...],
    *,
    dfpair: bool = False,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Net-batched inner-pass adjoint. x_planes per-net [N, mrows, 128]
    cotangents read through `layout`; writes natural block order."""
    N, nblocks, P, R, _ = masks.shape
    S = len(kinds)
    assert P == (S + 7) // 8 and S == len(dists)
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))
    nplanes = len(x_planes)
    dtype = x_planes[0].dtype
    mrows = x_planes[0].shape[-2]

    kern = functools.partial(
        _routed_kernel_bt, tuple(kinds), tuple(dists), R, nplanes, dfpair
    )
    out = pl.pallas_call(
        kern,
        grid=(nblocks, N),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=[
            pl.BlockSpec(
                (1, R, 128),
                lambda b, n: (n, _phys_expr(b, layout), 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec(
                (1, R, 128), lambda b, n: (n, b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(nplanes)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, R, 128), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, masks)
    return out if isinstance(out, tuple) else (out,)


def butterfly_apply_bt(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    block_bits: Tuple[int, ...],
    bl: int,
    *,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
):
    """Net-batched butterfly adjoint: the g exchange stages applied in
    REVERSE order (each is self-adjoint). Reads logical member blocks
    through `layout`, writes group-major like the forward. Returns
    (planes [N, mrows, 128], new_layout). Pure permutation — no merges,
    so df pairs ride as two independent planes."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    g = len(block_bits)
    G = 1 << g
    nplanes = len(x_planes)
    R = bl // 128
    mrows = x_planes[0].shape[-2]
    nblocks = mrows // R
    nbits = int(np.log2(nblocks))
    ngroups = nblocks // G
    N = masks.shape[0]
    dtype = x_planes[0].dtype
    if layout is None:
        layout = _identity_bitmap(nbits)

    rest = [b for b in range(nbits) if b not in block_bits]

    def logical_bid_expr(gid, s):
        bid = 0
        for i, b in enumerate(rest):
            bid = bid + ((gid // (1 << i)) % 2) * (1 << b)
        for k, b in enumerate(block_bits):
            bid = bid + ((s >> k) & 1) * (1 << b)
        return bid

    new_layout = tuple(block_bits) + tuple(rest)

    def kern(*refs):
        xs = refs[: nplanes * G]
        mref = refs[nplanes * G]
        outs = refs[nplanes * G + 1 :]
        cur = [
            [xs[p * G + s][:].reshape(R, 128) for s in range(G)]
            for p in range(nplanes)
        ]
        mbits = mref[0, 0].astype(jnp.int32)
        for k in range(g - 1, -1, -1):  # the only difference vs forward
            new = [[None] * G for _ in range(nplanes)]
            for s in range(G):
                partner = s ^ (1 << k)
                msk = ((mbits[s * R : (s + 1) * R, :] >> k) & 1) != 0
                for p in range(nplanes):
                    new[p][s] = jnp.where(msk, cur[p][partner], cur[p][s])
            cur = new
        for p in range(nplanes):
            for s in range(G):
                outs[p][0, s * R : (s + 1) * R, :] = cur[p][s]

    in_specs = []
    for _ in range(nplanes):
        for s in range(G):
            in_specs.append(
                pl.BlockSpec(
                    (1, R, 128),
                    (lambda gid, n, s=s: (
                        n, _phys_expr(logical_bid_expr(gid, s), layout), 0)),
                    memory_space=pltpu.VMEM,
                )
            )
    in_specs.append(
        pl.BlockSpec(
            (1, 1, G * R, 128), lambda gid, n: (n, gid, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )
    out = pl.pallas_call(
        kern,
        grid=(ngroups, N),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(
                (1, G * R, 128), lambda gid, n: (n, gid, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*[p for p in x_planes for _ in range(G)], masks)
    out = out if isinstance(out, tuple) else (out,)
    return out, new_layout


def window_shift_apply_bt(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    dists: Tuple[int, ...],
    bl: int,
    *,
    dfpair: bool = False,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Net-batched window-pass adjoint: the fused shift stages applied in
    reverse order as add-merges u'[i] = (1-m[i])u[i] + m[i+d]u[i+d].
    Block b's adjoint depends on window (b, b+1) — the mirror of the
    forward's (b-1, b). Mask windows are read from the forward's packed
    array at blocks b and b+1 (self halves), no repacking."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    S = len(dists)
    nplanes = len(x_planes)
    R = bl // 128
    mrows = x_planes[0].shape[-2]
    nblocks = mrows // R
    N = masks.shape[0]
    dtype = x_planes[0].dtype
    assert sum(dists) < bl and S <= 8
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))

    def kern(*refs):
        selves = refs[:nplanes]
        rights = refs[nplanes : 2 * nplanes]
        m_self = refs[2 * nplanes]
        m_right = refs[2 * nplanes + 1]
        outs = refs[2 * nplanes + 2 :]
        rowid = jax.lax.broadcasted_iota(jnp.int32, (2 * R, 128), 0)
        laneid = jax.lax.broadcasted_iota(jnp.int32, (2 * R, 128), 1)
        # window mask = self-halves of packed blocks b and b+1
        mbits = jnp.concatenate(
            [m_self[0, 0, R:].astype(jnp.int32), m_right[0, 0, R:].astype(jnp.int32)],
            axis=0,
        )
        planes = [
            jnp.concatenate(
                [sf[:].reshape(R, 128), rg[:].reshape(R, 128)], axis=0
            )
            for sf, rg in zip(selves, rights)
        ]
        for s in range(S - 1, -1, -1):
            msk = ((mbits >> s) & 1) != 0
            planes = _stage_adj(
                planes, msk, "shift", dists[s], 2 * R, rowid, laneid, dfpair
            )
        for o, y in zip(outs, planes):
            o[0] = y[:R]

    in_specs = (
        [
            pl.BlockSpec(
                (1, R, 128),
                (lambda b, n: (n, _phys_expr(b, layout), 0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [
            pl.BlockSpec(
                (1, R, 128),
                (lambda b, n: (n, _phys_expr((b + 1) % nblocks, layout), 0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [
            pl.BlockSpec(
                (1, 1, 2 * R, 128), lambda b, n: (n, b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 2 * R, 128),
                lambda b, n: (n, (b + 1) % nblocks, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    )
    out = pl.pallas_call(
        kern,
        grid=(nblocks, N),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(
                (1, R, 128), lambda b, n: (n, b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, *x_planes, masks, masks)
    return out if isinstance(out, tuple) else (out,)


def bigshift_apply_bt(
    x_planes: Sequence[jax.Array],
    masks: jax.Array,
    d: int,
    bl: int,
    *,
    dfpair: bool = False,
    layout: Tuple[int, ...] | None = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Net-batched block-aligned long-shift adjoint:
    u'[i] = (1-m[i])u[i] + m[i+d]u[i+d] with d a multiple of bl — block b
    merges its own kept values with block b+d/bl's masked values."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    nplanes = len(x_planes)
    R = bl // 128
    mrows = x_planes[0].shape[-2]
    nblocks = mrows // R
    N = masks.shape[0]
    dtype = x_planes[0].dtype
    db = (d // bl) % nblocks
    if layout is None:
        layout = _identity_bitmap(int(np.log2(nblocks)))

    def kern(*refs):
        selves = refs[:nplanes]
        rights = refs[nplanes : 2 * nplanes]
        m_self = refs[2 * nplanes]
        m_right = refs[2 * nplanes + 1]
        outs = refs[2 * nplanes + 2 :]
        msk_s = m_self[0, 0] != 0
        msk_r = m_right[0, 0] != 0
        zero = jnp.zeros((R, 128), dtype)
        kept = [jnp.where(msk_s, zero, sf[:].reshape(R, 128)) for sf in selves]
        moved = [jnp.where(msk_r, rg[:].reshape(R, 128), zero) for rg in rights]
        if dfpair and nplanes == 2:
            s, e = _adj_two_sum(kept[0], moved[0])
            low = e + (kept[1] + moved[1])
            hi = s + low
            lo = low - (hi - s)
            res = [hi, lo]
        else:
            res = [k + mv for k, mv in zip(kept, moved)]
        for o, y in zip(outs, res):
            o[0] = y

    in_specs = (
        [
            pl.BlockSpec(
                (1, R, 128),
                (lambda b, n: (n, _phys_expr(b, layout), 0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [
            pl.BlockSpec(
                (1, R, 128),
                (lambda b, n: (n, _phys_expr((b + db) % nblocks, layout), 0)),
                memory_space=pltpu.VMEM,
            )
            for _ in range(nplanes)
        ]
        + [
            pl.BlockSpec(
                (1, 1, R, 128), lambda b, n: (n, b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, R, 128),
                lambda b, n: (n, (b + db) % nblocks, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    )
    out = pl.pallas_call(
        kern,
        grid=(nblocks, N),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, mrows, 128), dtype) for _ in range(nplanes)
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec(
                (1, R, 128), lambda b, n: (n, b, 0), memory_space=pltpu.VMEM
            )
            for _ in range(nplanes)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*x_planes, *x_planes, masks, masks)
    return out if isinstance(out, tuple) else (out,)


def hier_apply_batched_t(
    x_planes: Sequence[jax.Array],
    pass_meta,
    pass_masks,
    bl: int,
    *,
    dfpair: bool = False,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Adjoint of hier_apply_batched: run the shared pass schedule in
    REVERSE over N per-net cotangent planes [N, mrows, 128]. Returns
    per-net [N, mrows, 128] planes in the forward's input space (natural
    block order). Layout bookkeeping evolves exactly like the forward's
    but over the reversed pass sequence; the forward's final static
    relayout needs no adjoint step (the natural cotangent IS the
    logical-indexed view)."""
    planes = tuple(x_planes)
    R = bl // 128
    mrows = planes[0].shape[-2]
    nblocks = mrows // R
    rlayout = None
    for meta, mk in zip(reversed(pass_meta), reversed(pass_masks)):
        if meta[0] == "inner":
            _, ks, ds = meta
            planes = routed_apply_sliced_bt(
                planes, mk, ks, ds, dfpair=dfpair, layout=rlayout,
                interpret=interpret,
            )
            rlayout = None
        elif meta[0] == "butterfly":
            _, bits = meta
            planes, rlayout = butterfly_apply_bt(
                planes, mk, bits, bl, layout=rlayout, interpret=interpret
            )
            if tuple(rlayout) == tuple(range(len(rlayout))):
                rlayout = None
        elif meta[0] == "bigshift":
            _, d = meta
            planes = bigshift_apply_bt(
                planes, mk, d, bl, dfpair=dfpair, layout=rlayout,
                interpret=interpret,
            )
            rlayout = None
        else:
            _, ds = meta
            planes = window_shift_apply_bt(
                planes, mk, ds, bl, dfpair=dfpair, layout=rlayout,
                interpret=interpret,
            )
            rlayout = None
    if rlayout is not None:
        phys = [0] * nblocks
        for b in range(nblocks):
            p = 0
            for k, srcbit in enumerate(rlayout):
                p |= ((b >> srcbit) & 1) << k
            phys[b] = p
        planes = tuple(
            jnp.concatenate(
                [pp[..., phys[b] * R : (phys[b] + 1) * R, :] for b in range(nblocks)],
                axis=-2,
            )
            for pp in planes
        )
    return planes
