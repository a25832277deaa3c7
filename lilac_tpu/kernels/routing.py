"""Static routing networks: plan-time Beneš switch settings.

TPU has no fast arbitrary-gather primitive (XLA's gather engine runs at
~1.4-5.3ns per element — PLAN.md), but `roll`+`select` rounds execute at
~0.007ns/element/round in big blocks. A Beneš network realizes ANY
permutation of N=2^k elements in 2k-1 exchange stages whose switch
settings depend only on the permutation — known at plan-build time. This
module computes those settings (vectorized numpy, no Python-per-element
loops) and applies them as jit-compatible masked exchanges: the building
block for the round-2 routed SpMV kernel (gather = monotone expand ∘
static permutation).

Construction: the classic looping/2-coloring argument. At each recursion
level, elements pair on inputs (i, i±N/2) and outputs (π-preimages of
(j, j±N/2)); the constraint graph (each element linked to its input
partner and its output partner) is a disjoint union of even cycles;
2-coloring it assigns each element to the upper or lower subnetwork.
Coloring is computed with pointer-jumping (log N vectorized rounds).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _two_color(nbr_a: np.ndarray, nbr_b: np.ndarray) -> np.ndarray:
    """2-color the union of two perfect matchings (a disjoint union of even
    cycles): color[e] ^ color[nbr_a[e]] == 1 and color[e] ^ color[nbr_b[e]]
    == 1. Vectorized via cycle-leader election with pointer jumping."""
    n = len(nbr_a)
    # walk the cycle alternating matchings: step(e) = nbr_b[nbr_a[e]]
    # preserves parity-2 positions; elements at even distance from the
    # cycle leader (along this walk) get the leader's color.
    step = nbr_b[nbr_a]
    # pointer jumping: leader = min element reachable by step*
    leader = np.arange(n)
    hop = step.copy()
    for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
        leader = np.minimum(leader, leader[hop])
        hop = hop[hop]
    # the even-walk orbit of e and the orbit of nbr_a[e] partition the
    # cycle; color = 0 for the leader's orbit, 1 for the other
    color = np.where(leader <= leader[nbr_a], 0, 1)
    # normalize: exactly one of (e, nbr_a[e]) gets 0
    return color.astype(np.int8)


def benes_route(perm: np.ndarray) -> List[Tuple[int, np.ndarray]]:
    """Switch settings realizing out[perm[i]] = in[i] ... precisely:
    applying the returned stages to an array x yields y with
    y[i] = x[src[i]] where src = argsort(perm) — i.e. element x[i] lands
    at position perm[i].

    Returns a list of (distance, swap_mask[N]) stages; stage semantics:
        partner = i XOR distance (within 2*distance blocks)
        y[i] = x[partner] if swap_mask[i] else x[i]
    with swap_mask[i] == swap_mask[partner] (consistent exchanges).
    """
    perm = np.asarray(perm, dtype=np.int64)
    n = len(perm)
    assert n & (n - 1) == 0, "Benes network needs a power-of-two size"
    if n == 1:
        return []
    if n == 2:
        return [(1, np.full(2, perm[0] == 1, dtype=bool))]

    h = n // 2
    e = np.arange(n)
    # input partner: i <-> i+h ; output partner: preimages of j <-> j+h
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = e
    out_partner_of_pos = (perm + h) % n  # position paired with perm[i]... (unused)
    # element whose destination is the paired output of e's destination:
    nbr_out = inv[(perm + h) % n]
    nbr_in = e ^ h  # = (i + h) mod n for the top/bottom pairing
    color = _two_color(nbr_in, nbr_out)
    # enforce consistency explicitly (color[e] != color[nbr_in[e]])
    bad = color == color[nbr_in]
    if bad.any():
        # fall back to sequential cycle walk for robustness (rare)
        color = _two_color_seq(nbr_in, nbr_out)

    # input stage: element at i goes to subnetwork color[i]; the switch at
    # (i, i+h) swaps iff the LOW element's color is 1
    low = e[:h]
    swap_in = color[low] == 1
    swap_in_full = np.concatenate([swap_in, swap_in])

    # positions after the input stage: element from i sits at
    # (i mod h) + h*color[i]
    pos_after = (e % h) + h * color.astype(np.int64)
    # each subnetwork must realize: thing at slot s (of its half) must end
    # at output slot (perm[element] mod h) of the half perm[element] div h
    # output stage: swap at output pair (j, j+h) iff element landing at j
    # comes from the lower subnetwork... derive from colors:
    elem_at_out = inv  # elem_at_out[j] = element whose destination is j
    swap_out = color[elem_at_out[:h]] == 1
    swap_out_full = np.concatenate([swap_out, swap_out])

    # recursive permutations for the two halves
    sub_perm = np.empty(n, dtype=np.int64)
    # element e: in subnetwork c=color[e] at slot i mod h; must exit the
    # subnetwork at slot perm[e] mod h (the output stage then fixes halves)
    slot_in = np.empty(n, dtype=np.int64)
    slot_in[pos_after] = e  # element at (slot + h*half)
    for c in (0, 1):
        elems = slot_in[c * h : (c + 1) * h]
        sub_perm[c * h : (c + 1) * h] = perm[elems] % h

    top = benes_route(sub_perm[:h])
    bot = benes_route(sub_perm[h:])
    stages: List[Tuple[int, np.ndarray]] = [(h, swap_in_full)]
    for (d_t, m_t), (d_b, m_b) in zip(top, bot):
        assert d_t == d_b
        stages.append((d_t, np.concatenate([m_t, m_b])))
    stages.append((h, swap_out_full))
    return stages


def _two_color_seq(nbr_in, nbr_out):
    """Sequential fallback 2-coloring (cycle walk)."""
    n = len(nbr_in)
    color = np.full(n, -1, dtype=np.int8)
    for s in range(n):
        if color[s] >= 0:
            continue
        e, c = s, 0
        while color[e] < 0:
            color[e] = c
            e2 = nbr_in[e]
            if color[e2] < 0:
                color[e2] = 1 - c
            e = nbr_out[e2]
            c = color[e2] ^ 1 if color[e] < 0 else c
    return color


def apply_stages_np(x: np.ndarray, stages) -> np.ndarray:
    """Host reference applier."""
    y = x.copy()
    for d, mask in stages:
        partner = np.arange(len(y)) ^ d if (len(y) & (len(y) - 1)) == 0 else None
        idx = np.arange(len(y))
        p = idx ^ d
        y = np.where(mask, y[p], y)
    return y


def apply_stages_jnp(x, stages):
    """Device applier: each stage = one roll-pair + select (jit-compatible).

    i XOR d for d a power of two = roll by ±d within 2d blocks; expressed
    with two full rolls and a bit-select so it vectorizes on lanes.
    """
    import jax.numpy as jnp

    n = x.shape[0]
    idx = jnp.arange(n)
    for d, mask in stages:
        up = jnp.roll(x, -d)
        down = jnp.roll(x, d)
        partner_val = jnp.where((idx & d) == 0, up, down)
        x = jnp.where(jnp.asarray(mask), partner_val, x)
    return x
