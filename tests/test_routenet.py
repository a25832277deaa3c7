"""Gather routing networks: batched Beneš + run broadcast construction."""

import numpy as np
import pytest

from lilac_tpu.kernels import routenet as rn


@pytest.mark.parametrize("m", [2, 4, 16, 64, 512])
def test_batched_benes_realizes_random_permutations(m, rng):
    B = 5
    perm = np.stack([rng.permutation(m) for _ in range(B)])
    stages = rn.benes_route_batched(perm)
    assert len(stages) == 2 * int(np.log2(m)) - 1
    # apply: y[i] = x[i^d] when mask
    y = np.broadcast_to(np.arange(m), (B, m)).copy()
    rows = np.arange(B)[:, None]
    for d, mask in stages:
        assert (mask == mask[rows, np.arange(m)[None, :] ^ d]).all()
        y = np.where(mask, y[rows, np.arange(m)[None, :] ^ d], y)
    # element i must land at perm[i]
    got = np.take_along_axis(y, perm, axis=1)
    np.testing.assert_array_equal(got, np.broadcast_to(np.arange(m), (B, m)))


@pytest.mark.parametrize("n,T", [(50, 50), (100, 300), (64, 64), (200, 37)])
def test_gather_network_random(n, T, rng):
    B = 3
    idx = rng.integers(0, n, size=(B, T))
    net = rn.build_gather_network(idx, n)
    x = rng.normal(size=(B, n))
    xp = np.zeros((B, net.m))
    xp[:, :n] = x
    out = net.apply_host(xp)
    rows = np.arange(B)[:, None]
    np.testing.assert_array_equal(out[:, :T], x[rows, idx])


def test_gather_network_heavy_duplicates(rng):
    # one value repeated many times exercises deep broadcast chains
    n, T = 32, 256
    idx = np.concatenate([np.full(200, 7), rng.integers(0, n, size=56)])
    rng.shuffle(idx)
    net = rn.build_gather_network(idx[None], n)
    x = rng.normal(size=n)
    xp = np.zeros((1, net.m))
    xp[0, :n] = x
    out = net.apply_host(xp)
    np.testing.assert_array_equal(out[0, :T], x[idx])


def test_gather_network_sorted_identity_is_shallow(rng):
    # a sorted, duplicate-free gather needs almost no switching
    n = 256
    idx = np.arange(n)
    net = rn.build_gather_network(idx[None], n)
    assert len(net.kinds) == 0  # all stages identity -> dropped
