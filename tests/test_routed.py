"""Pallas routed-gather applier vs the host network simulator."""

import numpy as np
import pytest

from lilac_tpu.kernels import routed as rd
from lilac_tpu.kernels import routenet as rn


def _run_net(idx, n, x, m=None):
    import jax.numpy as jnp

    net = rn.build_gather_network(idx, n, m)
    masks = rd.masks_device(net)
    R = net.m // 128
    xp = np.zeros(net.m, dtype=np.float32)
    xp[:n] = x
    (out,) = rd.routed_apply(
        [jnp.asarray(xp.reshape(R, 128))],
        masks,
        net.kinds,
        net.dists,
        interpret=True,
    )
    return np.asarray(out).reshape(idx.shape[0], net.m)


def test_routed_apply_matches_gather(rng):
    n, T, B = 900, 1024, 3
    idx = rng.integers(0, n, size=(B, T))
    x = rng.normal(size=n).astype(np.float32)
    out = _run_net(idx, n, x)
    np.testing.assert_array_equal(out[:, :T], x[idx])


def test_routed_apply_duplicates_and_shifts(rng):
    n, T = 64, 1024  # heavy duplication -> deep broadcast chains
    idx = rng.integers(0, n, size=(1, T))
    x = rng.normal(size=n).astype(np.float32)
    out = _run_net(idx, n, x)
    np.testing.assert_array_equal(out[:, :T], x[idx])


def test_routed_apply_two_planes(rng):
    import jax.numpy as jnp

    n, T = 500, 1024
    idx = rng.integers(0, n, size=(2, T))
    hi = rng.normal(size=n).astype(np.float32)
    lo = rng.normal(size=n).astype(np.float32)
    net = rn.build_gather_network(idx, n)
    masks = rd.masks_device(net)
    R = net.m // 128
    pads = []
    for p in (hi, lo):
        xp = np.zeros(net.m, dtype=np.float32)
        xp[:n] = p
        pads.append(jnp.asarray(xp.reshape(R, 128)))
    oh, ol = rd.routed_apply(pads, masks, net.kinds, net.dists, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(oh).reshape(2, -1)[:, :T], hi[idx]
    )
    np.testing.assert_array_equal(
        np.asarray(ol).reshape(2, -1)[:, :T], lo[idx]
    )
