"""Beneš routing-network construction and application."""

import numpy as np
import pytest

from lilac_tpu.kernels import routing as rt


@pytest.mark.parametrize("n", [2, 4, 8, 32, 128, 1024])
def test_benes_realizes_random_permutations(n, rng):
    for _ in range(10):
        perm = rng.permutation(n)
        stages = rt.benes_route(perm)
        assert len(stages) == max(2 * int(np.log2(n)) - 1, 1)
        y = rt.apply_stages_np(np.arange(n), stages)
        np.testing.assert_array_equal(y[perm], np.arange(n))


def test_benes_device_applier_matches_host(rng):
    import jax.numpy as jnp

    n = 256
    perm = rng.permutation(n)
    stages = rt.benes_route(perm)
    x = rng.normal(size=n).astype(np.float32)
    host = rt.apply_stages_np(x, stages)
    dev = np.asarray(rt.apply_stages_jnp(jnp.asarray(x), stages))
    np.testing.assert_array_equal(host, dev)


def test_benes_identity_and_reverse():
    n = 64
    stages = rt.benes_route(np.arange(n))
    y = rt.apply_stages_np(np.arange(n), stages)
    np.testing.assert_array_equal(y, np.arange(n))
    rev = np.arange(n)[::-1].copy()
    y = rt.apply_stages_np(np.arange(n), rt.benes_route(rev))
    np.testing.assert_array_equal(y[rev], np.arange(n))
