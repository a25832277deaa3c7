#!/usr/bin/env python
"""Profile one host_batch of the hierarchical routed-plan build at class-D
scale (m=2^21, B=4 nets) to isolate the round-2 plan-build regression
(PLAN.md: ~40-60 s/net vs the 262 s total recorded Aug 17)."""

import cProfile
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from lilac_tpu.kernels import routed as rd  # noqa: E402
from lilac_tpu.kernels import routenet as rn  # noqa: E402

M = 1 << 21
B = 4
NCOL = 1_500_000
BL = 1 << 16

rng = np.random.default_rng(0)
# class-D-like: runs of K=22 contiguous slots per row, random columns
idx = rng.integers(0, NCOL, size=(B, M), dtype=np.int64)

t0 = time.time()
net_h = rn.build_gather_network(idx, NCOL, M, drop_empty=False)
t_net = time.time() - t0
print(f"build_gather_network: {t_net:.1f}s  S={len(net_h.kinds)}", flush=True)

gmax = rd.hier_gmax(BL, 2)
print(f"gmax(auto)={gmax}")
t0 = time.time()
passes = rd.compile_hier(net_h.kinds, net_h.dists, net_h.masks[:, 0, :], BL, gmax=gmax)
t_ch = time.time() - t0
print(f"compile_hier (1 net): {t_ch:.1f}s  passes={len(passes)}", flush=True)

# cProfile the second net for attribution
pr = cProfile.Profile()
pr.enable()
rd.compile_hier(net_h.kinds, net_h.dists, net_h.masks[:, 1, :], BL, gmax=gmax)
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(15)

pr = cProfile.Profile()
pr.enable()
rn.build_gather_network(idx[:1], NCOL, M, drop_empty=False)
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(15)
