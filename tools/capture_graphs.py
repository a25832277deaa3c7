"""Round-3 graph recapture (verdict #9): PageRank + BFS at n=1M through
gather and routed kernels, one process, progress banked line-by-line.

The gather PageRank number is reused from the first graph-scale attempt if
passed via --skip-pagerank-auto (the 700 s cap killed that run mid
routed-plan-build; generation + gather had already banked 19.160 s/run).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lilac_tpu.config import enable_compile_cache

enable_compile_cache()


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    skip_pr_auto = "--skip-pagerank-auto" in sys.argv
    from lilac_tpu.generate.graphs import powerlaw_graph
    from lilac_tpu.workloads import bfs as bfsw
    from lilac_tpu.workloads import pagerank

    n = 1_000_000
    t0 = time.time()
    g = powerlaw_graph(n, avg_deg=16.0, seed=0, symmetric=False)
    log(f"pagerank graph generated in {time.time()-t0:.0f}s nnz={len(g[1])}")
    kernels = ["routed"] if skip_pr_auto else ["auto", "routed"]
    for kernel in kernels:
        t0 = time.time()
        r = pagerank.run(*g, iters=128, runs=2, kernel=kernel)
        t = min(r.times_s)
        log(
            f"RESULT pagerank n={n} nnz={len(g[1])} kernel={kernel:12s}"
            f" {t:7.3f} s/run {128 * len(g[1]) / t / 1e9:6.2f} Gnnz/s"
            f" err={r.error:.3e} (wall incl plan+compile {time.time()-t0:.0f}s)"
        )
    del g

    t0 = time.time()
    gs = powerlaw_graph(n, avg_deg=16.0, seed=0, symmetric=True)
    log(f"bfs graph generated in {time.time()-t0:.0f}s nnz={len(gs[1])}")
    for kernel in ("auto", "routed"):
        t0 = time.time()
        r = bfsw.run_benchmark(*gs, runs=16, kernel=kernel)
        log(
            f"RESULT bfs      n={n} nnz={len(gs[1])} kernel={kernel:12s}"
            f" {r.time_s:7.3f} s / 16 sources"
            f" (wall incl plan+compile {time.time()-t0:.0f}s)"
        )
    log("done")
    os._exit(0)


if __name__ == "__main__":
    main()
