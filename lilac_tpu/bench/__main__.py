"""CLI: python -m lilac_tpu.bench {run,analyze} — see bench/__init__.py."""

from __future__ import annotations

import argparse
import sys

from lilac_tpu import bench


def main(argv=None):
    p = argparse.ArgumentParser(prog="lilac_tpu.bench")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run")
    pr.add_argument("--bench", required=True, choices=sorted(bench.BENCHES))
    pr.add_argument("--size", required=True)
    pr.add_argument("--impl", default="auto")
    pr.add_argument("--platform", default="tpu")
    pr.add_argument("--runs", type=int, default=5)
    pr.add_argument("--out", default="all.csv")

    pa = sub.add_parser("analyze")
    pa.add_argument("csv")
    pa.add_argument("--baseline", default="xla_ell")

    sub.add_parser("devices")  # ≙ libspmv/cl-probe.cpp

    pm = sub.add_parser("marshall")  # ≙ the *-slow marshalling probes
    pm.add_argument("--size", type=int, default=30)

    args = p.parse_args(argv)
    if args.cmd == "devices":
        import jax

        from lilac_tpu.utils.profiling import chip_spec

        for i, d in enumerate(jax.devices()):
            print(f"device {i}: {d} platform={d.platform}")
        print("chip spec:", chip_spec())
        return 0
    if args.cmd == "marshall":
        import time

        from lilac_tpu.generate.random_crs import random_crs
        from lilac_tpu.plan import SpmvPlan

        indptr, indices, data, shape = random_crs(args.size, seed=0)
        for kernel in ("xla_ell", "xla_sell", "xla_csr"):
            t0 = time.perf_counter()
            SpmvPlan(indptr, indices, data, shape, dtype="f32", kernel=kernel)
            print(f"  plan build ({kernel}): {time.perf_counter()-t0:.3f}s "
                  f"(the reference's *-slow backends re-marshal this every call)")
        return 0
    if args.cmd == "run":
        row = bench.run_bench(
            args.bench, args.size, args.impl, platform=args.platform, runs=args.runs
        )
        bench.append_rows(args.out, [row])
        print(",".join(row.csv()))
    else:
        recs = bench.tidy(args.csv)
        for (plat, b, impl), s in sorted(
            bench.geomean_speedups(recs, args.baseline).items()
        ):
            print(f"{plat:10s} {b:14s} {impl:16s} geomean speedup {s:8.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())


