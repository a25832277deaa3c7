#!/usr/bin/env python
"""Headline benchmark: NPB CG class C time-to-solution on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over the reference suite's best harnessed backend
for NPB CG class C (MKL, 51.82 s on the Intel rig,
/root/reference/results/cgo/cgo_data.csv:6 — see BASELINE.md). Values > 1
mean faster than the reference.

The run uses df64 (double-word f32) arithmetic so the result is *verified*
(ζ rel err <= 1e-10) — we benchmark the honest f64-grade computation, not a
loosened f32 one. Set LILAC_BENCH_CLASS / LILAC_BENCH_DTYPE to override.
"""

import json
import os
import sys
import time


def main():
    t_start = time.time()
    class_name = os.environ.get("LILAC_BENCH_CLASS")
    if class_name is None:
        # headline class D when its routed-plan cache is present (the
        # networks build once, ~50 min of single-core host work, and are
        # reused from data/ thereafter — measured full-bench wall 10.4 min);
        # cold environments fall back to class C (~5 min wall)
        here = os.path.dirname(os.path.abspath(__file__))
        have_d = all(
            os.path.exists(os.path.join(here, "data", f"routed_D_df64_{t}.npz"))
            for t in ("V", "VT")
        )
        class_name = "D" if have_d else "C"
    dtype = os.environ.get("LILAC_BENCH_DTYPE", "df64")
    kernel = os.environ.get("LILAC_BENCH_KERNEL", "factored")

    import jax  # noqa: F401  (platform from env: real TPU under the driver)

    from lilac_tpu.workloads import npb_cg

    res = npb_cg.run(class_name, dtype=dtype, kernel=kernel)

    baseline_s = {
        # reference best harnessed backend per class (cgo_data.csv)
        "S": 0.05,
        "W": 0.08,
        "A": 0.23,
        "B": 19.48,
        "C": 51.82,
        "D": 2181.90,
    }[res.class_name]

    line = {
        "metric": f"npb_cg_class{res.class_name}_time_to_solution",
        "value": round(res.time_s, 4),
        "unit": "s",
        "vs_baseline": round(baseline_s / res.time_s, 2),
        "verified": bool(res.verified),
        "zeta_rel_err": float(f"{res.rel_err:.3e}"),
        "mops": round(res.mops, 1),
        "dtype": res.dtype,
        "kernel": res.kernel,
        "nnz": res.nnz,
        "device": str(jax.devices()[0]),
        "wall_total_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(line), flush=True)
    return 0 if res.verified or dtype == "f32" else 1


if __name__ == "__main__":
    rc = main()
    # the axon tunnel runtime can hang in interpreter teardown after the
    # result is already printed; exit hard so the driver never waits on it
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
