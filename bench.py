#!/usr/bin/env python
"""Headline benchmark: NPB CG time-to-solution on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup over the reference suite's best harnessed backend
for the same NPB class (MKL on the Intel rig,
/root/reference/results/cgo/cgo_data.csv — see BASELINE.md). Values > 1
mean faster than the reference.

Budget discipline (round-1 verdict #1): the driver allots an unknown finite
wall budget, so this script
  (a) enables JAX's persistent compilation cache under .jax_cache/ — the
      dominant cold cost is a one-time multi-minute server-side compile
      (measured 270 s cold vs 14 s warm for class A);
  (b) climbs a class ladder A -> C -> D, keeping the best *completed*
      verified result, and only starts the next class when the measured
      remaining budget covers a measured-scaled prediction of its wall;
  (c) arms a watchdog *thread* at the budget that prints the best-so-far
      line and hard-exits — a partial ladder still yields a captured
      number. (A SIGALRM handler is not enough: Python defers signal
      handlers while the main thread is blocked in a native call, and the
      long pole here IS a blocking native call — the remote compile.)
Override with LILAC_BENCH_CLASS (single class, no ladder) and
LILAC_BENCH_BUDGET_S (default 480).

The run uses df64 (double-word f32) arithmetic so the result is *verified*
(zeta rel err <= 1e-10) — the honest f64-grade computation, not a loosened
f32 one. LILAC_BENCH_DTYPE / LILAC_BENCH_KERNEL override.
"""

import gc
import json
import os
import signal
import sys
import threading
import time

T0 = time.time()
HERE = os.path.dirname(os.path.abspath(__file__))

# reference best harnessed backend per class (results/cgo/cgo_data.csv)
BASELINE_S = {
    "S": 0.05,
    "W": 0.08,
    "A": 0.23,
    "B": 19.48,
    "C": 51.82,
    "D": 2181.90,
    # class E was never run by the reference (no published number); scale
    # MKL class D by the NPB flop-model ratio E/D (~13.5x) as the bar.
    "E": 29456.0,
}

# Walls measured this round on v5e via axon with warm compile cache
# (cold adds a one-time ~4-5 min server init, absorbed by the first class).
# Class D measured 676 s end-to-end in round 1; since then the meta
# sidecar killed the 33M-triple regeneration (46 s host) and the v2
# plans are 15% smaller, so the estimate drops — optimism is safe here:
# the ladder banks each verified rung on stdout BEFORE climbing, so a
# class-D overrun still leaves a captured class-C line.
# "A0" is the insurance rung: class A through the gather-kernel factored
# path (no routed-plan build, a compile-light XLA program) — it exists to
# bank SOME verified line in the first ~2 minutes even with every cache
# cold. Round 3's driver run (BENCH_r03.json rc=1) died with nothing
# banked because the first routed rung's cold plan-build + remote compile
# outran the whole 480 s budget.
WARM_WALL_S = {"A0": 12.0, "A": 15.0, "B": 25.0, "C": 55.0, "D": 260.0,
               "E": 2500.0}
# Class D warm wall measured 227.9 s (2026-08-20, tools/out7/
# classD_fused.log): the Beneš-reverse VT halves the staged plan to the
# V side (961 MB upload) and the fused df64 glue cuts the solve to
# 159 s — the full A0->B->C->D ladder now fits the default 480 s
# budget. E is never on the ladder (forced runs only; measured wall
# 2348 s, classE_adj4.log).


def _fingerprint(quick=True):
    """3-probe session fingerprint (round-4 verdict weak #8): HBM copy
    bandwidth, dispatch round-trip latency, and (quick=False) the routed
    stage throughput. Makes cross-session absolute comparisons mechanical
    — round 3 measured the same code 231 vs 819 GB/s session-to-session."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    fp = {}
    try:
        # host readback is the only reliable fence through the axon
        # tunnel (block_until_ready returns early — measured 15 TB/s
        # "bandwidth" without it); chain dependent calls and read one
        # element at the end
        nbig = 1 << 26  # 256 MB f32
        v = jnp.zeros(nbig, jnp.float32)
        reps_h = 30  # chained in ONE program so the tunnel round-trip
        # (~tens of ms) amortizes instead of dominating

        @jax.jit
        def sweep(a):
            return jax.lax.fori_loop(0, reps_h, lambda _, x: x + 1.0, a)

        _ = float(np.asarray(sweep(v)[0]))
        t0 = time.perf_counter()
        _ = float(np.asarray(sweep(v)[0]))
        dt = (time.perf_counter() - t0) / reps_h
        fp["hbm_copy_gbps"] = round(2 * nbig * 4 / dt / 1e9, 1)
        cp = jax.jit(lambda a: a + 1.0)
        tiny = jnp.zeros(8, jnp.float32)
        _ = float(np.asarray(cp(tiny)[0]))
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            tiny = cp(tiny)
            _ = float(np.asarray(tiny[0]))  # per-call round-trip
        fp["dispatch_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 2)
        if not quick:
            from lilac_tpu.utils.profiling import measure_stage_roofline

            p = measure_stage_roofline(m=1 << 17, S=48)
            fp["stage_gelems_s"] = round(p["stage_elems_per_s"] / 1e9, 2)
    except Exception as e:  # the fingerprint must never cost the run
        fp["error"] = repr(e)
    print(f"bench: fingerprint {fp}", file=sys.stderr)
    return fp

_best = None  # best completed result line (dict)
_phase = "startup"  # what the run was doing when/if the watchdog fires


def _elapsed():
    return time.time() - T0


def _emit_and_exit(rc_hint=None):
    """Print the best-so-far JSON line and hard-exit (the axon tunnel can
    hang in interpreter teardown, so never rely on a clean exit)."""
    global _best
    if _best is None:
        _best = {
            "metric": "npb_cg_bench_incomplete",
            "value": 0.0,
            "unit": "s",
            "vs_baseline": 0.0,
            "error": f"no class completed within budget (stuck in: {_phase})",
            "wall_total_s": round(_elapsed(), 1),
        }
    _best["wall_total_s"] = round(_elapsed(), 1)
    print(json.dumps(_best), flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    rc = rc_hint
    if rc is None:
        ok_f32 = _best.get("dtype") == "f32" and "error" not in _best
        rc = 0 if (_best.get("verified") or ok_f32) else 1
    os._exit(rc)


def _watchdog(deadline):
    """Daemon thread: unlike a SIGALRM handler, this runs even while the
    main thread is blocked in a GIL-releasing native call (remote compile,
    npz load) — exactly when the budget is most likely to be blown."""
    while True:
        left = deadline - time.time()
        if left <= 0:
            print("bench: budget watchdog fired, emitting best-so-far",
                  file=sys.stderr)
            _emit_and_exit()
        time.sleep(min(left, 2.0))


def _run_class(class_name, dtype, kernel, segmode=None):
    """Run one class; returns (line dict, wall seconds)."""
    import jax  # noqa: F401

    from lilac_tpu.workloads import npb_cg

    t0 = time.time()
    prev_segmode = os.environ.get("LILAC_FACTORED_SEGMODE")
    if segmode is not None:
        os.environ["LILAC_FACTORED_SEGMODE"] = segmode
    try:
        res = npb_cg.run(class_name, dtype=dtype, kernel=kernel)
    finally:
        if segmode is not None:
            # restore the caller's exported override (round-4 advisor:
            # a bare pop discarded it for the later rungs of the run)
            if prev_segmode is None:
                os.environ.pop("LILAC_FACTORED_SEGMODE", None)
            else:
                os.environ["LILAC_FACTORED_SEGMODE"] = prev_segmode
    wall = time.time() - t0
    line = {
        "metric": f"npb_cg_class{res.class_name}_time_to_solution",
        "value": round(res.time_s, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S[res.class_name] / res.time_s, 2),
        "verified": bool(res.verified),
        "zeta_rel_err": float(f"{res.rel_err:.3e}"),
        "mops": round(res.mops, 1),
        "dtype": res.dtype,
        "kernel": res.kernel,
        "nnz": res.nnz,
        "device": str(jax.devices()[0]),
        "class_wall_s": round(wall, 1),
    }
    return line, wall


def main():
    global _best
    sys.path.insert(0, HERE)
    from lilac_tpu.config import cfg

    conf = cfg()
    budget = conf.bench_budget_s
    dtype = conf.bench_dtype
    kernel = conf.bench_kernel
    forced = conf.bench_class

    # budget safety nets: watchdog thread (works under blocked native
    # calls) + SIGTERM handler (driver's first, polite, kill)
    signal.signal(signal.SIGTERM, lambda s, f: _emit_and_exit())
    threading.Thread(
        target=_watchdog, args=(T0 + max(30.0, budget - 10.0),), daemon=True
    ).start()

    import jax

    from lilac_tpu.config import enable_compile_cache

    enable_compile_cache()

    # device init is its own phase: when the axon tunnel is unreachable,
    # jax.devices() blocks indefinitely (observed: 5h outage 2026-08-17)
    # and the emitted error should say so rather than "no class completed"
    global _phase
    _phase = "device-init (axon tunnel)"
    # an unreachable tunnel can either HANG jax.devices() (watchdog
    # handles that) or RAISE 'Unable to initialize backend' (observed
    # 2026-08-21 during a ~1h outage): retry with backoff until the
    # budget — a mid-budget recovery still captures rungs, and a
    # never-recovering tunnel still ends in the parseable best-so-far
    # line instead of a naked traceback
    dev = None
    while dev is None:
        try:
            dev = jax.devices()[0]
        except RuntimeError as e:
            print(f"bench: device init failed ({e}); retrying in 30s",
                  file=sys.stderr)
            time.sleep(30.0)
            try:  # drop the cached failed-backend state before retrying
                import jax.extend

                jax.extend.backend.clear_backends()
            except Exception:
                pass
    print(f"bench: device {dev} up at {_elapsed():.1f}s", file=sys.stderr)
    _phase = "fingerprint"
    fp = _fingerprint(quick=True)  # cheap probes only, before any rung
    _phase = "benchmark"

    if forced:
        line, _ = _run_class(forced, dtype, kernel)
        line["fingerprint"] = fp
        ok = line["verified"] or dtype == "f32"
        # always emit the measured line; an unverified df64 run is a
        # correctness failure and says so (not "budget exceeded")
        _best = line if ok else {**line, "error": "zeta verification FAILED"}
        _emit_and_exit(0 if ok else 1)

    # Rung names map to (NPB class, factored segmode override). A0 runs
    # the compile-light gather path as the insurance rung; the routed-A
    # rung follows (round 5: the fused glue moved class A from 0.88x to
    # near the MKL bar, and every rung's banked line stays in the stdout
    # tail even though later rungs overwrite the final best line).
    ladder = [("A0", "A", "single"), ("A", "A", None), ("B", "B", None),
              ("C", "C", None), ("D", "D", None)]
    for i, (rung, cls, segmode) in enumerate(ladder):
        try:
            line, wall = _run_class(cls, dtype, kernel, segmode=segmode)
        except Exception as e:  # a failed rung must not kill banked ones
            print(f"bench: rung {rung} FAILED: {e!r}", file=sys.stderr)
            if rung == "A0":
                continue
            break
        line["fingerprint"] = fp
        print(f"bench: class {cls} wall {wall:.1f}s -> {line['value']}s "
              f"(x{line['vs_baseline']})", file=sys.stderr)
        # f32 rungs can never pass the 1e-10 zeta check — the f32 allowance
        # (same as the forced-class path) banks the measured rung anyway
        if line["verified"] or dtype == "f32":
            _best = line
            # bank the rung on stdout NOW: if the driver hard-kills the
            # process mid-way up the ladder (round-1 rc=124 left stdout
            # empty), the tail still holds a parseable result line; the
            # final emit re-prints the best line last
            _best["wall_total_s"] = round(_elapsed(), 1)
            print(json.dumps(_best), flush=True)
        else:
            # an unverified rung is a bug, not a budget issue — report the
            # best verified rung (or the failure) rather than climbing on
            break
        if i + 1 >= len(ladder):
            break
        gc.collect()
        nxt = ladder[i + 1][0]
        # measured-scaled prediction: this rung's warm-cache baseline vs its
        # actual wall calibrates compile/tunnel slowness; the first rung's
        # one-time cold-server init (~4-5 min) is excluded via the offset
        slow = max(1.0, (wall if i else min(wall, WARM_WALL_S[rung] * 2.0))
                   / WARM_WALL_S[rung])
        pred = WARM_WALL_S[nxt] * slow
        remaining = budget - _elapsed()
        if remaining < 1.25 * pred + 15.0:
            print(f"bench: stopping ladder at {rung} (next={nxt} pred "
                  f"{pred:.0f}s, remaining {remaining:.0f}s)", file=sys.stderr)
            break
    _emit_and_exit()


if __name__ == "__main__":
    main()
