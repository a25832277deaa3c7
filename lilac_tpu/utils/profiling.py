"""Observability: phase timers, report cards, roofline accounting.

The reference instruments with per-section Fortran timers gated by a
`timer.flag` file (NPB common/timers.f, cg.f:103-112,419-439), per-op-class
flop/time ledgers (SparseBench iter.f:378-430, main.f:437-457) and parboil's
IO/Kernel/Copy/Compute categories (common/include/parboil.h). The TPU-native
equivalents here:

* PhaseTimers  — named wall-clock sections with device fencing (readback),
                 printable as the NPB-style report card;
* FlopLedger   — analytic per-op-class flop/byte counters (SpMV = 2·nnz
                 flops, 12·nnz bytes, ...) with achieved-rate reporting;
* roofline()   — achieved GB/s and FLOP/s against chip ceilings (the
                 SURVEY §5 'achieved-GB/s vs HBM roofline' requirement);
* trace()      — context manager around jax.profiler for deep dives.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

import numpy as np

# chip ceilings (f32 unless noted); extend as targets appear
CHIP_SPECS = {
    "TPU v5 lite": dict(hbm_gbps=819.0, f32_tflops=49.0, bf16_tflops=197.0),
    "TPU v4": dict(hbm_gbps=1228.0, f32_tflops=68.0, bf16_tflops=275.0),
    "cpu": dict(hbm_gbps=50.0, f32_tflops=1.0, bf16_tflops=1.0),
}


def chip_spec() -> dict:
    import jax

    name = str(jax.devices()[0])
    for k, v in CHIP_SPECS.items():
        if k.lower() in name.lower():
            return v
    return CHIP_SPECS["cpu"]


class PhaseTimers:
    """Named sections; `fence` forces device completion via readback (under
    remote device tunnels block_until_ready can return early, so a D2H
    transfer is the only trustworthy completion fence)."""

    def __init__(self):
        self.total: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._open: Dict[str, float] = {}

    def start(self, name: str) -> None:
        self._open[name] = time.perf_counter()

    def stop(self, name: str, fence=None) -> float:
        if fence is not None:
            import jax
            import jax.numpy as jnp

            leaf = jax.tree_util.tree_leaves(fence)[0]
            _ = np.asarray(jnp.ravel(leaf)[0])
        dt = time.perf_counter() - self._open.pop(name)
        self.total[name] = self.total.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return dt

    @contextlib.contextmanager
    def section(self, name: str, fence_fn=None):
        """Wall-clock section. NOTE: with the bare `with timers.section(x):`
        form there is nothing to fence on (a generator-based context manager
        receives None from `with`), so device work still in flight is NOT
        awaited — pass fence_fn=lambda: <device value> to fence, or use
        start()/stop(fence=...) directly (advisor r1 finding)."""
        self.start(name)
        yield
        self.stop(name, fence=None if fence_fn is None else fence_fn())

    def report(self) -> str:
        """NPB print_results-style card (common/print_results.f)."""
        tmax = max(self.total.values(), default=0.0)
        lines = ["  SECTION            calls   time(s)    fraction"]
        for k in sorted(self.total, key=self.total.get, reverse=True):
            t = self.total[k]
            lines.append(
                f"  {k:18s} {self.counts[k]:6d} {t:10.4f} {t / tmax if tmax else 0:10.2%}"
            )
        return "\n".join(lines)


@dataclasses.dataclass
class OpClass:
    flops: float = 0.0
    bytes: float = 0.0
    time_s: float = 0.0


class FlopLedger:
    """Per-op-class flop/byte/time ledger (SparseBench's add_*_flops)."""

    def __init__(self):
        self.classes: Dict[str, OpClass] = {}

    def add(self, name: str, *, flops=0.0, bytes=0.0, time_s=0.0) -> None:
        c = self.classes.setdefault(name, OpClass())
        c.flops += flops
        c.bytes += bytes
        c.time_s += time_s

    def add_spmv(self, nnz: int, value_bytes=4, index_bytes=4, time_s=0.0):
        self.add(
            "spmv",
            flops=2.0 * nnz,
            bytes=nnz * (value_bytes + index_bytes) + 2 * value_bytes * nnz,
            time_s=time_s,
        )

    def report(self) -> str:
        spec = chip_spec()
        lines = [
            "  OP CLASS      GFLOP     GB     time(s)   GFLOP/s    GB/s   %roofline"
        ]
        for k, c in sorted(self.classes.items()):
            gf = c.flops / 1e9
            gb = c.bytes / 1e9
            fr = gf / c.time_s if c.time_s else 0.0
            br = gb / c.time_s if c.time_s else 0.0
            roof = max(
                fr / (spec["f32_tflops"] * 1e3), br / spec["hbm_gbps"]
            )
            lines.append(
                f"  {k:12s} {gf:8.2f} {gb:7.2f} {c.time_s:9.4f} {fr:9.1f} {br:7.1f}  {roof:8.1%}"
            )
        return "\n".join(lines)


def spmv_traffic_bytes(plan) -> dict:
    """Honest per-matvec HBM traffic for a staged SpmvPlan (r1 verdict #2).

    Every device leaf of the staged container is streamed exactly once per
    matvec (values, indices, bit-packed mask planes, ...), so the container
    itself is the traffic model's ground truth — no per-format formula to
    get wrong. Kernel families then add their true intermediates:

      xla_* gather kernels: one gathered-x read per stored element
        (worst case, no VMEM reuse — the classic 12B/nnz model's x term);
      routed*: the slot-product planes (vals-shaped) are written by the
        network program and re-read by the chunk reduce, and the
        un-permute is one more read+write of y. Mask-plane traffic needs
        no special case: the masks ARE container leaves.

    Returns component bytes + 'total'; feed total to roofline().
    """
    import jax

    leaves = jax.tree_util.tree_leaves(plan.A)
    a_bytes = int(sum(v.size * np.dtype(v.dtype).itemsize for v in leaves))
    n, ncols = plan.shape
    vit = 8 if plan.dtype in ("f64", "df64") else 4
    x_bytes = ncols * vit
    y_bytes = n * vit
    extra = 0
    k = plan.kernel
    if k.startswith("xla"):
        extra = plan.nnz * vit
    elif k.startswith("routed") or k == "factored":
        vals = getattr(plan.A, "vals", None)
        if vals is not None:
            vleaves = jax.tree_util.tree_leaves(vals)
            vals_bytes = int(
                sum(v.size * np.dtype(v.dtype).itemsize for v in vleaves)
            )
        else:
            vals_bytes = plan.nnz * vit
        extra = 2 * vals_bytes + 2 * y_bytes
    total = a_bytes + x_bytes + y_bytes + extra
    return dict(
        container=a_bytes, x=x_bytes, y=y_bytes, intermediates=extra,
        total=total,
    )


def roofline(bytes_moved: float, flops: float, time_s: float) -> dict:
    """Achieved vs ceiling rates for one measured region."""
    spec = chip_spec()
    gbps = bytes_moved / time_s / 1e9 if time_s else 0.0
    gflops = flops / time_s / 1e9 if time_s else 0.0
    return dict(
        gbps=gbps,
        gflops=gflops,
        frac_hbm=gbps / spec["hbm_gbps"],
        frac_flops=gflops / (spec["f32_tflops"] * 1e3),
        bound="memory" if gbps / spec["hbm_gbps"] > gflops / (spec["f32_tflops"] * 1e3) else "compute",
    )


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler wrapper: with trace('/tmp/trace'): run()."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
