"""lilac_tpu — a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
mob-group/lilac-benchmarks suite (CC 2020 "Automatically Harnessing Sparse
Acceleration"): CSR/COO/ELL/BSR sparse formats, SpMV/SpMM/SpGEMM with a
pluggable kernel registry and auto-selecting planner (the TPU analogue of the
reference's libspmv backend zoo, /root/reference/libspmv/native.c:3), an
iterative-solver library (NPB CG, BiCG, GMRES, Jacobi/ILU preconditioning),
and SpMV-driven graph workloads (PageRank, BFS, PATHSAMPLE committor),
distributed over multi-chip meshes via shard_map + XLA collectives.

Layer map (reference layer -> here):
  libspmv ABI (spmv_harness_)     -> lilac_tpu.ops.spmv(A, x)
  backend .so zoo                 -> lilac_tpu.kernels registry
  mprotect mutation caches        -> immutable arrays + SpmvPlan staging
  SVM platform predictor          -> lilac_tpu.autotune predictor
  workloads (CG/BiCG/PR/BFS/...)  -> lilac_tpu.workloads
  run_all + results analysis      -> lilac_tpu.bench
"""

__version__ = "0.1.0"

from lilac_tpu.formats.sparse import COO, CSR, ELL, BSR  # noqa: F401
from lilac_tpu.ops.spmv import spmv  # noqa: F401
from lilac_tpu.plan import SpmvPlan  # noqa: F401
