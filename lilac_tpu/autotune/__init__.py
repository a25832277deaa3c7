"""Kernel auto-selection — the learned backend gate.

The reference ships a generated linear-kernel SVC that picks between
backends from (log rows, log nnz)
(/root/reference/libspmv/mkl-model.c:3-165, trained by
results/cgo/suite.py:75-109 over SuiteSparse timings and exported to C with
sklearn-porter). The TPU-native counterpart:

* features(...)          — (log rows, log nnz, mean row length, row-length
                           cv, density): the reference's two features plus
                           the row-shape stats that decide ELL viability;
* measure(...)           — time every applicable registry kernel on a plan
                           (the results/cgo/run_all collection step);
* train(...)             — one-vs-rest ridge-regularised linear classifier
                           fit in closed form (numpy only — the runtime has
                           no sklearn; a linear SVC and ridge OVR draw
                           near-identical boundaries on 5 features);
* LinearSelector         — the shipped predictor: standardisation constants
                           + weights, JSON-serialisable (≙ the generated
                           mkl-model.c with its baked StandardScaler means,
                           mkl-model.c:157-161);
* predict(...)           — module-level gate used by SpmvPlan when a trained
                           model is installed (falls back to the heuristic).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

MODEL_ENV = "LILAC_AUTOTUNE_MODEL"
DEFAULT_MODEL_PATH = os.path.join(os.path.dirname(__file__), "model.json")


def features(nrows: int, nnz: int, mean_row: float, std_row: float) -> np.ndarray:
    mean_row = max(mean_row, 1e-12)
    return np.asarray(
        [
            np.log(max(nrows, 1)),
            np.log(max(nnz, 1)),
            np.log(mean_row),
            std_row / mean_row,  # row-length coefficient of variation
            np.log(max(nnz, 1) / max(nrows, 1) ** 2 + 1e-300),  # density
        ]
    )


@dataclasses.dataclass
class LinearSelector:
    classes: List[str]
    mean: np.ndarray  # [f] standardisation (mkl-model.c:157-161 analogue)
    scale: np.ndarray  # [f]
    W: np.ndarray  # [classes, f]
    b: np.ndarray  # [classes]

    def predict(self, feat: np.ndarray) -> str:
        z = (feat - self.mean) / self.scale
        return self.classes[int(np.argmax(self.W @ z + self.b))]

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                dict(
                    classes=self.classes,
                    mean=self.mean.tolist(),
                    scale=self.scale.tolist(),
                    W=self.W.tolist(),
                    b=self.b.tolist(),
                ),
                f,
                indent=1,
            )

    @staticmethod
    def load(path: str) -> "LinearSelector":
        d = json.load(open(path))
        return LinearSelector(
            d["classes"],
            np.asarray(d["mean"]),
            np.asarray(d["scale"]),
            np.asarray(d["W"]),
            np.asarray(d["b"]),
        )


def train(X: np.ndarray, labels: Sequence[str], ridge: float = 1e-3) -> LinearSelector:
    """One-vs-rest ridge classifier in closed form (suite.py:75-81's role)."""
    X = np.asarray(X, dtype=np.float64)
    classes = sorted(set(labels))
    mean = X.mean(axis=0)
    scale = X.std(axis=0)
    scale[scale == 0] = 1.0
    Z = (X - mean) / scale
    Za = np.concatenate([Z, np.ones((len(Z), 1))], axis=1)
    Wb = np.zeros((len(classes), Za.shape[1]))
    G = Za.T @ Za + ridge * np.eye(Za.shape[1])
    for i, c in enumerate(classes):
        y = np.where(np.asarray(labels) == c, 1.0, -1.0)
        Wb[i] = np.linalg.solve(G, Za.T @ y)
    return LinearSelector(classes, mean, scale, Wb[:, :-1], Wb[:, -1])


def measure(
    indptr, indices, data, shape, kernels: Sequence[str], *, dtype="f32", reps=10
) -> Dict[str, float]:
    """Time each kernel on a matrix (the results/cgo/run_all collector)."""
    import jax
    import jax.numpy as jnp

    from lilac_tpu.plan import SpmvPlan

    out = {}
    for k in kernels:
        try:
            plan = SpmvPlan(indptr, indices, data, shape, dtype=dtype, kernel=k)
        except Exception:
            continue
        x = plan.vec_in(np.random.default_rng(0).normal(size=shape[1]))

        @jax.jit
        def chain(x, A=plan.A, mv=plan.matvec_with):
            def body(_, v):
                return mv(A, v)

            return jax.lax.fori_loop(0, reps, body, x)

        try:
            y = chain(x)
            leaf = jax.tree_util.tree_leaves(y)[0]
            _ = float(jnp.ravel(leaf)[0])  # warm-up + fence
            t0 = time.perf_counter()
            y = chain(x)
            leaf = jax.tree_util.tree_leaves(y)[0]
            _ = float(jnp.ravel(leaf)[0])
            out[k] = (time.perf_counter() - t0) / reps
        except Exception:
            continue
    return out


_cached_model: Optional[LinearSelector] = None
_cached_path: Optional[str] = None


def installed_model() -> Optional[LinearSelector]:
    global _cached_model, _cached_path
    path = os.environ.get(MODEL_ENV, DEFAULT_MODEL_PATH)
    if not os.path.exists(path):
        return None
    if _cached_model is None or _cached_path != path:
        _cached_model = LinearSelector.load(path)
        _cached_path = path
    return _cached_model


def predict(nrows, nnz, mean_row, std_row) -> Optional[str]:
    """Model-gated kernel choice; None when no model is installed."""
    m = installed_model()
    if m is None:
        return None
    return m.predict(features(nrows, nnz, mean_row, std_row))


def default_corpus(max_n: int = 200_000):
    """Generated matrix corpus standing in for the reference's SuiteSparse
    download set (results/cgo/all_matrices.csv — this environment has no
    egress): stencils, random CRS at several densities, NPB-like patterns."""
    from lilac_tpu.generate.random_crs import random_crs
    from lilac_tpu.generate.stencil import seven_point_csr

    corpus = []
    for side in (10, 16, 24, 32, 40):
        if side**3 <= max_n:
            corpus.append(("stencil", seven_point_csr(side, side, side)))
    for size, seed in ((10, 0), (20, 1), (30, 2), (40, 3)):
        if size**3 <= max_n:
            corpus.append((f"randcrs{size}", random_crs(size, seed=seed)))
    # banded matrices with wide bands (ELL-friendly)
    for n, bw in ((20_000, 9), (50_000, 17)):
        if n <= max_n:
            offs = np.arange(-(bw // 2), bw // 2 + 1)
            rows = np.repeat(np.arange(n), bw)
            cols = (rows.reshape(n, bw) + offs).clip(0, n - 1).ravel()
            vals = np.random.default_rng(n).normal(size=n * bw)
            from lilac_tpu.formats.convert import coo_to_csr_arrays

            corpus.append((f"band{n}", coo_to_csr_arrays(rows, cols, vals, (n, n)) + ((n, n),)))
    return corpus


def build_default_model(
    kernels=("xla_ell", "xla_sell", "xla_csr"), path: str = DEFAULT_MODEL_PATH,
    reps: int = 20, verbose: bool = True,
):
    """Measure the corpus on the current device, train, and install the
    model — the whole results/cgo pipeline (run_all -> suite.py -> shipped
    mkl-model.c) in one call."""
    X, y = [], []
    for name, (indptr, indices, data, shape) in default_corpus():
        times = measure(indptr, indices, data, shape, kernels, reps=reps)
        if not times:
            continue
        best = min(times, key=times.get)
        counts = np.diff(indptr)
        X.append(
            features(shape[0], len(indices), float(counts.mean()), float(counts.std()))
        )
        y.append(best)
        if verbose:
            print(f"  {name:12s} -> {best:10s} " + " ".join(
                f"{k}={v*1e3:.2f}ms" for k, v in sorted(times.items())))
    model = train(np.asarray(X), y)
    model.save(path)
    if verbose:
        acc = np.mean([model.predict(x) == l for x, l in zip(X, y)])
        print(f"model saved to {path}; train accuracy {acc:.2f}")
    return model
