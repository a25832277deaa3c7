"""Named kernel registry.

Each kernel is `fn(A, x) -> y` for a specific container type; entries record
the container class and supported value layouts so the planner can pick.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict


@dataclasses.dataclass(frozen=True)
class KernelEntry:
    name: str
    fn: Callable
    container: type
    dfloat: bool = False  # operates on (hi, lo) double-word values
    transpose: Callable | None = None  # optional A^T x implementation


KERNELS: Dict[str, KernelEntry] = {}


def register_kernel(name, fn, container, dfloat=False, transpose=None):
    KERNELS[name] = KernelEntry(name, fn, container, dfloat, transpose)
    return fn


def get_kernel(name: str) -> KernelEntry:
    if name not in KERNELS:
        raise KeyError(f"unknown kernel {name!r}; have {sorted(KERNELS)}")
    return KERNELS[name]
