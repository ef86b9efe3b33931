"""Numerical debugging utilities.

Equivalents of the reference's debug toolkit:
- BinaryDumper (reference src/debug.h:6-13): persist/load raw arrays for
  offline diffing, as .npy files (self-describing instead of raw f32/f16
  blobs — same workflow, no separate shape bookkeeping).
- DEBUG_MODEL activation capture (reference src/model.h:329-348,
  src/infer.cpp:28-46): `decode_step(..., capture=True)` returns a named map
  of per-layer intermediates; `max_err` diffs two capture maps the way
  DebugTensor::max_err does (reference src/model.cpp:419-441). Because both
  "backends" here are the same functional model under different devices or
  dtypes, captures compare CPU-vs-TPU or fp16-vs-fp8 runs.
"""

from __future__ import annotations

import os

import numpy as np


class BinaryDumper:
    """Save/load arrays for fixture capture and offline comparison."""

    @staticmethod
    def save(path: str, arr) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.save(path, np.asarray(arr), allow_pickle=False)

    @staticmethod
    def load(path: str) -> np.ndarray:
        return np.load(path, allow_pickle=False)


def max_err(a, b, relative: bool = True) -> float:
    """Max elementwise error between two tensors or capture maps."""
    if isinstance(a, dict):
        return max((max_err(a[k], b[k], relative) for k in a), default=0.0)
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    diff = np.abs(a - b)
    if relative:
        scale = max(np.abs(a).max(), np.abs(b).max(), 1e-30)
        return float(diff.max() / scale)
    return float(diff.max())


def diff_captures(cap_a: dict, cap_b: dict, relative: bool = True) -> dict[str, float]:
    """Per-tensor max errors between two capture maps (sorted, worst first)."""
    errs = {k: max_err(cap_a[k], cap_b[k], relative) for k in cap_a if k in cap_b}
    return dict(sorted(errs.items(), key=lambda kv: -kv[1]))
