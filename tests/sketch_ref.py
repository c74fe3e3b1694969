"""Shared pure-Python reference for the fixed-bin quantile sketch — a plain
helper module (NOT a test file) so test modules can import one copy without
double-importing each other under namespace-package names."""

from __future__ import annotations

from collections import Counter


def ref_quantile(values, q, w: float = 5.0, n_bins: int = 100):
    """Same crossing rule as functions/sketches.py, spelled out in Python.
    NULLs are the caller's problem: pass only measurements."""
    bins = Counter(min(max(int(v // w), 0), n_bins - 1) for v in values)
    n, cum = len(values), 0
    for b in sorted(bins):
        c = bins[b]
        cum += c
        if cum >= q * n:
            return b * w + w * (q * n - (cum - c)) / c
    return None
