"""Window-function registry (numpy-only; scipy is not available here).

The reference resolves window names via ``scipy.signal.get_window``
(reference: ``src/apollon/signal/spectral.py:57``), whose default
``fftbins=True`` yields *periodic* windows. We reproduce the window
vectors numerically so feature values match ``numpy.allclose``.

Windows are tiny vectors computed once per task and cached; on a real
cluster they ride along in the (broadcast) UDF closure.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np


def _cosine_window(n: int, coeffs: tuple[float, ...], periodic: bool) -> np.ndarray:
    """General cosine window: sum_k (-1)^k a_k cos(2 pi k t / (N-1))."""
    if n == 1:
        return np.ones(1)
    m = n if periodic else n - 1
    k = np.arange(n)
    out = np.zeros(n, dtype="float64")
    for j, a in enumerate(coeffs):
        out += ((-1) ** j) * a * np.cos(2.0 * np.pi * j * k / m)
    return out


def triang(n: int, periodic: bool = False) -> np.ndarray:
    """Triangular window, matching scipy.signal.windows.triang.

    Used symmetric (``fftbins=False``) by the Bark filter bank
    (reference: ``src/apollon/signal/critical_bands.py:88``).
    """
    if periodic:
        w = triang(n + 1, periodic=False)
        return w[:-1]
    if n == 1:
        return np.ones(1)
    half = np.arange(1, (n + 1) // 2 + 1, dtype="float64")
    if n % 2 == 0:
        w = (2.0 * half - 1.0) / n
        return np.concatenate([w, w[::-1]])
    w = 2.0 * half / (n + 1.0)
    return np.concatenate([w, w[-2::-1]])


@lru_cache(maxsize=256)
def get_window(name: str | None, n: int, periodic: bool = True) -> np.ndarray:
    """Resolve a window name to its vector. Periodic by default, matching
    ``scipy.signal.get_window(name, n)`` (fftbins=True)."""
    if name is None:
        name = "rect"
    key = name.lower()
    if key in ("rect", "rectangular", "boxcar", "ones"):
        return np.ones(n, dtype="float64")
    if key == "hamming":
        return _cosine_window(n, (0.54, 0.46), periodic)
    if key in ("hann", "hanning"):
        return _cosine_window(n, (0.5, 0.5), periodic)
    if key == "blackman":
        return _cosine_window(n, (0.42, 0.5, 0.08), periodic)
    if key in ("triang", "triangle", "tri"):
        return triang(n, periodic)
    if key == "bartlett":
        k = np.arange(n, dtype="float64")
        m = n if periodic else n - 1
        return 1.0 - np.abs(2.0 * k / m - 1.0)
    raise ValueError(f"Unknown window name: {name!r}")
