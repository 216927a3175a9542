"""Pure-numpy restatement of the reference's feature math, used as the
parity oracle for the engine (SURVEY §5: differential parity harness).

Follows the REFERENCE execution shape — column-major (n_perseg, n_segs)
arrays, per-segment loops, math.fsum compensated sums — so that it is an
independent check of the engine's batched row-major kernels, not the
same code twice. Each function cites the reference file:line it
restates (/root/reference/src/apollon/...).
"""
from __future__ import annotations

import math

import numpy as np


# --- windows (scipy.signal.get_window equivalents, periodic) ---------------

def get_window(name: str | None, n: int) -> np.ndarray:
    if name is None or name in ("rect", "boxcar"):
        return np.ones(n)
    k = np.arange(n)
    if name == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * k / n)
    if name in ("hann", "hanning"):
        return 0.5 - 0.5 * np.cos(2 * np.pi * k / n)
    if name == "blackman":
        return (0.42 - 0.5 * np.cos(2 * np.pi * k / n)
                + 0.08 * np.cos(4 * np.pi * k / n))
    raise ValueError(name)


def triang_sym(m: int) -> np.ndarray:
    """scipy.signal.windows.triang(m, sym=True)."""
    n = np.arange(1, (m + 1) // 2 + 1)
    if m % 2 == 0:
        w = (2 * n - 1.0) / m
        return np.concatenate([w, w[::-1]])
    w = 2 * n / (m + 1.0)
    return np.concatenate([w, w[-2::-1]])


# --- tools.fsum (tools.py:279-308) ------------------------------------------

def fsum(arr: np.ndarray, axis: int | None = None,
         keepdims: bool = False) -> np.ndarray:
    arr = np.atleast_2d(arr)
    if axis is None:
        out = np.float64(math.fsum(arr.flatten()))
        return np.array(out, ndmin=arr.ndim) if keepdims else out
    if axis == 0:
        out = np.array([math.fsum(col) for col in arr.T])
        return np.expand_dims(out, 0) if keepdims else out
    out = np.array([math.fsum(row) for row in arr])
    return np.expand_dims(out, 1) if keepdims else out


# --- segmentation (segment.py:189-237, 96-125) ------------------------------

def segment_transform(data: np.ndarray, n_perseg: int, n_overlap: int,
                      extend: bool = True, pad: bool = True) -> np.ndarray:
    """Returns (n_perseg, n_segs) column-major segments."""
    assert n_perseg > 0 and 0 < n_overlap < n_perseg
    n_frames = data.shape[0]
    assert n_perseg <= n_frames
    step = n_perseg - n_overlap
    ext_len = n_perseg // 2 if extend else 0
    pad_len = (-(n_frames - n_perseg) % step) % n_perseg if pad else 0
    padded = np.pad(np.asarray(data, "float64").squeeze(),
                    (ext_len, ext_len + pad_len))
    n_segs = (padded.shape[0] - n_overlap) // step
    segs = np.empty((n_perseg, n_segs))
    for i in range(n_segs):
        segs[:, i] = padded[i * step:i * step + n_perseg]
    return segs


def segment_center(i: int, n_perseg: int, n_overlap: int, extend: bool) -> int:
    offset = 0 if extend else n_perseg // 2
    return i * (n_perseg - n_overlap) + offset


def segment_bounds(i: int, n_perseg: int, n_overlap: int,
                   extend: bool) -> tuple[int, int]:
    lob = segment_center(i, n_perseg, n_overlap, extend) - n_perseg // 2
    return lob, lob + n_perseg


# --- spectral (spectral.py:27-63) -------------------------------------------

def fft(sig: np.ndarray, window: str | None = None, n_fft: int | None = None,
        norm: bool = True) -> np.ndarray:
    """(n_perseg, n_segs) -> complex (n_bins, n_segs)."""
    n_sig = sig.shape[0]
    if n_fft is None:
        n_fft = n_sig
    win = np.expand_dims(get_window(window, n_sig), 1)
    bins = np.fft.rfft(sig * win, n_fft, axis=0)
    if norm:
        bins = bins / np.sqrt(np.square(win.sum())) * 2
    return bins


# --- features (features.py) -------------------------------------------------

def energy(sig: np.ndarray) -> np.ndarray:
    """features.py:122-133 — along first axis, keepdims."""
    assert np.isfinite(sig).all()
    return np.sum(np.square(np.abs(sig)), axis=0, keepdims=True)


def rms(sig: np.ndarray) -> np.ndarray:
    """features.py:158-167."""
    return np.sqrt(np.mean(np.square(np.abs(sig)), axis=0, keepdims=True))


def spl(sig: np.ndarray, ref: float = 2e-5) -> np.ndarray:
    """features.py:348-359 (log evaluated where level > 0)."""
    level = rms(sig) / ref
    out = np.zeros_like(level)
    np.log10(level, where=level > 0, out=out)
    return 20 * out


def _power_distr(bins: np.ndarray) -> np.ndarray:
    """features.py:450-461."""
    total = fsum(bins, axis=0, keepdims=True)
    total[total == 0] = 1
    return bins / total


def spectral_centroid(frqs: np.ndarray, amps: np.ndarray) -> np.ndarray:
    """features.py:170-192."""
    return fsum(frqs * _power_distr(amps), axis=0, keepdims=True)


def spectral_spread(frqs: np.ndarray, bins: np.ndarray,
                    centroids: np.ndarray | None = None) -> np.ndarray:
    """features.py:195-224."""
    if centroids is None:
        centroids = spectral_centroid(frqs, bins)
    deviation = np.power(frqs - centroids, 2)
    return np.sqrt(fsum(deviation * _power_distr(bins), axis=0, keepdims=True))


def spectral_flux(inp: np.ndarray, delta: float = 1.0,
                  total: bool = True) -> np.ndarray:
    """features.py:280-305: positive np.gradient along time (axis -1)."""
    inp = np.atleast_2d(inp).astype("float64")
    out = np.maximum(np.gradient(inp, delta, axis=-1), 0)
    if total:
        return out.sum(axis=0, keepdims=True)
    return out


def fspl(amps: np.ndarray, total: bool = False,
         ref: float = 2e-5) -> np.ndarray:
    """features.py:308-331."""
    vals = np.power(amps / ref, 2)
    if total:
        vals = vals.sum(axis=0, keepdims=True)
    vals = np.maximum(1.0, vals)
    return 10.0 * np.log10(vals)


# --- critical bands (critical_bands.py) -------------------------------------

def frq2cbr(frq: np.ndarray) -> np.ndarray:
    frq = np.atleast_1d(frq)
    return 13.0 * np.arctan(0.00076 * frq) + 3.5 * np.arctan(np.power(frq / 7500, 2))


def filter_bank(frqs: np.ndarray) -> np.ndarray:
    n_bands = 24
    z_frq = frq2cbr(frqs)
    bank = np.zeros((n_bands, z_frq.size))
    for z in range(n_bands):
        idx = np.logical_and(z <= z_frq, z_frq < z + 1)
        n = idx.sum()
        if n:
            bank[z, idx] = triang_sym(int(n))
    return bank


def level(cbi: np.ndarray) -> np.ndarray:
    ref = 10e-12
    return 10.0 * np.log10(np.maximum(cbi, ref) / ref)


def specific_loudness(cbr: np.ndarray) -> np.ndarray:
    return np.power(level(cbr), 0.23)


def total_loudness(cbr: np.ndarray) -> np.ndarray:
    """critical_bands.py:53-65 (fsum over bands, axis 0)."""
    return fsum(specific_loudness(cbr), axis=0)


def loudness(frqs: np.ndarray, bins: np.ndarray) -> np.ndarray:
    """features.py:385-396: bins is the (n_bins, n_segs) magnitude
    spectrogram."""
    cbrs = filter_bank(frqs.squeeze()) @ bins
    return total_loudness(cbrs)


def sharpness(frqs: np.ndarray, bins: np.ndarray) -> np.ndarray:
    """features.py:435-447 + critical_bands.py:94-124. NB the
    denominator fsum has axis=None — one scalar per spectrogram."""
    cbrs = filter_bank(frqs.squeeze()) @ bins
    loud_specific = np.maximum(specific_loudness(cbrs),
                               np.finfo("float64").eps)
    loud_total = fsum(loud_specific, keepdims=True)
    z = np.arange(1, 25)
    w = np.maximum(np.ones_like(z, dtype="float64"),
                   0.066 * np.exp(0.171 * np.atleast_1d(z)))
    return ((z * w) @ cbrs) / loud_total


# --- fractal (fractal.py:42-96) ---------------------------------------------

def delay_embedding(inp: np.ndarray, delay: int, m_dim: int) -> np.ndarray:
    max_idx = inp.size - ((m_dim - 1) * delay)
    emb = np.empty((max_idx, m_dim))
    for i in range(max_idx):
        emb[i] = inp[i:i + m_dim * delay:delay]
    return emb


def embedding_entropy(emb: np.ndarray, n_bins: int) -> float:
    counts, _ = np.histogramdd(emb, bins=n_bins)
    p = counts.flatten()
    p = p / p.sum()
    p = p[p > 0]
    return float(-(p * np.log(p)).sum())


# --- correlogram (features.py:76-119 + correlogram.c:3-78) ------------------

def corrcoef(a: np.ndarray, b: np.ndarray) -> float:
    am, bm = a - a.mean(), b - b.mean()
    den = math.sqrt((am * am).sum() * (bm * bm).sum())
    if den == 0:
        return 0.0
    return float((am * bm).sum() / den)


def correlogram(sig: np.ndarray, wlen: int, n_delay: int,
                total: bool = True) -> np.ndarray:
    """Per-segment windowed autocorr^4 clamped at 0."""
    sig = np.asarray(sig, "float64").ravel()
    n_t = sig.size - wlen - n_delay
    out = np.zeros((n_delay - 1, n_t))
    for d in range(1, n_delay):
        for t in range(n_t):
            r = corrcoef(sig[t:t + wlen], sig[t + d:t + d + wlen])
            out[d - 1, t] = max(r, 0.0) ** 4
    if total:
        return np.array([out.mean()])
    return out


# --- full per-doc battery (oracle for the fused extractor) ------------------

def doc_features(tokens: np.ndarray, n_perseg: int = 512,
                 n_overlap: int = 256, extend: bool = True, pad: bool = True,
                 window: str | None = "hamming", fps: int = 9000,
                 n_fft: int | None = None) -> dict[str, np.ndarray]:
    """Reference-shaped pipeline: segment -> fft -> per-segment stats."""
    sig = np.asarray(tokens, "float64")
    segs = segment_transform(sig, n_perseg, n_overlap, extend, pad)
    nfft = n_fft or n_perseg
    bins = np.abs(fft(segs, window, nfft))
    frqs = np.fft.rfftfreq(nfft, 1.0 / fps).reshape(-1, 1)
    cen = spectral_centroid(frqs, bins)
    spr = spectral_spread(frqs, bins, cen)
    n_segs = segs.shape[1]
    centers = np.array([
        segment_center(i, n_perseg, n_overlap, extend) for i in range(n_segs)])
    return {
        "center": centers,
        "energy": energy(segs).squeeze(0),
        "rms": rms(segs).squeeze(0),
        "spl": spl(segs).squeeze(0),
        "centroid": cen.squeeze(0),
        "spread": spr.squeeze(0),
        "flux": spectral_flux(bins, total=True).squeeze(0),
        "fspl": fspl(bins, total=True).squeeze(0),
        "loudness": loudness(frqs, bins),
        "sharpness": sharpness(frqs, bins).squeeze(0),
    }
