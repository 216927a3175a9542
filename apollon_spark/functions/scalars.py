"""Scalar / element-wise functions as Catalyst Column expressions
(SURVEY §2.5) — JVM-side, whole-stage-codegen'd, no Python.

Each cites the reference formula it reproduces
(/root/reference/src/apollon/...).
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SPL_REF = 2e-5


def mono_mixdown(*channels: Column) -> Column:
    """Element-wise mean of N channel arrays — the multi-channel ->
    mono fold of the reference loader (audio.py ``fti16`` applies the
    same mean over ``audio.data`` channels). Pure array SQL: a
    zip_with sum across channels, then one transform to divide.

    Channels of unequal length are malformed input: the whole result
    is NULL for that row (detectable with one isnull filter) rather
    than a silent trailing-null tail that zip_with padding would
    produce."""
    if not channels:
        raise ValueError("mono_mixdown needs at least one channel")
    acc = F.transform(channels[0], lambda x: x.cast("double"))
    for ch in channels[1:]:
        acc = F.zip_with(acc, ch, lambda a, b: a + b.cast("double"))
    mixed = F.transform(acc, lambda s: s / float(len(channels)))
    same_len = F.lit(True)
    for ch in channels[1:]:
        same_len = same_len & (F.size(channels[0]) == F.size(ch))
    return F.when(same_len, mixed)


def freq2mel(frq: Column) -> Column:
    """1125 * ln(1 + f/700) (signal/tools.py:99-109)."""
    return 1125.0 * F.log(1.0 + frq / 700.0)


def mel2freq(mel: Column) -> Column:
    """700 * (exp(m/1125) - 1) (signal/tools.py:148-158)."""
    return 700.0 * (F.exp(mel / 1125.0) - 1.0)


def frq2cbr(frq: Column) -> Column:
    """Hz -> Bark (critical_bands.py:12-22)."""
    return 13.0 * F.atan(0.00076 * frq) + 3.5 * F.atan(F.pow(frq / 7500.0, 2))


def c_weighting(frq: Column) -> Column:
    """IEC C-weighting magnitude (signal/tools.py:84-96)."""
    f2 = frq * frq
    return (148693636.0 * f2) / ((f2 + 424.36) * (f2 + 148693636.0))


def amp(spl: Column, ref: float = SPL_REF) -> Column:
    """SPL -> amplitude 10^(0.05*spl) * p0 (signal/tools.py:249-262)."""
    return F.pow(F.lit(10.0), 0.05 * spl) * ref


def spl_from_rms(rms: Column, ref: float = SPL_REF) -> Column:
    """20*log10(rms/p0) where positive (features.py:348-359)."""
    level = rms / ref
    return F.when(level > 0, 20.0 * F.log10(level)).otherwise(F.lit(0.0))


def fti16(x: Column) -> Column:
    """float -> int16 quantization with clipping (audio.py:141-150:
    ``clip(floor(x * 2^15), -2^15, 2^15 - 1)``)."""
    scaled = F.floor(x * 32768.0)
    return F.least(F.greatest(scaled, F.lit(-32768.0)),
                   F.lit(32767.0)).cast("short")


def limit_db(x: Column, bound_db: float) -> Column:
    """Dynamic-range limiter: clip |x| above the dB bound, keep sign
    (signal/tools.py:112-145 intent)."""
    bound = 10.0 ** (0.05 * bound_db)
    return F.when(x > bound, F.lit(bound)) \
            .when(x < -bound, F.lit(-bound)).otherwise(x)


# --- array<double> column helpers -------------------------------------------

def maxamp(arr: Column) -> Column:
    """max |x| (signal/tools.py:161-170)."""
    return F.array_max(F.transform(arr, lambda x: F.abs(x)))


def minamp(arr: Column) -> Column:
    """min |x| (signal/tools.py:173-182)."""
    return F.array_min(F.transform(arr, lambda x: F.abs(x)))


def l1_norm(arr: Column) -> Column:
    """sum |x| (tools.py:104-109)."""
    return F.aggregate(arr, F.lit(0.0),
                       lambda acc, x: acc + F.abs(x.cast("double")))


def energy_arr(arr: Column) -> Column:
    """sum x^2 (features.py:122-133) as array SQL."""
    return F.aggregate(arr, F.lit(0.0),
                       lambda acc, x: acc + x.cast("double") * x.cast("double"))


def rms_arr(arr: Column) -> Column:
    """sqrt(mean(x^2)) (features.py:158-167) as array SQL."""
    return F.sqrt(energy_arr(arr) / F.size(arr))


def normalize_arr(arr: Column) -> Column:
    """Scale to +-1 by max |x| (signal/tools.py:198-207)."""
    mx = maxamp(arr)
    return F.when(mx > 0, F.transform(arr, lambda x: x / mx)).otherwise(arr)


def zero_pad_arr(arr: Column, n: Column | int) -> Column:
    """Append n zeros (signal/tools.py:265-280)."""
    n = F.lit(n) if isinstance(n, int) else n
    pad = F.when(n > 0, F.array_repeat(F.lit(0.0), n.cast("int"))) \
           .otherwise(F.array().cast("array<double>"))
    return F.concat(arr.cast("array<double>"), pad)
