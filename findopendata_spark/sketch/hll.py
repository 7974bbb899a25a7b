"""HyperLogLog registers + estimator, vectorized (p=8 → 256 registers).

Reference: datasketch ``HyperLogLogPlusPlus(p=8)`` over farmhash.hash64
(``findopendata/column_sketch.py:47-48``). Register-level equality with
datasketch is an explicit non-goal (different base hash + bias tables,
SURVEY §5.3); what the engine preserves is the reference's *distinct-count
rule* (``column_sketch.py:119-125``), which tests assert within HLL error
bounds. Registers merge by elementwise max — associative, so partial
register arrays combine across partitions like any Spark partial agg.
"""

from __future__ import annotations

import numpy as np

P = 8
M = 1 << P  # 256 registers
_ALPHA = 0.7213 / (1.0 + 1.079 / M)


def hll_partial(h64: np.ndarray) -> np.ndarray:
    """(256,) int8-ish register array from signed 64-bit hashes."""
    h = h64.astype(np.int64).view(np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)).astype(np.uint64)
    # exact bit_length via shift cascade (no float rounding)
    y = rest.copy()
    bl = np.zeros(len(y), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = y >> np.uint64(s)
        m = t != 0
        bl[m] += s
        y = np.where(m, t, y)
    bl += (y != 0).astype(np.int64)
    rank = np.minimum(64 - bl + 1, 64 - P + 1)
    regs = np.zeros(M, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_count(regs: np.ndarray) -> float:
    """Standard HLL estimate with linear-counting small-range correction."""
    regs = regs.astype(np.float64)
    raw = _ALPHA * M * M / np.sum(np.exp2(-regs))
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * M and zeros > 0:
        return M * np.log(M / zeros)
    return float(raw)
