"""Approximate distinct-count sketching (HyperLogLog).

At 100 TB a ``COUNT(DISTINCT)`` over a high-cardinality column (urls,
tokens, entity ids) is an all-to-all exchange of every distinct value;
``canonicalize.sorted_agg_by`` with empty aggs is the EXACT path and
stays the oracle-gated default.  This module is the documented
approximate alternative: each block reduces to a fixed 2**p-byte
register array, registers merge by elementwise max (associative and
layout-independent — the merged sketch is bit-identical no matter how
the input was partitioned), and only sketches ever move.  Standard
error ≈ 1.04/sqrt(2**p) (~0.8 % at p=14 for 16 KiB of state).

No oracle query: the estimate is approximate by construction, so it
cannot hash-match an exact SQL COUNT(DISTINCT); correctness is pinned
by pytest instead (layout-invariance is exact, the estimate is bounded
against the known error).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

#: multiplier of the standard error used by the pytest bound; 6 sigma
#: makes a false failure astronomically unlikely while still catching
#: any real estimator defect
ERROR_SIGMAS = 6.0


def _hash64(values) -> np.ndarray:
    """Stable unsigned 64-bit hashes of an arbitrary 1-d array."""
    s = pd.Series(np.asarray(values))
    return pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64)


def hll_block(values, p: int = 14) -> np.ndarray:
    """HLL register array (uint8, length 2**p) for one block of values."""
    h = _hash64(values)
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # rank = leading zeros of the remaining 64-p bits, + 1
    rank = np.zeros(len(h), np.uint8)
    cur = rest
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < np.uint64(1) << np.uint64(63 - shift + 1)
        # count leading zeros via binary descent
        rank[mask] += shift
        cur = np.where(mask, cur << np.uint64(shift), cur)
    rank = np.minimum(rank + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range linear counting."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting regime
    return float(est)


def approx_distinct(ds: Dataset, col: str, *, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col): per-block register arrays, one
    elementwise-max reduction, never a value exchange.  Each block ships
    exactly 2**p bytes regardless of its row count."""

    def sketch(b: pd.DataFrame) -> pd.DataFrame:
        regs = hll_block(b[col].to_numpy(), p)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    parts = ds.map_batches(sketch, batch_format="pandas").to_pandas()
    merged = np.zeros(1 << p, np.uint8)
    for raw in parts["regs"]:
        merged = hll_merge(merged, np.frombuffer(raw, np.uint8))
    return hll_estimate(merged)
