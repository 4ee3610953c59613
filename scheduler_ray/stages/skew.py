"""Skew handling: salted keys for hot domains (SURVEY.md §4).

The page corpus is deliberately skewed — two hot domains
(waterdata.usgs.gov, water.noaa.gov) hold the majority of rows, mirroring
the USGS/NOAA skew in BASELINE.json's north_star.  The reference "handles"
this with a 3-day run timeout (dagster.yaml run_monitoring); we handle it
by salting: any per-key operation whose key distribution is hot gets a
``salt = hash(row) % k`` sub-key for the hot keys only, runs the expensive
phase per (key, salt), and merges the small per-salt partials.

For plain ``map_batches`` stages skew is a non-issue (Ray splits blocks by
size); salting matters for ``groupby``/``map_groups`` where one key =
one task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset
from ray.data.aggregate import Sum


def detect_hot_keys(ds: Dataset, key: str, *, hot_fraction: float = 0.05) -> list[str]:
    """Keys holding more than ``hot_fraction`` of rows (partial-agg count)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(key, as_index=False).size().rename(columns={"size": "n"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = counts["n"].sum()
    return sorted(counts.loc[counts["n"] > hot_fraction * total, key])


def add_salt(
    ds: Dataset,
    key: str,
    hot_keys: list[str],
    *,
    factor: int = 8,
    salt_col: str = "salt",
    id_cols: list[str] | None = None,
) -> Dataset:
    """Append a salt column: ``hash(row content) % factor`` for hot keys,
    0 otherwise.

    Deterministic under re-blocking: the hash covers the row's *content*
    (``id_cols`` if given, else every column) — never the batch-local
    positional index, which varies with Ray block boundaries (ADVICE r1).
    """
    hot = set(hot_keys)

    def salt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        cols = b[id_cols] if id_cols else b
        h = pd.util.hash_pandas_object(cols, index=False).to_numpy(np.uint64)
        is_hot = b[key].isin(hot).to_numpy()
        b[salt_col] = np.where(is_hot, (h % np.uint64(factor)).astype(np.int64), 0)
        return b

    return ds.map_batches(salt, batch_format="pandas")


def salted_group_sizes(
    ds: Dataset, key: str, *, hot_fraction: float = 0.05, factor: int = 8
) -> pd.DataFrame:
    """Demonstration/diagnostic: group sizes after salting hot keys —
    the max (key, salt) group size bounds the longest group task."""
    hot = detect_hot_keys(ds, key, hot_fraction=hot_fraction)
    salted = add_salt(ds, key, hot, factor=factor)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby([key, "salt"], as_index=False).size().rename(columns={"size": "n"})

    return (
        salted.map_batches(partial, batch_format="pandas")
        .groupby([key, "salt"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )


def salted_map_groups(
    ds: Dataset,
    key: str,
    group_fn,
    *,
    hot_keys: list[str],
    factor: int = 8,
    batch_format: str = "pandas",
    id_cols: list[str] | None = None,
) -> Dataset:
    """``groupby(key).map_groups(fn)`` with hot keys split into ``factor``
    salted sub-groups.  ``group_fn`` must be mergeable (applied per
    sub-group; caller merges per-key partials if needed)."""
    salted = add_salt(ds, key, hot_keys, factor=factor, id_cols=id_cols)
    return salted.groupby([key, "salt"]).map_groups(group_fn, batch_format=batch_format)
