"""Relational operators: broadcast joins, partial aggregation, windows.

The reference's joins are all small-side lookups (SURVEY.md §2.4), so the
primary join here is the broadcast hash join (``ray.put`` the dimension
table once, pandas merge per batch).  Wide aggregations pre-combine per
batch before the small ``groupby`` (SURVEY.md §2.5 / ray_guide partial
aggregation pattern).  Event-time windows follow the ordered-log recipe:
``groupby(key)`` + in-group pandas windowing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum


def broadcast_join(
    big: Dataset,
    small: pd.DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    suffix: str = "_r",
) -> Dataset:
    """Broadcast hash join: the small side ships once via ``ray.put`` and
    is merged per batch — no shuffle of the big side."""
    small_ref = ray.put(small)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(small_ref)
        return batch.merge(s, on=on, how=how, suffixes=("", suffix))

    return big.map_batches(join, batch_format="pandas")


def semi_join(big: Dataset, keys: pd.Series | np.ndarray, on: str, *, anti: bool = False) -> Dataset:
    """Semi/anti join by broadcasting the key set (SURVEY.md J3/J5)."""
    key_ref = ray.put(np.unique(np.asarray(keys)))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(key_ref)
        mask = batch[on].isin(ks)
        return batch[~mask] if anti else batch[mask]

    return big.map_batches(filt, batch_format="pandas")


def partial_groupby_sum(
    ds: Dataset,
    keys: list[str],
    sums: dict[str, str],
    count_alias: str | None = None,
) -> Dataset:
    """Pre-aggregate per batch, then groupby the (much smaller) partials.

    ``sums`` maps input column → output alias.  The wide input never
    shuffles; only one partial row per key per batch does.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        aggs = {alias: (col, "sum") for col, alias in sums.items()}
        if count_alias:
            aggs[count_alias] = (keys[0], "size")
        return batch.groupby(keys, as_index=False).agg(**aggs)

    partials = ds.map_batches(partial, batch_format="pandas")
    final_aggs = [Sum(alias, alias_name=alias) for alias in sums.values()]
    if count_alias:
        final_aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*final_aggs)


def tumbling_window_agg(
    events: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 3600,
) -> Dataset:
    """Tumbling event-time windows per key (ordered-log semantics; no
    watermarks — the input is a bounded batch, SURVEY.md §2.9).

    Implemented as a vectorized bucket computation + partial aggregation:
    window = floor(epoch_seconds / window_s).
    """

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch[ts_col].astype("int64") // 1_000_000
        w = (epoch // window_s).astype("int64")
        out = pd.DataFrame(
            {key: batch[key], "window": w, value_col: batch[value_col]}
        )
        return out.groupby([key, "window"], as_index=False).agg(
            win_sum=(value_col, "sum"), win_n=(value_col, "size")
        )

    partials = events.map_batches(bucket, batch_format="pandas")
    return partials.groupby([key, "window"]).aggregate(
        Sum("win_sum", alias_name="win_sum"), Sum("win_n", alias_name="win_n")
    )


def sessionize(
    events: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> Dataset:
    """Session windows per key: sort within group, split on ts gaps > gap_s
    (groupby + map_groups — the Ray Data streaming-window recipe)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        epoch = g[ts_col].astype("int64") // 1_000_000
        gap = epoch.diff().fillna(0) > gap_s
        sid = gap.cumsum().astype("int64")
        out = pd.DataFrame({key: g[key], "session": sid, "epoch": epoch})
        return out.groupby([key, "session"], as_index=False).agg(
            session_start=("epoch", "min"),
            session_end=("epoch", "max"),
            n_events=("epoch", "size"),
        )

    return events.groupby(key).map_groups(sessions, batch_format="pandas")


def top_k(ds: Dataset, by: str, k: int, *, descending: bool = True) -> Dataset:
    """Global top-k: per-block partial top-k combiner, then one small sort.

    The full dataset is never totally sorted — each block contributes at
    most k rows to the final (driver-sized) sort.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nlargest(k, by) if descending else batch.nsmallest(k, by)

    return ds.map_batches(partial, batch_format="pandas").sort(by, descending=descending).limit(k)
