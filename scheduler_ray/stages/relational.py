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


#: broadcast ceiling for join_auto, in small-side ROWS.  ~5M dimension rows
#: ≈ a few hundred MB replicated into each map task's heap — past that the
#: small side is not broadcastable and the join must shuffle.  Same
#: auto-switch idea as canonicalize's `canon_broadcast_max_pairs`.
JOIN_BROADCAST_MAX_ROWS = 5_000_000


def join_auto(
    big: Dataset,
    small: "Dataset | pd.DataFrame",
    on: str | list[str],
    *,
    right_on: str | list[str] | None = None,
    how: str = "inner",
    suffix: str = "_r",
    broadcast_max_rows: int | None = None,
) -> Dataset:
    """Size-gated join (round-4 verdict item 5): broadcast the small side
    while it fits under ``broadcast_max_rows``; above the ceiling, fall
    back to Ray's hash-partitioned ``Dataset.join`` — the same
    broadcast→distributed escape hatch ``canonicalize_stage_joined`` uses
    for oversized alias sets.  At 100× sf the TPC-H ``customer`` table
    stops being a broadcastable side; this keeps ``q_segment_revenue``
    (and any dimension join) correct there without rewriting the query.

    ``right_on`` maps differently-named key columns; the right side is
    renamed to the left names in BOTH paths so the output schema is
    identical regardless of which path ran (the forced-ceiling
    equivalence pytest relies on that).
    """
    import ray.data as rd

    ceiling = (
        JOIN_BROADCAST_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows
    )
    on_keys = [on] if isinstance(on, str) else list(on)
    r_keys = (
        on_keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    is_ds = isinstance(small, Dataset)
    n_small = small.count() if is_ds else len(small)

    if n_small <= ceiling:
        sdf = small.to_pandas() if is_ds else small
        if r_keys != on_keys:
            sdf = sdf.rename(columns=dict(zip(r_keys, on_keys)))
        return broadcast_join(big, sdf, on=on, how=how, suffix=suffix)

    from .canonicalize import _drop_empty_blocks

    small_ds = small if is_ds else rd.from_pandas(small)
    if r_keys != on_keys:
        ren = dict(zip(r_keys, on_keys))

        def _rn(t):
            return t.rename_columns([ren.get(c, c) for c in t.column_names])

        small_ds = small_ds.map_batches(_rn, batch_format="pyarrow", zero_copy_batch=True)
    # each hash-join partition wants an aggregator actor (globally capped
    # at 64): more partitions than schedulable actors deadlocks on small
    # clusters (num_blocks() is unavailable on a lazy Dataset, so the CPU
    # count is the sizing signal)
    n_parts = min(64, max(2, int(ray.cluster_resources().get("CPU", 8))))
    join_type = {"inner": "inner", "left": "left_outer"}.get(how, how)
    return _drop_empty_blocks(
        _drop_empty_blocks(big).join(
            _drop_empty_blocks(small_ds),
            join_type=join_type,
            num_partitions=n_parts,
            on=tuple(on_keys),
            right_suffix=suffix,
        )
    )


def semi_join(big: Dataset, keys: pd.Series | np.ndarray, on: str, *, anti: bool = False) -> Dataset:
    """Semi/anti join by broadcasting the key set (SURVEY.md J3/J5)."""
    key_ref = ray.put(np.unique(np.asarray(keys)))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(key_ref)
        mask = batch[on].isin(ks)
        return batch[~mask] if anti else batch[mask]

    return big.map_batches(filt, batch_format="pandas")


def semi_join_auto(
    big: Dataset,
    keys: "Dataset | pd.Series | np.ndarray",
    on: str,
    *,
    anti: bool = False,
    broadcast_max_rows: int | None = None,
) -> Dataset:
    """Size-gated semi/anti join: broadcast the key set while it fits
    (the J3/D3 pattern — ``ray.put`` once, ``isin`` per batch); above the
    ceiling, shuffle instead — distinct keys (``sorted_agg_by``) marked
    with a constant column, ``left_outer`` hash join, filter on the
    marker.  Deduping the key side first keeps the big side's cardinality
    exact (a duplicated key would otherwise fan out join rows).  At 100 TB
    the crawl seen-set / staleness key set stops being broadcastable —
    this is the same escape hatch ``join_auto`` gives dimension joins.
    """
    import ray.data as rd

    ceiling = (
        JOIN_BROADCAST_MAX_ROWS if broadcast_max_rows is None else broadcast_max_rows
    )
    is_ds = isinstance(keys, Dataset)
    n_keys = keys.count() if is_ds else len(keys)
    if n_keys <= ceiling:
        arr = (
            keys.to_pandas().iloc[:, 0].to_numpy() if is_ds else np.asarray(keys)
        )
        return semi_join(big, arr, on, anti=anti)

    from .canonicalize import _drop_empty_blocks, sorted_agg_by

    keys_ds = keys if is_ds else rd.from_pandas(pd.DataFrame({on: np.asarray(keys)}))

    def as_marked(t):
        import pyarrow as pa

        col = t.column(0)
        return pa.table({on: col, "__sj_marker": pa.array([1] * len(col), pa.int8())})

    marked = sorted_agg_by(keys_ds, keys_ds.schema().names[0], {}).map_batches(
        as_marked, batch_format="pyarrow", zero_copy_batch=True
    )
    n_parts = min(64, max(2, int(ray.cluster_resources().get("CPU", 8))))
    joined = _drop_empty_blocks(big).join(
        _drop_empty_blocks(marked),
        join_type="left_outer",
        num_partitions=n_parts,
        on=(on,),
    )

    def finish(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        hit = pc.is_valid(t["__sj_marker"])
        keep = pc.invert(hit) if anti else hit
        return t.filter(keep).drop_columns(["__sj_marker"])

    return _drop_empty_blocks(
        joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    )


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

    # sorted_agg_by, not Ray's groupby aggregate: window cardinality is
    # keys × windows (hundreds of thousands at bench scale), the regime
    # where per-group Python accumulators dominate (measured 68 s for
    # 400k rows / 382k groups on the hopping variant; the sorted-agg
    # path does the same merge in ~3 s)
    from .canonicalize import sorted_agg_by

    partials = events.map_batches(bucket, batch_format="pandas")
    return sorted_agg_by(
        partials, [key, "window"], {"win_sum": "sum", "win_n": "sum"}
    )


def sessionize(
    events: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> Dataset:
    """Session windows per key: split each key's event stream on ts gaps
    > ``gap_s``.  A session is identified by its START epoch (unique per
    key, globally consistent without a per-key rank).

    Sort-based, NOT ``groupby().map_groups`` (one Python UDF call per
    key — at web scale one call per user): range-sort on (key, ts),
    sessionize each block with numpy ``reduceat`` segments, then stitch
    the O(#blocks) sessions that straddle block boundaries on the
    driver — a boundary session's fragments are exactly its blocks'
    first/last session rows (interior blocks wholly inside one session
    contribute their single row, which is both)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd

    from .canonicalize import _drop_empty_blocks

    srt = _drop_empty_blocks(events.sort([key, ts_col]))

    def block_sessions(t: pa.Table) -> pa.Table:
        epoch = (
            pc.divide(pc.cast(t[ts_col], pa.int64()), 1_000_000)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        u = t[key].to_numpy(zero_copy_only=False)
        n = len(u)
        brk = np.ones(n, bool)
        if n > 1:
            brk[1:] = (u[1:] != u[:-1]) | ((epoch[1:] - epoch[:-1]) > gap_s)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n) - 1
        return pa.table(
            {
                key: pa.array(u[starts]).cast(t.schema.field(key).type),
                "session_start": pa.array(epoch[starts], pa.int64()),
                "session_end": pa.array(epoch[ends], pa.int64()),
                "n_events": pa.array(
                    np.append(starts[1:], n) - starts, pa.int64()
                ),
            }
        )

    # materialized: the border pass and the drop_frag output are two
    # consumers — a lazy dataset would re-execute the sort per consumer
    # and could change block layout between them, desyncing the border
    # stitch (same fix as canonicalize.sorted_agg_by); sessions are
    # result-sized, never the raw event stream
    part = _drop_empty_blocks(
        srt.map_batches(
            block_sessions, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    ).materialize()

    def border_rows(t: pa.Table) -> pa.Table:
        pos = pa.array([2] if t.num_rows == 1 else [0, 1], pa.int64())
        rows = (
            t
            if t.num_rows <= 1
            else pa.concat_tables([t.slice(0, 1), t.slice(t.num_rows - 1, 1)])
        )
        return rows.append_column("pos", pos) if t.num_rows else t

    border = part.map_batches(
        border_rows, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).to_pandas()
    if not len(border):
        return part
    border = border.sort_values([key, "session_start"]).reset_index(drop=True)
    same_key = border[key].eq(border[key].shift())
    gap_ok = (border["session_start"] - border["session_end"].shift()) <= gap_s
    prev_tail = border["pos"].shift().isin([1, 2])
    cur_head = border["pos"].isin([0, 2])
    chain = (same_key & gap_ok & prev_tail & cur_head).fillna(False)
    if not chain.any():
        return part
    cid = (~chain).cumsum()
    border["_cid"] = cid
    sizes = border.groupby("_cid")["_cid"].transform("size")
    chained = border[sizes > 1]
    fix = chained.groupby("_cid", as_index=False).agg(
        **{
            key: (key, "first"),
            "session_start": ("session_start", "min"),
            "session_end": ("session_end", "max"),
            "n_events": ("n_events", "sum"),
        }
    ).drop(columns=["_cid"])
    # replaced fragments keyed by (key, session_start) — unique per key
    schema = part.take_batch(1, batch_format="pyarrow").schema
    fix_tbl = pa.table(
        {c: pa.array(fix[c], schema.field(c).type) for c in schema.names}
    )
    drop_keys = set(zip(chained[key], chained["session_start"]))

    def drop_frag(t: pa.Table) -> pa.Table:
        # composite membership: match on key AND start pairwise
        import pandas as pd_

        mask = ~pd_.MultiIndex.from_arrays(
            [t[key].to_numpy(zero_copy_only=False), t["session_start"].to_numpy()]
        ).isin(list(drop_keys))
        return t.filter(pa.array(mask))

    return _drop_empty_blocks(
        part.map_batches(
            drop_frag, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        ).union(rd.from_arrow(fix_tbl))
    )


def top_k(ds: Dataset, by: str, k: int, *, descending: bool = True) -> Dataset:
    """Global top-k: per-block partial top-k combiner, then one small sort.

    The full dataset is never totally sorted — each block contributes at
    most k rows to the final (driver-sized) sort.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.nlargest(k, by) if descending else batch.nsmallest(k, by)

    return ds.map_batches(partial, batch_format="pandas").sort(by, descending=descending).limit(k)


def topk_per_group(
    ds: Dataset,
    key: str,
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak: str | None = None,
) -> Dataset:
    """PER-GROUP top-k (``row_number() OVER (PARTITION BY key ORDER BY
    order_col) <= k`` semantics) — the training-data curation staple
    "keep the k best documents per source/label/domain".

    Scale shape: a per-block partial top-k combiner bounds every block's
    contribution to ``groups_in_block × k`` rows, so only those partials
    shuffle; the exact finish runs as ``sorted_map_groups`` over the
    partials (each surviving group holds ≤ k × #blocks rows — bounded,
    never the group's full corpus slice).  The input stream is never
    globally sorted and no group's raw rows ever co-locate.

    ``tiebreak`` (ascending) makes the selection deterministic when
    ``order_col`` has duplicates — without it, which of the tied rows
    survives is block-layout-dependent (same caveat as SQL's ROW_NUMBER
    without a unique ORDER BY suffix).
    """
    from .canonicalize import sorted_map_groups

    by = [order_col] + ([tiebreak] if tiebreak else [])
    ascending = [not descending] + ([True] if tiebreak else [])

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        # mergesort = stable, so equal keys keep a deterministic order
        return (
            df.sort_values(by, ascending=ascending, kind="mergesort")
            .groupby(key, sort=False)
            .head(k)
        )

    parts = ds.map_batches(_topk, batch_format="pandas", batch_size=None)
    return sorted_map_groups(parts, [key], _topk)


def hopping_window_agg(
    events: Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 3600,
    hop_s: int = 900,
) -> Dataset:
    """HOPPING (sliding) event-time windows per key: window starts at
    every multiple of ``hop_s``, each ``window_s`` long, so an event
    belongs to ``ceil(window_s / hop_s)`` overlapping windows
    (tumbling == hop_s = window_s).

    Same scale shape as :func:`tumbling_window_agg`: the explode +
    per-block partial aggregation bounds what shuffles to
    (keys × windows) per block — the raw event stream fans out only
    inside the map task, never across the exchange.  Bounded-batch
    semantics (no watermarks), floored-second event time.
    """
    n_win = -(-window_s // hop_s)

    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = (batch[ts_col].astype("int64") // 1_000_000).to_numpy()
        base = (epoch // hop_s) * hop_s  # latest window start containing t
        starts = base[:, None] - np.arange(n_win)[None, :] * hop_s
        valid = starts > (epoch[:, None] - window_s)
        idx = np.repeat(np.arange(len(batch)), n_win)[valid.ravel()]
        out = pd.DataFrame(
            {
                key: batch[key].to_numpy()[idx],
                "win_start": starts.ravel()[valid.ravel()],
                value_col: batch[value_col].to_numpy()[idx],
            }
        )
        return out.groupby([key, "win_start"], as_index=False).agg(
            win_sum=(value_col, "sum"), win_n=(value_col, "size")
        )

    from .canonicalize import sorted_agg_by

    partials = events.map_batches(bucket, batch_format="pandas")
    return sorted_agg_by(
        partials, [key, "win_start"], {"win_sum": "sum", "win_n": "sum"}
    )


def group_prefix_sum(
    ds: Dataset,
    key: str,
    value_col: str,
    order_col: str,
    *,
    out_col: str = "prefix_sum",
    exclusive: bool = False,
) -> Dataset:
    """Distributed per-group PREFIX SUM (SQL's ``SUM(v) OVER (PARTITION
    BY key ORDER BY order ROWS UNBOUNDED PRECEDING)``) — the scan
    primitive behind sequence packing ("fill 2048-token windows per
    source"), running budgets and cumulative quotas.

    Scale shape: one range-sort on (key, order) (materialized so both
    passes see identical blocks), a vectorized segmented cumsum per
    block, and an O(#blocks) driver chain: each block ships only its
    first/last key runs' totals; the driver forward-propagates the carry
    a straddling key accumulates across consecutive blocks and hands
    each block its first-key offset back (keyed by the block's first
    (key, order) row — ``order_col`` must be unique per key).  Rows
    never leave their block after the sort; no per-group Python.

    ``exclusive=True`` returns the sum of STRICTLY PRIOR rows (the
    packing form: ``window = prefix_before // budget``).
    """
    from .canonicalize import _drop_empty_blocks

    srt = _drop_empty_blocks(ds.sort([key, order_col])).materialize()

    def _segments(k: np.ndarray):
        brk = np.ones(len(k), bool)
        brk[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(brk)
        return starts, np.append(starts[1:], len(k))

    def summary(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    key: df[key],
                    "_ord": df[order_col],
                    "_run": pd.Series([], dtype="int64"),
                    "_pos": pd.Series([], dtype="int64"),
                }
            )
        k = df[key].to_numpy()
        v = df[value_col].to_numpy(np.int64)
        starts, ends = _segments(k)
        first_total = int(v[starts[0] : ends[0]].sum())
        last_total = int(v[starts[-1] : ends[-1]].sum())
        # pos 2 == single-key block (head and tail are the same run)
        if len(starts) == 1:
            return pd.DataFrame(
                {
                    key: [k[0]],
                    "_ord": [df[order_col].iloc[0]],
                    "_run": [first_total],
                    "_pos": [2],
                }
            )
        return pd.DataFrame(
            {
                key: [k[0], k[-1]],
                "_ord": [df[order_col].iloc[0], df[order_col].iloc[0]],
                "_run": [first_total, last_total],
                "_pos": [0, 1],
            }
        )

    border = srt.map_batches(
        summary, batch_format="pandas", batch_size=None
    ).to_pandas()
    # reassemble per-block summaries (blocks arrive in sorted order: a
    # single-key block is one _pos=2 row, a multi-key block a _pos=0
    # head + _pos=1 tail pair), then forward-propagate the carry a
    # straddling key accumulates across consecutive blocks
    rows = border.to_dict("records")
    blocks = []
    i = 0
    while i < len(rows):
        r = rows[i]
        if r["_pos"] == 2:
            blocks.append((r[key], r["_ord"], r["_run"], r[key], r["_run"], True))
            i += 1
        else:
            r2 = rows[i + 1]
            blocks.append((r[key], r["_ord"], r["_run"], r2[key], r2["_run"], False))
            i += 2
    offsets: dict = {}
    carry_key, carry = None, 0
    for fk, ford, ft, lk, lt, single in blocks:
        off = carry if fk == carry_key else 0
        if off:
            offsets[(fk, ford)] = off
        if single:
            carry_key, carry = fk, off + ft
        else:
            carry_key, carry = lk, lt
    off_ref = ray.put(offsets)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(**{out_col: pd.Series([], dtype="int64")})
        offs = ray.get(off_ref)
        k = df[key].to_numpy()
        v = df[value_col].to_numpy(np.int64)
        starts, ends = _segments(k)
        counts = ends - starts
        cum = np.cumsum(v)
        seg_base = np.repeat(cum[starts] - v[starts], counts)
        inc = cum - seg_base  # per-segment inclusive cumsum
        base = np.zeros(len(df), np.int64)
        head_off = offs.get((k[0], df[order_col].iloc[0]), 0)
        if head_off:
            base[starts[0] : ends[0]] = head_off
        out = df.copy()
        out[out_col] = base + (inc - v if exclusive else inc)
        return out

    return srt.map_batches(apply, batch_format="pandas", batch_size=None)


def zscore_per_group(
    ds: Dataset,
    key: str,
    value_col: str,
    *,
    out_col: str = "z",
    nd: int = 4,
) -> Dataset:
    """Per-group z-score normalization (``(x - mean_g) / stddev_samp_g``)
    — the feature-scaling / outlier-trim curation step.

    Scale shape (aggregate-then-rejoin enrichment): per-block
    ``(key, sum, sumsq, n)`` partials → ``sorted_agg_by`` (only one
    partial row per key per block shuffles) → the keys-cardinality
    moments table rejoins the raw stream through size-gated
    :func:`join_auto` (broadcast under the ceiling, partitioned hash
    join above).  The raw rows are never shuffled in the broadcast
    regime.  Sample stddev (n-1); single-row groups get NaN like SQL's
    ``STDDEV_SAMP`` returns NULL.
    """
    from .canonicalize import sorted_agg_by

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(np.float64)
        g = pd.DataFrame({key: b[key], "_s": v, "_ss": v * v, "_n": 1})
        return g.groupby(key, as_index=False).agg(
            _s=("_s", "sum"), _ss=("_ss", "sum"), _n=("_n", "sum")
        )

    stats = sorted_agg_by(
        ds.map_batches(moments, batch_format="pandas"),
        key,
        {"_s": "sum", "_ss": "sum", "_n": "sum"},
    )

    joined = join_auto(ds, stats, on=key)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(np.float64)
        s = b["_s"].to_numpy(np.float64)
        ss = b["_ss"].to_numpy(np.float64)
        n = b["_n"].to_numpy(np.float64)
        mean = s / n
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (ss - s * s / n) / (n - 1.0)
            std = np.sqrt(np.maximum(var, 0.0))
            z = np.round((v - mean) / std, nd)
        out = b.drop(columns=["_s", "_ss", "_n"]).reset_index(drop=True)
        out[out_col] = z
        return out

    return joined.map_batches(finish, batch_format="pandas")


def stratified_sample(
    ds: Dataset,
    key: str,
    num: int,
    den: int,
    order_col: str,
    *,
    broadcast_max_rows: int | None = None,
) -> Dataset:
    """Deterministic stratified downsampling: keep the first
    ``ceil(n_g * num / den)`` rows of each group in ``order_col`` order
    — the domain-mix rebalancing step ("cap every source at 10%").

    The fraction is a RATIO OF INTS so the per-group quota is exact
    integer arithmetic on both engines (a float ``frac * n`` differs
    between binary doubles and SQL decimals at boundaries).

    Scale shape: per-block ``(key, cnt)`` partials → ``sorted_agg_by``
    counts (one row per key) → counts rejoin the stream through
    size-gated :func:`join_auto` → per-block pruning caps each block's
    contribution at ``quota_g`` rows per group → ``sorted_map_groups``
    exact finish over the bounded survivors.  No global sort; raw rows
    shuffle only in the above-ceiling join regime.  ``order_col`` must
    be unique per group (e.g. a doc id) for a deterministic sample.
    """
    from .canonicalize import sorted_agg_by, sorted_map_groups

    def counts(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, as_index=False).size()
        return g.rename(columns={"size": "_n"})

    n_by_key = sorted_agg_by(
        ds.map_batches(counts, batch_format="pandas"), key, {"_n": "sum"}
    )
    joined = join_auto(
        ds, n_by_key, on=key, broadcast_max_rows=broadcast_max_rows
    )

    def head_quota(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(order_col, kind="mergesort")
        quota = (b["_n"].to_numpy(np.int64) * num + den - 1) // den
        keep = b.groupby(key, sort=False).cumcount().to_numpy() < quota
        return b[keep]

    parts = joined.map_batches(head_quota, batch_format="pandas", batch_size=None)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return head_quota(g).drop(columns=["_n"])

    return sorted_map_groups(parts, [key], finish)


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    how: str = "inner",
    direction: str = "backward",
    suffix: str = "_r",
) -> Dataset:
    """AS-OF join: for each left row, attach the single right row with
    the same ``key`` and the latest right ``ts_col`` <= the left row's
    (``direction="backward"``; ``"forward"`` takes the earliest >=).
    Semantics match DuckDB's ``ASOF JOIN`` (the time-series staple Ray
    Data has no native operator for).

    Scale shape: neither side is broadcast or materialized — both
    streams are tagged, union'd, and range-sorted ONCE on ``key``
    (``sorted_map_groups``), then each key's merge is a vectorized
    ``searchsorted`` over its sorted timestamps; groups that straddle
    block boundaries fall back to exact whole-group processing.  Only
    that one sort-shuffle moves data, the same cost as any keyed join.

    Timestamp columns are normalized to int64 (epoch µs for datetimes)
    in the output; the matched right timestamp comes back as
    ``f"{ts_col}{suffix}"``.  With duplicate right timestamps for one
    (key, ts) the surviving row is input-order-dependent — dedup the
    right side first (e.g. ``sorted_agg_by`` max) for determinism, as
    SQL's ASOF does implicitly by picking an arbitrary peer.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"unknown how {how!r}")

    import pyarrow as pa

    from .canonicalize import _drop_empty_blocks, sorted_map_groups

    _ls, _rs = left.schema(), right.schema()
    l_types = dict(zip(_ls.names, _ls.types))
    r_types = dict(zip(_rs.names, _rs.types))
    l_cols = list(_ls.names)
    r_val_cols = [c for c in _rs.names if c not in (key, ts_col)]
    # right columns colliding with left names get the suffix; the right
    # timestamp always comes along (for lag computation) under suffix
    r_out = {c: (c + suffix if c in l_cols else c) for c in r_val_cols}
    r_ts_out = ts_col + suffix
    out_cols = l_cols + [r_ts_out] + [r_out[c] for c in r_val_cols]

    def _ts_i64(s: pd.Series) -> np.ndarray:
        # explicit unit cast — pandas may hold datetime64[ns] OR [us]
        # depending on how the block arrived; astype("int64") alone would
        # silently yield different units
        if np.issubdtype(s.dtype, np.datetime64):
            return s.to_numpy().astype("datetime64[us]").astype(np.int64)
        return s.to_numpy(np.int64)

    def _arrow_type(field_type):
        return pa.int64() if pa.types.is_timestamp(field_type) else field_type

    # unified Arrow schema so the two sides union cleanly (pandas would
    # widen null int columns to float)
    uni = pa.schema(
        [pa.field(key, _arrow_type(l_types[key]))]
        + [pa.field(ts_col, pa.int64())]
        + [
            pa.field(c, _arrow_type(l_types[c]))
            for c in l_cols
            if c not in (key, ts_col)
        ]
        + [pa.field(r_ts_out, pa.int64())]
        + [pa.field(r_out[c], _arrow_type(r_types[c])) for c in r_val_cols]
        + [pa.field("__side", pa.int8())]
    )

    def tag_left(b: pd.DataFrame) -> pa.Table:
        cols = {}
        for f in uni:
            if f.name == "__side":
                cols[f.name] = pa.array(np.ones(len(b), np.int8))
            elif f.name == ts_col:
                cols[f.name] = pa.array(_ts_i64(b[ts_col]))
            elif f.name in b.columns:
                cols[f.name] = pa.array(b[f.name], f.type)
            else:
                cols[f.name] = pa.nulls(len(b), f.type)
        return pa.table(cols, schema=uni)

    def tag_right(b: pd.DataFrame) -> pa.Table:
        cols = {}
        inv = {v: k for k, v in r_out.items()}
        for f in uni:
            if f.name == "__side":
                cols[f.name] = pa.array(np.zeros(len(b), np.int8))
            elif f.name == key:
                cols[f.name] = pa.array(b[key], f.type)
            elif f.name == r_ts_out:
                cols[f.name] = pa.array(_ts_i64(b[ts_col]))
            elif f.name in inv:
                cols[f.name] = pa.array(b[inv[f.name]], f.type)
            else:
                cols[f.name] = pa.nulls(len(b), f.type)
        return pa.table(cols, schema=uni)

    tagged = _drop_empty_blocks(
        left.map_batches(tag_left, batch_format="pandas")
    ).union(_drop_empty_blocks(right.map_batches(tag_right, batch_format="pandas")))

    back = direction == "backward"

    r_cols_out = [r_ts_out] + [r_out[v] for v in r_val_cols]

    def _restore_dtypes(out: pd.DataFrame) -> pd.DataFrame:
        # the union carries nulls in the off-side columns, so pandas
        # widens int64 → float64 for the whole group frame; cast back
        # wherever the output is guaranteed non-null (left columns
        # always; right columns under how="inner")
        for c in out_cols:
            t = uni.field(c).type
            if pa.types.is_integer(t) and (how == "inner" or c not in r_cols_out):
                out[c] = out[c].astype(t.to_pandas_dtype())
        return out

    def _nullable(s: pd.Series) -> pd.Series:
        # how="left" emits right columns in a dtype that can hold a miss
        # CONSISTENTLY across groups (an int64 column must not be int in
        # all-matched groups and float in others — the block schemas
        # would diverge)
        return s.astype("float64") if s.dtype.kind in "iu" else s

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_l = g["__side"].to_numpy() == 1
        l = g[is_l]
        r = g[~is_l]
        out = l.drop(columns=["__side"]).reset_index(drop=True)
        if not len(l):
            return _restore_dtypes(out.reindex(columns=out_cols).iloc[:0])
        if not len(r):
            if how == "inner":
                return _restore_dtypes(out.reindex(columns=out_cols).iloc[:0])
            for c in r_cols_out:
                t = uni.field(c).type
                if pa.types.is_integer(t) or pa.types.is_floating(t):
                    out[c] = np.full(len(out), np.nan)
                else:
                    out[c] = pd.Series([None] * len(out), dtype=object)
            return _restore_dtypes(out[out_cols])
        lts = l[ts_col].to_numpy(np.int64)
        r_ts_raw = r[r_ts_out].to_numpy(np.int64)
        order = np.argsort(r_ts_raw, kind="stable")
        rts = r_ts_raw[order]
        rr = r.iloc[order]
        if back:
            idx = np.searchsorted(rts, lts, side="right") - 1
            ok = idx >= 0
        else:
            idx = np.searchsorted(rts, lts, side="left")
            ok = idx < len(rts)
        if how == "inner":
            out = out[ok].reset_index(drop=True)
            tk = idx[ok]
            for c in r_cols_out:
                out[c] = rr[c].to_numpy()[tk]
        else:
            tk = np.where(ok, idx, 0)
            for c in r_cols_out:
                s = _nullable(pd.Series(rr[c].to_numpy()[tk]))
                out[c] = s.where(pd.Series(ok)).values
        return _restore_dtypes(out[out_cols])

    return sorted_map_groups(tagged, [key], merge)


def interval_join(
    points: Dataset,
    intervals: "Dataset | pd.DataFrame",
    *,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    broadcast_max_rows: int | None = None,
    suffix: str = "_r",
) -> Dataset:
    """Range (interval-containment) join: every point row joins every
    interval row with ``start <= ts < end`` — no equality key at all,
    the shape Ray Data's hash ``join`` cannot express.

    Scale shape (the standard bin-replication recipe): each interval
    replicates to the coarse time bins it overlaps
    (``(end - start) / bin_width + 1`` copies — pick ``bin_width`` near
    the typical interval length to bound the fan-out); each point maps
    to exactly ONE bin, so the equi-join on the bin column introduces
    no duplicates; an exact containment filter finishes.  The join
    itself routes through :func:`join_auto`, so a small interval set
    broadcasts (``ray.put`` once) and a large one falls back to the
    partitioned hash join — the point stream never shuffles in the
    broadcast regime.

    All three range columns must be int64-comparable (cast timestamps
    to epoch µs upstream); ``end_col`` is exclusive.
    """
    import ray.data as rd

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b[start_col].to_numpy(np.int64) // bin_width
        e = (b[end_col].to_numpy(np.int64) - 1) // bin_width
        reps = (e - s + 1).clip(min=0)
        idx = np.repeat(np.arange(len(b)), reps)
        out = b.iloc[idx].reset_index(drop=True)
        # per-row bin offsets 0..reps-1, vectorized
        offs = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        out["__bin"] = s[idx] + offs
        return out

    if isinstance(intervals, Dataset):
        iv = intervals.map_batches(explode, batch_format="pandas")
    else:
        iv = rd.from_pandas(explode(intervals))

    def add_bin(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bin"] = b[ts_col].to_numpy(np.int64) // bin_width
        return b

    binned = points.map_batches(add_bin, batch_format="pandas")
    joined = join_auto(
        binned, iv, on="__bin", suffix=suffix, broadcast_max_rows=broadcast_max_rows
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        ts = b[ts_col].to_numpy(np.int64)
        keep = (b[start_col].to_numpy(np.int64) <= ts) & (
            ts < b[end_col].to_numpy(np.int64)
        )
        return b[keep].drop(columns=["__bin"])

    from .canonicalize import _drop_empty_blocks

    return _drop_empty_blocks(joined.map_batches(finish, batch_format="pandas"))


def quantile_per_group(
    ds: Dataset,
    key: str,
    value_col: str,
    q: float = 0.5,
    *,
    out_col: str | None = None,
    nd: int = 6,
) -> Dataset:
    """EXACT per-group continuous quantile (``quantile_cont`` / numpy
    'linear', the type-7 convention DuckDB and pandas share) — the
    distribution-stats curation op ("median document length per
    source").

    Scale shape: per-block ``(key, value) → count`` partials, a groupby
    over the HISTOGRAM (cardinality = keys × distinct values — bounded
    for ints/rounded floats, never the row count), then the interpolated
    quantile per key from cumulative counts.  The raw column never
    shuffles; for unbounded-cardinality floats, quantize ``value_col``
    first (the histogram is the contract).
    """
    out_col = out_col or f"q{int(q * 100)}"

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([key, value_col], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key, value_col])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    from .canonicalize import sorted_map_groups

    def qtile(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col)
        c = g["cnt"].to_numpy(np.int64)
        v = g[value_col].to_numpy(np.float64)
        n = int(c.sum())
        pos = q * (n - 1)
        cum = np.cumsum(c)
        lo = int(np.searchsorted(cum, np.floor(pos), side="right"))
        hi = int(np.searchsorted(cum, np.ceil(pos), side="right"))
        frac = pos - np.floor(pos)
        val = v[lo] * (1.0 - frac) + v[hi] * frac
        return pd.DataFrame({key: [g[key].iloc[0]], out_col: [round(val, nd)]})

    return sorted_map_groups(hist, [key], qtile)


def hash_sample(ds: Dataset, on: str, *, max_hex: str = "28", nchars: int = 2) -> Dataset:
    """Deterministic content-hash downsampling: keep rows whose
    ``md5(str(key))`` hex prefix sorts below ``max_hex`` — the standard
    "sample p% of the corpus reproducibly, independent of block layout /
    cluster size / run order" curation op (a seeded ``random_sample``
    changes membership whenever the partitioning does; a key-hash rule
    never does, so reruns, resumes and incremental pulls agree on the
    sample).

    ``nchars=2`` gives 256 equal-probability buckets; ``max_hex="28"``
    (0x28 = 40) keeps ≈ 40/256 = 15.6 %.  Lowercase-hex string order ==
    numeric order, so the rule is expressible identically in SQL
    (``substr(md5(k), 1, 2) < '28'``) — md5 is the one hash both engines
    share bit-for-bit, which is why it is the oracle contract here; the
    per-row digest cost is ~16 B of hashing per key (trivial next to any
    text kernel).  Embarrassingly parallel: a pure per-batch filter, no
    shuffle, no state.
    """
    import hashlib

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[on].astype(str)
        mask = np.fromiter(
            (
                hashlib.md5(k.encode("utf-8")).hexdigest()[:nchars] < max_hex
                for k in keys
            ),
            dtype=bool,
            count=len(b),
        )
        return b[mask]

    return ds.map_batches(filt, batch_format="pandas")


def ntile_per_group(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    k: int,
    *,
    out_col: str = "bucket",
) -> Dataset:
    """Distributed per-group NTILE (SQL ``NTILE(k) OVER (PARTITION BY key
    ORDER BY ...)``) — equal-count discretization ("bucket documents
    into length quartiles per source"), the rank-based complement of
    ``quantile_per_group``'s value-based cuts.

    Exact SQL remainder semantics: with n rows and k buckets the first
    ``n % k`` buckets hold ``n // k + 1`` rows, the rest ``n // k``.

    Scale shape: the composite order key packs into ONE int64 (bounds
    asserted — the ADVICE narrowing lesson: never pack silently), ranks
    come from ``group_prefix_sum`` (one range-sort + segmented cumsum +
    O(#blocks) carry chain — rows never leave their block after the
    sort), group counts are a bounded partial-aggregate table rejoined
    through size-gated ``join_auto``, and the bucket formula is pure
    vectorized arithmetic.  No per-group Python anywhere.
    """
    if not (1 <= len(order_cols) <= 2):
        raise ValueError("order_cols must be 1 or 2 columns")

    def pack(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if len(order_cols) == 1:
            b["_ord"] = b[order_cols[0]].astype("int64")
        else:
            hi = b[order_cols[0]].to_numpy(np.int64)
            lo = b[order_cols[1]].to_numpy(np.int64)
            if len(b) and (
                hi.min() < 0 or lo.min() < 0 or hi.max() >= 1 << 31 or lo.max() >= 1 << 32
            ):
                raise ValueError(
                    f"ntile_per_group: order cols exceed the 31+32-bit pack "
                    f"budget (max {hi.max() if len(hi) else 0}/{lo.max() if len(lo) else 0})"
                )
            b["_ord"] = (hi << 32) | lo
        b["_one"] = np.int64(1)
        return b

    ranked = group_prefix_sum(
        ds.map_batches(pack, batch_format="pandas"), key, "_one", "_ord", out_col="_rank"
    )

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key, as_index=False).size()
        return g.rename(columns={"size": "_n"})

    counts = (
        ranked.map_batches(count_partial, batch_format="pandas")
        .groupby(key)
        .aggregate(Sum("_n", alias_name="_n"))
    )

    joined = join_auto(ranked, counts, on=key)

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return b.assign(**{out_col: pd.Series([], dtype="int64")}).drop(
                columns=["_ord", "_one", "_rank", "_n"]
            )
        r = b["_rank"].to_numpy(np.int64) - 1  # 0-based rank
        n = b["_n"].to_numpy(np.int64)
        q, rem = n // k, n % k
        big_span = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
        in_big = r < big_span
        # guard the q==0 division (n < k: every row lands in a big bucket)
        q_safe = np.maximum(q, 1)
        bucket = np.where(in_big, r // (q + 1), rem + (r - big_span) // q_safe) + 1
        out = b.drop(columns=["_ord", "_one", "_rank", "_n"]).copy()
        out[out_col] = bucket.astype(np.int64)
        return out

    return joined.map_batches(bucketize, batch_format="pandas")


def hash_split(
    ds: Dataset,
    on: str,
    cuts: list[tuple[str, str]] | None = None,
    default_label: str = "test",
    *,
    out_col: str = "split",
) -> Dataset:
    """Deterministic train/val/test split assignment: label each row by
    where ``md5(str(key))``'s 2-hex prefix falls among ordered cut
    points — the dataset-split contract every training pipeline needs to
    be REPRODUCIBLE (membership is a pure function of the key: stable
    across block layouts, cluster sizes, reruns and incremental pulls,
    so a document can never migrate between train and eval when the
    corpus is re-partitioned — the leakage mode a seeded random split
    invites).

    ``cuts`` is ordered ``[(label, upper_hex_exclusive), ...]``; the
    default ``[("train", "cc"), ("val", "e6")]`` + ``"test"`` gives
    ≈ 80/10/10 (204/26/26 of 256 buckets).  Same md5-prefix rule as
    ``hash_split``'s filtering sibling ``hash_sample`` — expressible
    verbatim in SQL as a CASE over ``substr(md5(k), 1, 2)``.  Pure
    per-batch map, no shuffle, no state.
    """
    import hashlib

    cuts = [("train", "cc"), ("val", "e6")] if cuts is None else cuts
    bounds = [c[1] for c in cuts]
    labels = np.array([c[0] for c in cuts] + [default_label])
    if bounds != sorted(bounds):
        raise ValueError("hash_split cut points must be ascending")

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[on].astype(str)
        pref = [hashlib.md5(k.encode("utf-8")).hexdigest()[:2] for k in keys]
        idx = np.searchsorted(np.array(bounds), np.array(pref, dtype=object), side="right")
        out = b.copy()
        out[out_col] = labels[idx]
        return out

    return ds.map_batches(assign, batch_format="pandas")


def corr_per_group(
    ds: Dataset,
    key: str,
    x_col: str,
    y_col: str,
    *,
    out_col: str = "corr",
    nd: int = 4,
) -> Dataset:
    """Per-group Pearson correlation (SQL ``corr(x, y) GROUP BY key``) —
    the CO-moment aggregation pattern (``zscore_per_group`` covers
    single-variable moments): per-block ``(n, Σx, Σy, Σx², Σy², Σxy)``
    partials, a keys-cardinality groupby over those six numbers, and a
    vectorized closed-form finish.  The raw rows never shuffle and
    nothing driver-side scales with the corpus.

    Numerical contract: the closed form ``(nΣxy−ΣxΣy)/√((nΣx²−Σx²)(nΣy²−Σy²))``
    is algebraically DuckDB's ``covar_samp/(stddev·stddev)`` but
    catastrophically cancels when a column's magnitude dwarfs its
    variance (epoch timestamps!) — CENTER such columns first
    (correlation is translation-invariant; see ``q_event_corr``).
    Groups with zero variance yield NaN (SQL NULL).
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].to_numpy(np.float64)
        y = b[y_col].to_numpy(np.float64)
        t = pd.DataFrame(
            {key: b[key], "_n": 1, "_sx": x, "_sy": y, "_sxx": x * x, "_syy": y * y, "_sxy": x * y}
        )
        return t.groupby(key, as_index=False).sum()

    from .canonicalize import sorted_agg_by

    # sorted_agg_by, not Ray's groupby aggregate: sum is associative over
    # per-block partials, and the hash-shuffle reduce costs ~4× more wall
    # on bounded partial tables (the round-4 sorted-agg migration lesson)
    sums = sorted_agg_by(
        ds.map_batches(partial, batch_format="pandas"),
        key,
        {c: "sum" for c in ["_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"]},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["_n"].to_numpy(np.float64)
        sx, sy = b["_sx"].to_numpy(np.float64), b["_sy"].to_numpy(np.float64)
        sxx, syy, sxy = (
            b["_sxx"].to_numpy(np.float64),
            b["_syy"].to_numpy(np.float64),
            b["_sxy"].to_numpy(np.float64),
        )
        var = (n * sxx - sx * sx) * (n * syy - sy * sy)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(var > 0, (n * sxy - sx * sy) / np.sqrt(var), np.nan)
        return pd.DataFrame({key: b[key], out_col: np.round(r, nd)})

    return sums.map_batches(finish, batch_format="pandas")


def lag_per_group(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str = "lag",
) -> Dataset:
    """Distributed per-group LAG (SQL ``LAG(v) OVER (PARTITION BY key
    ORDER BY ...)``) — window NAVIGATION, the primitive behind deltas /
    time-since-last / change detection per entity.

    Scale shape (the ``group_prefix_sum`` border-carry pattern): one
    range-sort on (key, *order) — materialized so both passes see
    identical blocks — then a per-block vectorized shift within key
    segments.  Only each block's FIRST-row identity and LAST row's
    (key, value) ship to the driver (2 × #blocks rows): a block whose
    first key continues the previous block's last key receives that
    block's last value as the first row's lag.  Rows never leave their
    block after the sort; the first row of each group lags NaN (SQL
    NULL).  ``order_cols`` must be unique per key (add a tiebreak id,
    exactly like SQL's deterministic-LAG requirement).
    """
    from .canonicalize import _drop_empty_blocks

    srt = _drop_empty_blocks(ds.sort([key] + order_cols)).materialize()

    def _ident(df: pd.DataFrame, i: int) -> tuple:
        vals = [df[key].iloc[i]]
        for c in order_cols:
            v = df[c].iloc[i]
            vals.append(v.item() if hasattr(v, "item") else v)
        return tuple(vals)

    def summary(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"_which": pd.Series([], dtype="int64"), "_blob": []})
        import pickle

        first = _ident(df, 0)
        last = (df[key].iloc[-1], float(df[value_col].iloc[-1]))
        return pd.DataFrame(
            {"_which": [0, 1], "_blob": [pickle.dumps(first), pickle.dumps(last)]}
        )

    import pickle

    border = srt.map_batches(summary, batch_format="pandas", batch_size=None).to_pandas()
    rows = [pickle.loads(b) for b in border["_blob"]]
    # blocks arrive in sorted order: rows = [first0, last0, first1, last1, ...]
    offs: dict = {}
    prev_last = None
    for i in range(0, len(rows), 2):
        first, last = rows[i], rows[i + 1]
        if prev_last is not None and prev_last[0] == first[0]:
            offs[first] = prev_last[1]
        prev_last = last
    off_ref = ray.put(offs)

    def apply(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        if not len(df):
            out[out_col] = pd.Series([], dtype="float64")
            return out
        k = df[key].to_numpy()
        v = df[value_col].to_numpy(np.float64)
        lag = np.full(len(df), np.nan)
        same = k[1:] == k[:-1]
        lag[1:][same] = v[:-1][same]
        head = ray.get(off_ref).get(_ident(df, 0))
        if head is not None:
            lag[0] = head
        out[out_col] = lag
        return out

    return srt.map_batches(apply, batch_format="pandas", batch_size=None)
