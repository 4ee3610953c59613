"""All driver-facing queries (one per operator family) + DuckDB oracles.

Each ``q_*`` takes an ``sf_dir`` and returns a Dataset / DataFrame; the
matching SQL in ``ORACLES`` runs on DuckDB views of the same parquet
tables.  Column names match exactly (the driver hashes columns sorted by
name).  Float aggregates are rounded identically on both sides.

Near-dup queries run over corpora with *planted* duplicates (deterministic
derivations of the base tables) so both the Ray result and the SQL oracle
are well-defined; see each query's docstring for the plant rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..stages import dedup as dd
from ..stages import relational as rel
from ..stages import similarity as sim
from ..stages import textops as tx
from ..stages.validate import validate_stage


def _read(sf_dir: str, table: str, columns=None) -> "rd.Dataset":
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_cols(df: pd.DataFrame, cols: list[str], nd: int = 2) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].round(nd)
    return df


# ----------------------------------------------------------- relational
def q_lineitem_pricing(sf_dir: str):
    """TPC-H-Q1-style pricing summary: partial per-batch aggregation →
    small groupby (A1/A3 pattern), floats rounded to 2 for the oracle."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(disc_price=b["l_extendedprice"] * (1 - b["l_discount"]))
        return b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            n_rows=("l_quantity", "size"),
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("n_rows", alias_name="n_rows"),
        )
        .to_pandas()
    )
    return _round_cols(out, ["sum_qty", "sum_base_price", "sum_disc_price"])


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_segment_revenue(sf_dir: str):
    """orders⋈customer → revenue per market segment, via the size-gated
    ``join_auto``: broadcast below the ceiling (customer fits at test
    scale), hash-partitioned ``Dataset.join`` above it (at 100× sf the
    customer table is no longer a broadcastable side — round-4 verdict
    item 5)."""
    customer = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = rel.join_auto(orders, customer, on="o_custkey", right_on="c_custkey")
    out = rel.partial_groupby_sum(
        joined, ["c_mktsegment"], {"o_totalprice": "revenue"}, count_alias="n_orders"
    ).to_pandas()
    return _round_cols(out, ["revenue"])


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_nation_region(sf_dir: str):
    nation = _read(sf_dir, "nation")
    region = _read(sf_dir, "region").to_pandas()
    out = rel.broadcast_join(
        nation, region.rename(columns={"r_regionkey": "n_regionkey"}), on="n_regionkey"
    )
    return out.select_columns(["n_name", "r_name"])


SQL_NATION_REGION = (
    "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey"
)


def q_top_orders(sf_dir: str):
    """Global top-k via per-block partial top-k combiner (O3 pattern)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return rel.top_k(ds, "o_totalprice", 10)


SQL_TOP_ORDERS = (
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 10"
)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (LLM-curation staple: drop every doc
    sharing ANY character 20-gram with the eval benchmark).  The
    benchmark here is derived deterministically from the corpus
    (doc_id % 50 == 0 — standing in for the small external eval set a
    real pipeline broadcasts); those docs trivially self-match and
    drop.  Engine: rolling UTF-32 hash probe + exact substring confirm
    (textops.decontaminate_stage) — the corpus streams, only the gram
    set ships."""
    from ..stages.textops import decontaminate_stage

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench_texts = (
        docs.map_batches(
            lambda b: b[b["doc_id"] % 50 == 0], batch_format="pandas"
        )
        .to_pandas()["text"]  # benchmark-sized, not corpus-sized
        .tolist()
    )
    clean = decontaminate_stage(docs, bench_texts, n=20)
    return clean.select_columns(["doc_id"])


# 20-char grams from every position of each benchmark doc; a document
# survives iff no gram occurs in its text (position() is 1-based; bench
# docs shorter than 20 chars contribute no grams via the range guard;
# 20 chars ≈ 3-4 words — boilerplate-heavy webtext makes 13-char grams
# degenerate: <2% of the corpus survived)
SQL_DECONTAMINATE = """
WITH grams AS (
  SELECT DISTINCT substr(text, CAST(pos AS INT), 20) AS g
  FROM (
    SELECT text, unnest(range(1, GREATEST(length(text) - 18, 1))) AS pos
    FROM documents WHERE doc_id % 50 = 0
  )
)
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM grams WHERE position(grams.g IN d.text) > 0)
"""


def q_top_docs_per_source(sf_dir: str):
    """PER-GROUP top-k (curation staple: keep the k longest documents per
    source) via the partial-combiner + sorted-segment finish —
    `relational.topk_per_group`; doc_id tiebreak for determinism."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return rel.topk_per_group(ds, "source", "n_chars", 5, tiebreak="doc_id")


SQL_TOP_DOCS_PER_SOURCE = """
SELECT doc_id, source, n_chars FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) <= 5
"""


def q_median_chars_per_source(sf_dir: str):
    """Exact per-source median document length via HISTOGRAM partials
    (relational.quantile_per_group): only (source, n_chars) counts
    shuffle, never the rows — distribution stats at corpus scale."""
    ds = _read(sf_dir, "documents", ["source", "n_chars"])
    return rel.quantile_per_group(ds, "source", "n_chars", 0.5, out_col="median_chars")


SQL_MEDIAN_CHARS_PER_SOURCE = """
SELECT source, ROUND(median(n_chars), 6) AS median_chars
FROM documents GROUP BY source
"""


def q_vocab_top_df(sf_dir: str):
    """Vocabulary document-frequency top-20 (tokenize → per-doc distinct
    → df count → deterministic top-k).  Scale shape: a document's rows
    live in one block, so per-BLOCK per-doc token dedup is globally
    exact; only (token, partial_df) rows shuffle, and the final sort
    runs over the aggregated vocabulary, not the corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b.set_index("doc_id")["text"].str.split(" ").explode()
        s = s[s.notna() & (s != "")]
        df = s.reset_index().drop_duplicates()  # per-doc distinct tokens
        out = df.groupby("text", as_index=False).size()
        return out.rename(columns={"text": "t", "size": "df"})

    counts = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("t")
        .aggregate(Sum("df", alias_name="df"))
    )
    return counts.sort(["df", "t"], descending=[True, False]).limit(20)


SQL_VOCAB_TOP_DF = """
SELECT t, COUNT(DISTINCT doc_id) AS df FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
) WHERE t <> '' GROUP BY t ORDER BY df DESC, t LIMIT 20
"""


def q_filter_revenue(sf_dir: str):
    """Vectorized filter + computed projection (M9/F-series pattern)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_discount"] > 0.05]
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"],
                "revenue": b["l_extendedprice"] * (1 - b["l_discount"]),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


SQL_FILTER_REVENUE = """
SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem WHERE l_discount > 0.05
"""


def q_event_windows(sf_dir: str):
    """Tumbling 1-hour event-time windows per user (streaming-shaped)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    out = rel.tumbling_window_agg(ev, window_s=3600).to_pandas()
    return _round_cols(out, ["win_sum"])


SQL_EVENT_WINDOWS = """
SELECT user_id, CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS window,
       ROUND(SUM(value), 2) AS win_sum, COUNT(*) AS win_n
FROM events GROUP BY 1, 2
"""


def q_event_windows_hopping(sf_dir: str):
    """HOPPING 1-hour windows every 15 min per user (each event lands in
    4 overlapping windows) — relational.hopping_window_agg."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    out = rel.hopping_window_agg(ev, window_s=3600, hop_s=900).to_pandas()
    return _round_cols(out, ["win_sum"])


# an event at floored-second tf belongs to window starts
# {(tf//900 - r) * 900 : r in 0..3} ∩ (tf - 3600, tf] — identical
# arithmetic to the engine's bucket kernel
SQL_EVENT_WINDOWS_HOPPING = """
SELECT user_id,
       (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 900 - r.range) * 900 AS win_start,
       ROUND(SUM(value), 2) AS win_sum, COUNT(*) AS win_n
FROM events, range(0, 4) r
WHERE (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 900 - r.range) * 900
      > CAST(FLOOR(EPOCH(ts)) AS BIGINT) - 3600
GROUP BY 1, 2
"""


def q_event_zscore(sf_dir: str):
    """Per-group z-score normalization (feature scaling) —
    ``relational.zscore_per_group``: per-block moment partials →
    ``sorted_agg_by`` → keys-cardinality moments table rejoins the raw
    stream through size-gated ``join_auto``; raw rows never shuffle in
    the broadcast regime."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    out = rel.zscore_per_group(ev, "user_id", "value").to_pandas()
    return out[["event_id", "user_id", "z"]]


SQL_EVENT_ZSCORE = """
SELECT event_id, user_id,
       ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 4) AS z
FROM events WINDOW w AS (PARTITION BY user_id)
"""


def q_doc_sample_stratified(sf_dir: str):
    """Deterministic stratified downsampling (domain-mix rebalancing:
    keep the first ceil(n/10) docs per source by doc_id) —
    ``relational.stratified_sample``; the quota is exact integer
    arithmetic on both engines (ratio of ints, never a float frac)."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out = rel.stratified_sample(docs, "source", 1, 10, "doc_id").to_pandas()
    return out[["doc_id", "source", "n_chars"]]


SQL_DOC_SAMPLE_STRATIFIED = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents)
WHERE rn <= CEIL(n * 1.0 / 10)
"""


def q_doc_rollup_counts(sf_dir: str):
    """ROLLUP(source, lang) counts + char sums — multi-level aggregation
    derived entirely from the finest-level partials: the corpus streams
    once into (source, lang) partials; the (source) and () levels
    re-aggregate those bounded partials, never the raw rows."""
    docs = _read(sf_dir, "documents", ["source", "lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["source", "lang"], as_index=False).agg(
            n=("n_chars", "size"), chars=("n_chars", "sum")
        )

    fine = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["source", "lang"])
        .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="chars"))
        .to_pandas()
    )
    mid = fine.groupby("source", as_index=False)[["n", "chars"]].sum()
    mid["lang"] = None
    top = pd.DataFrame(
        {
            "source": [None],
            "lang": [None],
            "n": [fine["n"].sum()],
            "chars": [fine["chars"].sum()],
        }
    )
    out = pd.concat([fine, mid, top], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    out["chars"] = out["chars"].astype("int64")
    return out[["source", "lang", "n", "chars"]]


SQL_DOC_ROLLUP_COUNTS = """
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY ROLLUP(source, lang)
"""


def q_heavy_hitter_words(sf_dir: str):
    """Exact top-30 corpus words via the two-pass heavy-hitters sketch
    (``textops.heavy_hitter_words``): per-block Misra-Gries truncation +
    slack certificate + exact candidate recount — only ≤ width survivor
    rows per block ever leave a block."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return tx.heavy_hitter_words(docs, 30)


SQL_HEAVY_HITTER_WORDS = """
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY 1
ORDER BY n DESC, word
LIMIT 30
"""


def q_doc_packing(sf_dir: str):
    """Sequence packing (fill 2000-char windows per source, docs in
    doc_id order) — ``relational.group_prefix_sum``'s distributed scan:
    ``pack_id = prefix_before // budget``.  One range-sort, per-block
    segmented cumsum, O(#blocks) driver carry chain."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out = rel.group_prefix_sum(
        docs, "source", "n_chars", "doc_id", out_col="_pb", exclusive=True
    ).to_pandas()
    out["pack_id"] = out["_pb"] // 2000
    return out[["doc_id", "source", "n_chars", "pack_id"]]


SQL_DOC_PACKING = """
SELECT doc_id, source, n_chars,
       CAST((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_chars)
            // 2000 AS BIGINT) AS pack_id
FROM documents
"""


def q_event_window_distinct(sf_dir: str):
    """Exact COUNT(DISTINCT event_type) per (user, 1-hour window) —
    composed from the sorted-agg primitives: per-block distinct partials
    → global distinct over the composite key (each (u, w, type) then
    lives exactly once) → per-block count partials → summed.  The raw
    event stream never shuffles; only (u, w, type) distinct rows do."""
    from ..stages.canonicalize import sorted_agg_by

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        epoch = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        out = pd.DataFrame(
            {
                "user_id": b["user_id"],
                "window": (epoch // 1_000_000) // 3600,
                "event_type": b["event_type"],
            }
        )
        return out.drop_duplicates()

    distinct = sorted_agg_by(
        ev.map_batches(tag, batch_format="pandas"),
        ["user_id", "window", "event_type"],
        {},
    )

    def cnt(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["user_id", "window"], as_index=False).size()
        return g.rename(columns={"size": "n_types"})

    return sorted_agg_by(
        distinct.map_batches(cnt, batch_format="pandas"),
        ["user_id", "window"],
        {"n_types": "sum"},
    )


SQL_EVENT_WINDOW_DISTINCT = """
SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600 AS window,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY 1, 2
"""


def q_events_asof(sf_dir: str):
    """AS-OF join (time-series enrichment): every click event picks up
    the user's most recent prior-or-equal purchase — the operator Ray
    Data has no native form for (``relational.asof_join``: one keyed
    range-sort, per-key vectorized searchsorted, no broadcast of either
    side).  The purchase side is deduped to unique (user, ts) first
    (max value) so the match is deterministic on both engines."""
    from ..stages.canonicalize import sorted_agg_by

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def clicks(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["event_type"] == "click"][["event_id", "user_id", "ts"]]

    def purchases(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["event_type"] == "purchase"][["user_id", "ts", "value"]]

    left = ev.map_batches(clicks, batch_format="pandas")
    right = sorted_agg_by(
        ev.map_batches(purchases, batch_format="pandas"),
        ["user_id", "ts"],
        {"value": "max"},
    )
    out = rel.asof_join(left, right, key="user_id", ts_col="ts").to_pandas()
    out["lag_us"] = out["ts"] - out["ts_r"]
    out["ref_value"] = out["value"].round(6)
    return out[["event_id", "user_id", "lag_us", "ref_value"]]


SQL_EVENTS_ASOF = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, MAX(value) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT l.event_id, l.user_id,
       epoch_us(l.ts) - epoch_us(r.ts) AS lag_us,
       ROUND(r.v, 6) AS ref_value
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_events_range_join(sf_dir: str):
    """Keyless RANGE (interval-containment) join: purchases falling
    inside any 10-minute outage window opened by an error event —
    ``relational.interval_join``'s bin-replication recipe (intervals
    replicate to coarse bins, points map to exactly one bin, equi-join
    on the bin, exact containment filter; the join routes through the
    size-gated ``join_auto``)."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def pts(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"] == "purchase"]
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "ts_us": b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            }
        )

    def ivs(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["event_type"] == "error"]
        su = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                "outage_id": b["event_id"].to_numpy(),
                "start_us": su,
                "end_us": su + 600_000_000,
            }
        )

    out = rel.interval_join(
        ev.map_batches(pts, batch_format="pandas"),
        ev.map_batches(ivs, batch_format="pandas"),
        ts_col="ts_us",
        start_col="start_us",
        end_col="end_us",
        bin_width=600_000_000,
    ).to_pandas()
    out["offset_us"] = out["ts_us"] - out["start_us"]
    return out[["event_id", "outage_id", "offset_us"]]


SQL_EVENTS_RANGE_JOIN = """
WITH p AS (SELECT event_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase'),
o AS (SELECT event_id AS outage_id, epoch_us(ts) AS start_us
      FROM events WHERE event_type = 'error')
SELECT p.event_id, o.outage_id, p.t - o.start_us AS offset_us
FROM p JOIN o ON p.t >= o.start_us AND p.t < o.start_us + 600000000
"""


def q_sessions(sf_dir: str):
    """Session windows (gap > 30 min) per user — sort-based distributed
    sessionization (stages/relational.py::sessionize); a session is
    identified by its start epoch (unique per user), which needs no
    per-user ordinal rank at scale."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return rel.sessionize(ev, gap_s=1800)


SQL_SESSIONS = """
WITH g AS (
  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch,
         CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - LAG(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) OVER w > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, epoch,
         CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY epoch
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session
  FROM g
)
SELECT user_id, MIN(epoch) AS session_start, MAX(epoch) AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, session
"""


def q_event_type_stats(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("event_type", as_index=False).agg(
            v_sum=("value", "sum"), n=("value", "size")
        )

    out = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("v_sum", alias_name="v_sum"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["avg_value"] = (out["v_sum"] / out["n"]).round(4)
    return _round_cols(out[["event_type", "n", "avg_value"]], [])


SQL_EVENT_TYPE_STATS = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value) / COUNT(*), 4) AS avg_value
FROM events GROUP BY event_type
"""


def q_brand_stats(sf_dir: str):
    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice"])
    out = (
        ds.groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Max("p_retailprice", alias_name="max_price"),
            Min("p_retailprice", alias_name="min_price"),
        )
        .to_pandas()
    )
    return _round_cols(out, ["max_price", "min_price"])


SQL_BRAND_STATS = """
SELECT p_brand, COUNT(*) AS n_parts, ROUND(MAX(p_retailprice), 2) AS max_price,
       ROUND(MIN(p_retailprice), 2) AS min_price
FROM part GROUP BY p_brand
"""


def q_distinct_segments(sf_dir: str):
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    return pd.DataFrame({"c_mktsegment": sorted(ds.unique("c_mktsegment"))})


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment FROM customer"


# ------------------------------------------------------------ dedup family
PLANT_OFFSET = 1_000_000


def _docs_with_near_dups(sf_dir: str, mod: int, suffix: str | None, min_chars: int = 0):
    """documents ∪ planted copies: doc_id%mod==0 (and n_chars≥min_chars)
    re-emitted at doc_id+PLANT_OFFSET, text + suffix (None = exact copy).
    Column-pruned read (streaming map — nothing materializes)."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars", "text"])

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        sel = (b["doc_id"] % mod == 0) & (b["n_chars"] >= min_chars)
        copies = b[sel].copy()
        copies["doc_id"] = copies["doc_id"] + PLANT_OFFSET
        if suffix:
            copies["text"] = copies["text"] + suffix
        return pd.concat([b, copies], ignore_index=True)

    return docs.map_batches(plant, batch_format="pandas")


def q_dedup_exact(sf_dir: str):
    """Exact dedup: smallest doc_id per identical text (D1 semantics)."""
    out = dd.exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"])).to_pandas()
    return pd.DataFrame({"doc_id": np.sort(out["doc_id"].to_numpy())})


SQL_DEDUP_EXACT = "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text"


def q_dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup pairs over the REAL near-duplicates the
    documents table contains.  32 bands × 4 rows (128 OPH perms) make
    detection of j ≥ 0.8 pairs certain to ~5e-8 while keeping the
    boilerplate-pair fire rate low, and every candidate is verified with
    exact 5-shingle Jaccard — so the result equals the exhaustive
    ≥-threshold pair set the DuckDB oracle computes (hash-verified at
    sf0.001/0.01/0.1)."""
    return dd.minhash_lsh_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), jaccard_threshold=0.8
    )


#: exhaustive 5-char-shingle Jaccard over all pairs (normalization matches
#: dedup._shingles: lowercase + whitespace collapse)
SQL_DEDUP_MINHASH = r"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), i, 5) AS s
  FROM documents,
       UNNEST(GENERATE_SERIES(1,
         GREATEST(LENGTH(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) - 4, 1))) AS t(i)
),
sizes AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id da, b.doc_id db, COUNT(*) i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da AS doc_a, db AS doc_b
FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.8
"""


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup detection with planted exact copies (doc_id%7==0
    re-emitted at doc_id+PLANT_OFFSET): a copy's simhash equals its
    source's (hamming 0), so restricting the hamming≤3 pair output to
    (a, a+PLANT_OFFSET) pairs yields EXACTLY the planted set — a full
    value oracle (round-1 verdict item 7; accidental collisions between
    unrelated docs can't satisfy b−a == PLANT_OFFSET because only
    doc_id%7==0 rows were planted).  simhash correctness on non-planted
    hamming is covered by pytest (test_simhash_*)."""
    corpus = _docs_with_near_dups(sf_dir, 7, None)
    pairs = dd.simhash_near_pairs(corpus, max_hamming=3).to_pandas()
    keep = (pairs["doc_b"] - pairs["doc_a"] == PLANT_OFFSET) & (
        pairs["doc_a"] % 7 == 0
    ) & (pairs["doc_a"] < PLANT_OFFSET)
    return pairs[keep].sort_values("doc_a").reset_index(drop=True)


SQL_DEDUP_SIMHASH = f"""
SELECT doc_id AS doc_a, doc_id + {PLANT_OFFSET} AS doc_b
FROM documents WHERE doc_id % 7 = 0
"""


def q_dedup_ngram(sf_dir: str):
    """Word-3-gram Jaccard near-dup pairs (threshold 0.6) over the real
    near-duplicates, via word-gram MinHash banding + exact verification."""
    return dd.ngram_jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), n=3, threshold=0.6
    )


#: exhaustive word-3-gram Jaccard over all pairs
SQL_DEDUP_NGRAM = r"""
WITH toks AS (
  SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM toks, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ts) - 2, 1))) AS t(i)
  WHERE LEN(ts) > 3
  UNION
  SELECT DISTINCT doc_id, array_to_string(ts, ' ') AS g FROM toks WHERE LEN(ts) <= 3
),
sizes AS (SELECT doc_id, COUNT(*) n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id da, b.doc_id db, COUNT(*) i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT da AS doc_a, db AS doc_b
FROM inter JOIN sizes sa ON sa.doc_id = da JOIN sizes sb ON sb.doc_id = db
WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.6
"""


# ------------------------------------------------------------- text ops
def q_text_tokens(sf_dir: str):
    return tx.token_count_stage(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TEXT_TOKENS = r"""
SELECT doc_id,
       LEN(regexp_extract_all(text, '\S+'))::BIGINT AS ws_tokens,
       LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+'))::BIGINT AS bpe_tokens
FROM documents
"""


def q_text_quality(sf_dir: str):
    return tx.quality_stage(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TEXT_QUALITY = r"""
SELECT doc_id,
       LENGTH(text)::BIGINT AS n_chars,
       LEN(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
       ROUND(LEN(regexp_extract_all(text, '[^\w\s]')) /
             GREATEST(LENGTH(text), 1)::DOUBLE, 6) AS punct_ratio,
       ROUND(LEN(regexp_extract_all(text, '\S')) /
             GREATEST(LEN(regexp_extract_all(text, '\S+')), 1)::DOUBLE, 6) AS mean_word_len
FROM documents
"""


def q_text_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (top-word share + duplicate
    word-2-gram fraction) — ``textops.repetition_batch``: one factorize +
    composite-int64 ``np.unique`` per batch, no per-row Python, no
    shuffle."""
    return tx.repetition_stage(_read(sf_dir, "documents", ["doc_id", "text"]))


SQL_TEXT_REPETITION = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
wc AS (
  SELECT doc_id, MAX(c) AS max_c, CAST(SUM(c) AS BIGINT) AS n_words
  FROM (SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY 1, 2)
  GROUP BY 1
),
gc AS (
  SELECT a.doc_id, COUNT(*) AS n_g,
         COUNT(DISTINCT a.word || ' ' || b.word) AS d_g
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1
)
SELECT wc.doc_id, wc.n_words,
       ROUND(wc.max_c * 1.0 / wc.n_words, 6) AS top_word_frac,
       ROUND(CASE WHEN COALESCE(gc.n_g, 0) > 0
                  THEN 1.0 - gc.d_g * 1.0 / gc.n_g ELSE 0.0 END, 6) AS dup_2gram_frac
FROM wc LEFT JOIN gc USING (doc_id)
"""


def _plant_stopword_docs(sf_dir: str):
    """documents ∪ planted pure-stopword docs: EVERY doc_id is re-emitted
    at doc_id+PLANT_OFFSET with text = the sorted stopword list of language
    ``[en,es,fr,de][doc_id % 4]`` — so the langid argmax over the planted
    rows is knowable a-priori, and the SQL oracle can derive the corpus."""
    langs = list(tx._STOPWORDS)
    texts = np.array([" ".join(sorted(tx._STOPWORDS[lang])) for lang in langs], object)

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        copies = pd.DataFrame(
            {
                "doc_id": b["doc_id"] + PLANT_OFFSET,
                "text": texts[(b["doc_id"] % 4).to_numpy()],
            }
        )
        return pd.concat([b[["doc_id", "text"]], copies], ignore_index=True)

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        plant, batch_format="pandas"
    )


def q_text_langid(sf_dir: str):
    """Stopword-profile language ID (actor-pool stage) over the base corpus
    ∪ planted pure-stopword docs (round-2 verdict item 7: full value
    oracle — the token/argmax rule is SQL-expressible because the corpus
    text is space-separated lowercase words)."""
    return tx.langid_stage(_plant_stopword_docs(sf_dir))


def sql_text_langid() -> str:
    langs = list(tx._STOPWORDS)
    plant_case = " ".join(
        f"WHEN {i} THEN '{' '.join(sorted(tx._STOPWORDS[lang]))}'"
        for i, lang in enumerate(langs)
    )
    hit_cols = ",\n    ".join(
        "SUM(CASE WHEN tok IN ({}) THEN 1 ELSE 0 END) AS {}".format(
            ", ".join(f"'{w}'" for w in sorted(tx._STOPWORDS[lang])), lang
        )
        for lang in langs
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PLANT_OFFSET},
         CASE doc_id % 4 {plant_case} END
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-zà-ÿäöüß]+')) AS tok
  FROM corpus
),
hits AS (
  SELECT doc_id,
    {hit_cols}
  FROM toks GROUP BY doc_id
)
SELECT c.doc_id,
       CASE WHEN h.doc_id IS NULL OR GREATEST(h.en, h.es, h.fr, h.de) = 0 THEN 'other'
            WHEN h.en >= h.es AND h.en >= h.fr AND h.en >= h.de THEN 'en'
            WHEN h.es >= h.fr AND h.es >= h.de THEN 'es'
            WHEN h.fr >= h.de THEN 'fr'
            ELSE 'de' END AS lang_pred
FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
"""


def q_text_fingerprint(sf_dir: str):
    """Rolling-hash fingerprint stage with planted exact copies
    (doc_id%11==0 re-emitted at doc_id+PLANT_OFFSET): a copy's fingerprint
    equals its source's, so grouping the stage output by fingerprint and
    keeping the (a, a+PLANT_OFFSET) pairs yields EXACTLY the planted set —
    a full value oracle in the dedup_simhash style (round-2 verdict item
    7).  Per-doc fingerprint values on the real corpus are pytest-covered
    (test_fingerprint_*)."""
    corpus = _docs_with_near_dups(sf_dir, 11, None)
    fps = tx.fingerprint_stage(corpus)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
            )
        frames = [
            pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})
            for ia, ib in dd.iter_pair_blocks(len(ids))
        ]
        return pd.concat(frames, ignore_index=True).astype("int64")

    from ..stages.canonicalize import sorted_map_groups

    out = sorted_map_groups(fps, ["fingerprint"], pairs).to_pandas()
    keep = (
        (out["doc_b"] - out["doc_a"] == PLANT_OFFSET)
        & (out["doc_a"] % 11 == 0)
        & (out["doc_a"] < PLANT_OFFSET)
    )
    return out[keep].sort_values("doc_a").reset_index(drop=True)


SQL_TEXT_FINGERPRINT = f"""
SELECT doc_id AS doc_a, doc_id + {PLANT_OFFSET} AS doc_b
FROM documents WHERE doc_id % 11 = 0
"""


# ----------------------------------------------------------- similarity
def _query_vectors(emb, n: int) -> pd.DataFrame:
    """The n query vectors (vec_id < n), filtered INSIDE map_batches — only
    n rows ever reach the driver (round-2 verdict item 3: the old
    ``emb.to_pandas()`` materialized the whole embeddings table)."""
    qdf = emb.map_batches(
        lambda b: b[b["vec_id"] < n], batch_format="pandas"
    ).to_pandas()
    return qdf.sort_values("vec_id")


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for query vectors vec_id<5 against the
    whole corpus (scores rounded to 4; ties broken by vec_id)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = _query_vectors(emb, 5)
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = sim.brute_force_topk(emb, queries, k=10)
    out["query_id"] = qdf["vec_id"].to_numpy()[out["query_id"].to_numpy()]
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


SQL_ANN_TOPK = """
SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       ROUND(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS score
FROM embeddings q CROSS JOIN embeddings c
WHERE q.vec_id < 5
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY q.vec_id
    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
             c.vec_id
) <= 10
"""


#: ann_lsh parameters — shared between the Ray pipeline and the SQL oracle
ANN_LSH = {"n_planes": 6, "n_tables": 4, "seed": 42, "k": 10}


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed ANN top-k (queries vec_id<5): only corpus vectors
    sharing a hyperplane-signature bucket with the query in ≥1 of the 4
    tables are scored.  Deterministic (seeded planes), so the DuckDB
    oracle reproduces the exact candidate set + ranking by materializing
    the plane matrix as literals."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = _query_vectors(emb, 5)
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = sim.lsh_ann_topk(
        emb,
        queries,
        qdf["vec_id"].to_numpy(),
        k=ANN_LSH["k"],
        n_planes=ANN_LSH["n_planes"],
        n_tables=ANN_LSH["n_tables"],
        seed=ANN_LSH["seed"],
    )
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


def sql_ann_lsh() -> str:
    """SQL twin of q_ann_lsh: same seeded planes as literal VALUES rows,
    signatures via list_dot_product sign bits, same candidate rule and
    (score DESC, vec_id) ranking."""
    planes = sim.hyperplanes(64, ANN_LSH["n_planes"], ANN_LSH["n_tables"], ANN_LSH["seed"])
    rows = []
    for t in range(ANN_LSH["n_tables"]):
        for p in range(ANN_LSH["n_planes"]):
            vec = ",".join(repr(float(x)) for x in planes[t, p])
            rows.append(f"({t},{p},[{vec}]::DOUBLE[])")
    values = ",\n".join(rows)
    k = ANN_LSH["k"]
    return f"""
WITH planes(tbl, pid, v) AS (VALUES
{values}
),
sigs AS (
  SELECT e.vec_id, p.tbl,
         STRING_AGG(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.v) > 0
                         THEN '1' ELSE '0' END, '' ORDER BY p.pid) AS sig
  FROM embeddings e CROSS JOIN planes p
  GROUP BY e.vec_id, p.tbl
),
cand AS (
  SELECT DISTINCT sq.vec_id AS query_id, sc.vec_id AS vec_id
  FROM sigs sq JOIN sigs sc ON sq.tbl = sc.tbl AND sq.sig = sc.sig
  WHERE sq.vec_id < 5
)
SELECT c.query_id, c.vec_id,
       ROUND(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS score
FROM cand c
JOIN embeddings q ON q.vec_id = c.query_id
JOIN embeddings e ON e.vec_id = c.vec_id
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY c.query_id
    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
             c.vec_id
) <= {k}
"""


#: ann_ivf parameters — shared between the Ray pipeline and the SQL oracle
ANN_IVF = {"n_centroids": 16, "nprobe": 4, "k": 10}


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed ANN top-k (queries vec_id<5): deterministic coarse
    quantizer (centroids = vectors vec_id<16), inverted-list probing of
    the 4 nearest centroids per query, exact cosine rank within the
    probed lists.  The scale path the SURVEY brief names alongside the
    LSH variant; fully SQL-reproducible."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = _query_vectors(emb, 5)
    queries = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = sim.ivf_ann_topk(
        emb,
        queries,
        qdf["vec_id"].to_numpy(),
        k=ANN_IVF["k"],
        n_centroids=ANN_IVF["n_centroids"],
        nprobe=ANN_IVF["nprobe"],
    )
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


SQL_ANN_IVF = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {ANN_IVF["n_centroids"]}
),
assign AS (
  SELECT e.vec_id, c.cid
  FROM embeddings e CROSS JOIN cents c
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY e.vec_id
      ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
               c.cid
  ) = 1
),
qprobe AS (
  SELECT q.vec_id AS query_id, c.cid
  FROM embeddings q CROSS JOIN cents c
  WHERE q.vec_id < 5
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
               c.cid
  ) <= {ANN_IVF["nprobe"]}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id FROM qprobe p JOIN assign a ON a.cid = p.cid
)
SELECT c.query_id, c.vec_id,
       ROUND(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS score
FROM cand c
JOIN embeddings q ON q.vec_id = c.query_id
JOIN embeddings e ON e.vec_id = c.vec_id
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY c.query_id
    ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
             c.vec_id
) <= {ANN_IVF["k"]}
"""


def q_embed_neardup(sf_dir: str):
    """Embedding-cosine near-duplicates (≥0.95) with planted exact copies
    (vec_id%5==0 re-emitted at vec_id+PLANT_OFFSET): cosine 1.0 exactly,
    while the max off-diagonal cosine of the base corpus is ~0.51."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        sel = b["vec_id"] % 5 == 0
        copies = b[sel].copy()
        copies["vec_id"] = copies["vec_id"] + PLANT_OFFSET
        return pd.concat([b, copies], ignore_index=True)

    corpus = emb.map_batches(plant, batch_format="pandas")
    return sim.near_duplicates_embedding(corpus, threshold=0.95)


SQL_EMBED_NEARDUP = f"""
SELECT vec_id AS vec_a, vec_id + {PLANT_OFFSET} AS vec_b
FROM embeddings WHERE vec_id % 5 = 0
"""


def q_curation_pipeline(sf_dir: str):
    """Composite training-data curation chain (the shape a 100-TB text
    pipeline runs end-to-end): quality scoring → threshold filter
    (n_tokens ≥ 40 and punct_ratio ≤ 0.05) → exact dedup keeping the
    smallest doc_id → surviving ids.  Every stage is a streaming
    map_batches / partial-agg op; nothing materializes the corpus."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        # score and filter in ONE pass, carrying text through — no driver
        # materialization of surviving ids (round-2 verdict item 2: the old
        # semi-join pulled every surviving doc_id to the driver)
        s = tx.quality_score_batch(b)
        mask = ((s["n_tokens"] >= 40) & (s["punct_ratio"] <= 0.05)).to_numpy()
        return b.loc[mask, ["doc_id", "text"]]

    survivors = docs.map_batches(keep, batch_format="pandas")
    out = dd.exact_dedup(survivors).to_pandas()
    return pd.DataFrame({"doc_id": np.sort(out["doc_id"].to_numpy())})


SQL_CURATION_PIPELINE = r"""
WITH q AS (
  SELECT doc_id, text,
         LEN(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
         ROUND(LEN(regexp_extract_all(text, '[^\w\s]')) /
             GREATEST(LENGTH(text), 1)::DOUBLE, 6) AS punct_ratio
  FROM documents
)
SELECT MIN(doc_id) AS doc_id FROM q
WHERE n_tokens >= 40 AND punct_ratio <= 0.05
GROUP BY text
"""


def q_embed_neardup_groups(sf_dir: str):
    """Near-duplicate CLUSTERS: LSH pair detection → connected components
    → one keeper (min vec_id) per cluster, mapping every member to it.
    With the planted exact copies each cluster is {x, x+PLANT_OFFSET} and
    the keeper is x — an exact SQL oracle."""
    from ..stages.canonicalize import _merge_pairs_idx

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        sel = b["vec_id"] % 5 == 0
        copies = b[sel].copy()
        copies["vec_id"] = copies["vec_id"] + PLANT_OFFSET
        return pd.concat([b, copies], ignore_index=True)

    corpus = emb.map_batches(plant, batch_format="pandas")
    pairs = sim.near_duplicates_embedding(corpus, threshold=0.95).to_pandas()
    # integer min-label union-find over the (small) pair set: numeric ids
    # are zero-padded so lexicographic == numeric order (min id = keeper)
    a = np.array([f"{v:012d}" for v in pairs["vec_a"]], object)
    b = np.array([f"{v:012d}" for v in pairs["vec_b"]], object)
    canon_idx, uniq = _merge_pairs_idx(a, b)
    changed = np.flatnonzero(canon_idx != np.arange(len(uniq)))
    return pd.DataFrame(
        {
            "vec_id": [int(uniq[i]) for i in changed],
            "keeper": [int(uniq[canon_idx[i]]) for i in changed],
        }
    ).sort_values("vec_id").reset_index(drop=True)


SQL_EMBED_NEARDUP_GROUPS = f"""
SELECT vec_id + {PLANT_OFFSET} AS vec_id, vec_id AS keeper
FROM embeddings WHERE vec_id % 5 = 0
"""


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (class prototypes) —
    ``similarity.label_centroids``: labels×dims partials per block, raw
    vectors never shuffle."""
    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    return sim.label_centroids(emb)


# float32 values are widened to double before averaging on both engines;
# summation-order error is ~1e-15 relative, far under the 6-decimal round
SQL_LABEL_CENTROIDS = """
SELECT label, dim, ROUND(AVG(CAST(v AS DOUBLE)), 6) AS c
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings)
GROUP BY 1, 2
"""


def q_label_counts(sf_dir: str):
    emb = _read(sf_dir, "embeddings", ["label"])
    return emb.groupby("label").aggregate(Count(alias_name="n"))


SQL_LABEL_COUNTS = "SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label"


# ---------------------------------------------------------- kg: validate
def q_kg_validate(sf_dir: str):
    """SHACL-subset validation verdict per page (M2): valid ⇔ the page has
    a parseable JSON-LD block satisfying the HY_HydroLocation shape."""
    from ..corpus import ensure_pages_fixture
    from ..stages.extract import extract_stage
    from . import flagship

    fx = ensure_pages_fixture(sf_dir)
    ex = extract_stage(flagship.read_pages(fx))
    return validate_stage(ex).select_columns(["url", "valid"])


def sql_kg_validate() -> str:
    from ..oracles import CONFORMS, URL

    # valid ⇔ block present, parseable AND shape-conformant (round-4:
    # %37 two-name maxCount, %41 lowercase not/xone — oracles.CONFORMS)
    return f"SELECT {URL} AS url, {CONFORMS} AS valid FROM documents"


# ------------------------------------------------- exports / spatial / mm
def q_feature_table(sf_dir: str):
    """GeoParquet-shaped feature table (S8): pivot of the canonical graph
    to one row per subject with name/description/bbox columns (geometry
    and hilbert key excluded here — not SQL-reconstructable)."""
    from . import export as ex
    from . import flagship
    from ..corpus import ensure_pages_fixture

    fx = ensure_pages_fixture(sf_dir)
    canon = flagship.run_flagship(fx)
    feats = ex.feature_table(canon)
    return feats.select_columns(
        ["id", "geoconnex_sitemap", "feature_name", "feature_description",
         "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"]
    )


def q_feature_table_grouped(sf_dir: str):
    """Feature table via the contiguity-free GROUPED pivot (ROADMAP §4):
    the canonical stream is deliberately scattered (global sort by
    object) so no document's rows share a batch, then pivoted with the
    join-based blank-node resolution — same oracle as feature_table."""
    from . import export as ex
    from . import flagship
    from ..corpus import ensure_pages_fixture

    fx = ensure_pages_fixture(sf_dir)
    canon = flagship.run_flagship(fx).materialize().sort("obj")
    feats = ex.feature_table(canon, pivot_mode="grouped")
    return feats.select_columns(
        ["id", "geoconnex_sitemap", "feature_name", "feature_description",
         "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"]
    )


def sql_feature_table() -> str:
    from ..oracles import CONFORMS, DESC, LAT, LON, NAME, PID

    # non-conforming docs (oracles.CONFORMS) have no canonical payload
    # rows, so they never reach the pivot
    return f"""
SELECT {PID} AS id, source AS geoconnex_sitemap, {NAME} AS feature_name,
       {DESC} AS feature_description,
       CAST({LON} AS DOUBLE) / 1000.0 AS bbox_xmin,
       CAST({LAT} AS DOUBLE) / 1000.0 AS bbox_ymin,
       CAST({LON} AS DOUBLE) / 1000.0 AS bbox_xmax,
       CAST({LAT} AS DOUBLE) / 1000.0 AS bbox_ymax
FROM documents WHERE {CONFORMS}
"""


def _registry_broadcast(docs, columns: list) -> pd.DataFrame:
    """Broadcast-side registry columns, derived DISTRIBUTED (round-3
    verdict item 5): each batch computes its registry partial inside
    ``map_batches`` and projects to ``columns``; the driver only
    concatenates the narrow result — exactly the frame that gets
    ``ray.put`` as the join's broadcast side, nothing wider.  (In this
    harness the "registry" is deliberately corpus-derived; a production
    registry is a separate small table read directly.)"""
    from ..corpus import registry_from_documents

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return registry_from_documents(b)[columns]

    return docs.map_batches(derive, batch_format="pandas").to_pandas()


def q_spatial_join(sf_dir: str):
    """bbox containment join (J1's spatial flavor): each document's point
    probes the broadcast grid-bucketed registry bboxes."""
    from ..stages.spatial import bbox_contains_join

    # the registry derivation needs only 3 narrow columns — never pull
    # the text column to the driver for the broadcast side
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def to_points(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "x": ((b["doc_id"] * 37) % 180000 - 90000) / 1000.0,
                "y": ((b["doc_id"] * 53) % 360000 - 180000) / 1000.0,
            }
        )

    points = docs.map_batches(to_points, batch_format="pandas")
    boxes = _registry_broadcast(
        docs, ["id", "bbox_xmin", "bbox_ymin", "bbox_xmax", "bbox_ymax"]
    )
    out = bbox_contains_join(points, boxes)
    return out.select_columns(["doc_id", "box_id"])


SQL_SPATIAL_JOIN = """
SELECT p.doc_id AS doc_id,
       'https://pids.geoconnex.dev/' || b.source || '/' || CAST(b.doc_id AS VARCHAR) AS box_id
FROM documents p CROSS JOIN documents b
WHERE ((p.doc_id*37) % 180000 - 90000) / 1000.0
        BETWEEN ((b.doc_id*37) % 180000 - 90000) / 1000.0
            AND ((b.doc_id*37) % 180000 - 90000) / 1000.0 + 0.01
  AND ((p.doc_id*53) % 360000 - 180000) / 1000.0
        BETWEEN ((b.doc_id*53) % 360000 - 180000) / 1000.0
            AND ((b.doc_id*53) % 360000 - 180000) / 1000.0 + 0.01
"""


def q_polygon_join(sf_dir: str):
    """Geometry-true containment join (J1's real-geometry flavor): each
    document's point probes the registry's diamond RINGS — grid candidates
    from the ring bboxes, exact ray-casting verify (stages/spatial.py
    PolygonStore).  The rings are built so that the containment predicate
    is, in integer milli-units, 14|dxm| + 18|dym| ≤ 63 (even vs odd ⇒ no
    boundary cases), which the DuckDB oracle evaluates exactly."""
    from ..stages.spatial import polygon_contains_join

    # narrow broadcast-side read (see q_spatial_join)
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def to_points(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "x": ((b["doc_id"] * 37) % 180000 - 90000) / 1000.0,
                "y": ((b["doc_id"] * 53) % 360000 - 180000) / 1000.0,
            }
        )

    points = docs.map_batches(to_points, batch_format="pandas")
    polys = _registry_broadcast(docs, ["id", "ring_wkb"])
    out = polygon_contains_join(points, polys)
    return out.select_columns(["doc_id", "poly_id"])


SQL_POLYGON_JOIN = """
SELECT p.doc_id AS doc_id,
       'https://pids.geoconnex.dev/' || b.source || '/' || CAST(b.doc_id AS VARCHAR) AS poly_id
FROM documents p CROSS JOIN documents b
WHERE 14*ABS(((p.doc_id*37) % 180000 - 90000) - ((b.doc_id*37) % 180000 - 90000) - 2)
    + 18*ABS(((p.doc_id*53) % 360000 - 180000) - ((b.doc_id*53) % 360000 - 180000) - 1) <= 63
"""


def q_mm_metadata(sf_dir: str):
    """Multimodal metadata over the opaque binary payload column (the
    pages' html stands in for media bytes): byte length + sha256."""
    from ..corpus import ensure_pages_fixture
    from ..stages.multimodal import media_metadata_stage
    from . import flagship

    fx = ensure_pages_fixture(sf_dir)
    pages = flagship.read_pages(fx, columns=["url", "html"])
    return media_metadata_stage(pages)


def sql_mm_metadata() -> str:
    from ..oracles import (
        CLOSE_TAG,
        D,
        EXTRACTED,
        FOURTH_BLOCK,
        OPEN_TAG,
        SECOND_BLOCK,
        THIRD_BLOCK,
        URL,
        WRAP_PRE,
        WRAP_SUF,
    )

    # EXTRACTED already carries the content wrapper (byte-identity
    # contract); blocks 2-4 are payload-only fragments, so the per-page
    # wrapper bytes are re-applied here (corpus.pages_from_documents).
    def _wrapped(block: str) -> str:
        return (
            f"COALESCE(({OPEN_TAG}) || ({WRAP_PRE}) || ({block}) || "
            f"({WRAP_SUF}) || ({CLOSE_TAG}), '')"
        )

    html = (
        f"'<html><head><title>Feature ' || {D} || '</title>' || "
        f"COALESCE(({OPEN_TAG}) || ({EXTRACTED}) || ({CLOSE_TAG}), '') || "
        f"{_wrapped(SECOND_BLOCK)} || "
        f"{_wrapped(THIRD_BLOCK)} || "
        f"{_wrapped(FOURTH_BLOCK)} || "
        "'</head><body><p>' || text || '</p></body></html>'"
    )
    return f"""
SELECT {URL} AS media_id,
       octet_length(encode({html})) AS n_bytes,
       sha256({html}) AS sha256,
       'application/octet-stream' AS media_type
FROM documents
"""


def q_event_props(sf_dir: str):
    """F6: per-row JSON parse with fallback — extract props.k (invalid →
    null), vectorized per batch."""
    import json

    ev = _read(sf_dir, "events", ["event_id", "props"])

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        ks = []
        for p in b["props"]:
            try:
                v = json.loads(p).get("k")
                ks.append(int(v) if v is not None else None)
            except (ValueError, TypeError, AttributeError):
                ks.append(None)
        return pd.DataFrame({"event_id": b["event_id"], "k": pd.array(ks, dtype="Int64")})

    return ev.map_batches(parse, batch_format="pandas")


SQL_EVENT_PROPS = """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
"""


def q_kg_error_metrics(sf_dir: str):
    """M6/A3 lineage metrics: corpus-wide page / no-jsonld / parse-error
    counts via per-batch partial counters (the exit-3 non-fatal
    accounting the manifests carry per partition)."""
    from ..corpus import ensure_pages_fixture
    from ..stages.expand import expansion_metrics_batch
    from ..stages.extract import extract_stage
    from . import flagship

    fx = ensure_pages_fixture(sf_dir)
    ex = extract_stage(flagship.read_pages(fx))
    partials = ex.map_batches(expansion_metrics_batch, batch_format="pyarrow")
    df = partials.to_pandas()
    return pd.DataFrame(
        {
            "pages": [int(df["pages"].sum())],
            "no_jsonld": [int(df["no_jsonld"].sum())],
            "parse_errors": [int(df["parse_errors"].sum())],
        }
    )


SQL_KG_ERROR_METRICS = """
SELECT COUNT(*) AS pages,
       CAST(SUM(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS no_jsonld,
       CAST(SUM(CASE WHEN doc_id % 17 <> 0 AND doc_id % 19 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS parse_errors
FROM documents
"""


def q_feature_mercator(sf_dir: str):
    """Feature table reprojected EPSG:4326 → EPSG:3857 (M8 — a REAL
    closed-form CRS transform, not just declared metadata; the reference
    only ever declares 4326, reference userCode/assetGroups/export.py:358).
    Streaming map_batches over the spherical-mercator kernel."""
    from ..stages.spatial import reproject_stage

    feats = q_feature_table(sf_dir)
    out = reproject_stage(
        feats, src="EPSG:4326", dst="EPSG:3857",
        x_col="bbox_xmin", y_col="bbox_ymin", out_x="x_3857", out_y="y_3857",
    )

    # Quantize to 6 decimals (≈ µm in meters) on BOTH sides of the oracle
    # gate: numpy's ln/tan and DuckDB's libm disagree in the last ulp for
    # some latitudes, so raw float64 hashes diverge (round-4 verdict #1).
    def round6(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(x_3857=b["x_3857"].round(6), y_3857=b["y_3857"].round(6))

    return out.select_columns(["id", "x_3857", "y_3857"]).map_batches(
        round6, batch_format="pandas"
    )


def sql_feature_mercator() -> str:
    from ..oracles import CONFORMS, LAT, LON, PID

    # identical closed-form spherical web-mercator math in SQL:
    # x = R*radians(lon); y = R*ln(tan(pi/4 + radians(lat)/2)); R = 6378137
    # ROUND(..., 6) mirrors the engine-side quantization (see
    # q_feature_mercator) so last-ulp libm differences cannot flip the hash.
    return f"""
SELECT {PID} AS id,
       ROUND(6378137.0 * radians(CAST({LON} AS DOUBLE) / 1000.0), 6) AS x_3857,
       ROUND(6378137.0 * ln(tan(pi() / 4.0 + radians(CAST({LAT} AS DOUBLE) / 1000.0) / 2.0)), 6) AS y_3857
FROM documents WHERE {CONFORMS}
"""


def q_kg_index_lookup(sf_dir: str):
    """Triple-permutation index build + pruned range lookup (the native
    analogue of the reference's QLever index, S10 — reference
    userCode/assetGroups/export.py:194-235): canonical graph → three
    globally-sorted permutation layouts → SPO range probe for one
    source's subject prefix, reading only manifest-intersecting files."""
    import hashlib

    from . import flagship
    from . import index as tidx
    from ..corpus import ensure_pages_fixture

    fx = ensure_pages_fixture(sf_dir)
    canon = flagship.run_flagship(fx)
    out = f"/tmp/scheduler_ray_index/{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    tidx.build_triple_index(canon, out)
    prefix = "https://pids.geoconnex.dev/src5/"
    return tidx.lookup(out, "spo", prefix, prefix + "￿")


def sql_kg_index_lookup() -> str:
    from ..oracles import CANONICAL_TRIPLES_SQL

    return f"""
SELECT * FROM ({CANONICAL_TRIPLES_SQL})
WHERE subj LIKE 'https://pids.geoconnex.dev/src5/%'
"""


# ------------------------------------------------- round-5 eighth pass:
# deterministic sampling, TF-IDF salience, distribution-gated filtering
def q_doc_sample_hash(sf_dir: str):
    """Deterministic hash-based downsampling (``relational.hash_sample``):
    keep docs whose md5(doc_id) hex prefix < 0x28 (≈ 15.6 %).  Unlike a
    seeded random sample, membership is a pure function of the KEY — the
    sample is identical across block layouts, cluster sizes, reruns and
    resumes, which is what makes it usable as a corpus-curation contract
    (and expressible as the same rule in SQL)."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return rel.hash_sample(docs, "doc_id", max_hex="28")


SQL_DOC_SAMPLE_HASH = """
SELECT doc_id, source, n_chars FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
"""


def q_doc_tfidf_top(sf_dir: str):
    """Top-3 salient terms per document by TF-IDF — the curation op
    behind keyword extraction / topic tagging at corpus scale.

    Ranking contract: (tf DESC, df ASC, token ASC) — an EXACT integer
    ordering (encoded as one int64 rank key ``tf·(N+1) − df``), so which
    rows survive the top-k can never depend on last-ulp ``ln`` behavior;
    the float tfidf value itself is output-only, rounded to 6 like every
    float the oracle hashes.

    Scale shape: one pass over the text builds (doc, token, tf) partials
    (exact per block — a document is a single input row, so its tokens
    never straddle batches); the materialized tf stream feeds both the
    vocabulary-DF aggregate (bounded by vocabulary size, not corpus
    size) and the size-gated ``join_auto`` back onto itself; the top-k
    finish is the bounded-partials ``topk_per_group``.  Raw text shuffles
    nowhere."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = int(docs.count())

    def tf_explode(b: pd.DataFrame) -> pd.DataFrame:
        s = b.set_index("doc_id")["text"].str.split(" ").explode()
        s = s[s.notna() & (s != "")]
        g = s.reset_index().groupby(["doc_id", "text"], as_index=False).size()
        return g.rename(columns={"text": "t", "size": "tf"})

    # materialized: consumed twice (DF aggregate + join), and re-executing
    # the tokenizer would re-read every byte of text
    tf = docs.map_batches(tf_explode, batch_format="pandas").materialize()

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("t", as_index=False).size().rename(columns={"size": "df"})

    dfds = (
        tf.map_batches(df_partial, batch_format="pandas")
        .groupby("t")
        .aggregate(Sum("df", alias_name="df"))
    )

    joined = rel.join_auto(tf, dfds, on="t")

    def add_rank(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["rank"] = b["tf"].astype("int64") * (n_docs + 1) - b["df"].astype("int64")
        return b

    ranked = joined.map_batches(add_rank, batch_format="pandas")
    top = rel.topk_per_group(ranked, "doc_id", "rank", 3, tiebreak="t")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        tfv = b["tf"].to_numpy(np.float64)
        dfv = b["df"].to_numpy(np.float64)
        out = b[["doc_id", "t"]].copy()
        out["tf"] = b["tf"].astype("int64")
        out["df"] = b["df"].astype("int64")
        out["tfidf"] = np.round(tfv * np.log(n_docs / dfv), 6)
        return out

    return top.map_batches(finish, batch_format="pandas")


SQL_DOC_TFIDF_TOP = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), tf AS (
  SELECT doc_id, t, COUNT(*) AS tf FROM tok WHERE t <> '' GROUP BY 1, 2
), df AS (
  SELECT t, COUNT(*) AS df FROM tf GROUP BY 1
)
SELECT doc_id, t, tf, df,
       ROUND(tf * LN((SELECT COUNT(*) FROM documents) * 1.0 / df), 6) AS tfidf
FROM tf JOIN df USING (t)
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, t) <= 3
"""


def q_doc_filter_median(sf_dir: str):
    """Distribution-gated quality filter: keep documents at or above
    their SOURCE's median length — the per-domain adaptive threshold
    curation op (a global cutoff over-prunes verbose domains and
    under-prunes terse ones).  Composition: exact per-group quantile
    from histogram partials (``quantile_per_group`` — the raw rows never
    shuffle) → size-gated ``join_auto`` of the per-source medians back
    onto the stream → vectorized filter."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    med = rel.quantile_per_group(docs, "source", "n_chars", 0.5, out_col="m")
    joined = rel.join_auto(docs, med, on="source")

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["n_chars"] >= b["m"], ["doc_id", "source", "n_chars"]]

    return joined.map_batches(filt, batch_format="pandas")


SQL_DOC_FILTER_MEDIAN = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         ROUND(median(n_chars) OVER (PARTITION BY source), 6) AS m
  FROM documents)
WHERE n_chars >= m
"""


def q_doc_ntile_buckets(sf_dir: str):
    """Per-source length-quartile bucketing (``relational.ntile_per_group``
    — exact SQL NTILE remainder semantics): the rank-based discretization
    curation op ("tag every document with its within-domain length
    quartile" for balanced mixture sampling).  Ranks from one range-sort
    + segmented cumsum; counts rejoin through size-gated ``join_auto``;
    bucket assignment is pure vectorized arithmetic."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out = rel.ntile_per_group(docs, "source", ["n_chars", "doc_id"], 4)
    return out.select_columns(["doc_id", "source", "n_chars", "bucket"])


SQL_DOC_NTILE_BUCKETS = """
SELECT doc_id, source, n_chars,
       NTILE(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS bucket
FROM documents
"""


def q_doc_mode_lang(sf_dir: str):
    """Per-source dominant language (per-group MODE with deterministic
    ties) — the corpus-composition op behind "which language do I route
    this domain's pipeline through".  Pure composition: per-block
    (source, lang) count partials → small groupby over the bounded
    histogram (sources × langs, never the corpus) → ``topk_per_group``
    k=1 with (cnt DESC, lang ASC) — the argmax is exact and
    layout-independent; raw rows never shuffle."""
    docs = _read(sf_dir, "documents", ["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["source", "lang"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    hist = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["source", "lang"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return rel.topk_per_group(hist, "source", "cnt", 1, tiebreak="lang")


SQL_DOC_MODE_LANG = """
SELECT source, lang, cnt FROM (
  SELECT source, lang, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY COUNT(*) DESC, lang)
           AS rn
  FROM documents GROUP BY source, lang)
WHERE rn = 1
"""


def q_doc_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment (``relational.hash_split``
    — md5-prefix buckets, ≈ 80/10/10): membership is a pure function of
    doc_id, so re-partitioning, rerunning or incrementally extending the
    corpus can never migrate a document between train and eval (the
    leakage mode a seeded random split invites)."""
    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    return rel.hash_split(docs, "doc_id")


SQL_DOC_SPLIT_ASSIGN = """
SELECT doc_id, source,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# epoch constant for centering event timestamps before correlation —
# translation-invariant mathematically, and it removes the catastrophic
# cancellation a raw ~1.7e9-second epoch induces in the closed form
_CORR_EPOCH_C = 1767225600.0  # 2026-01-01


def q_event_corr(sf_dir: str):
    """Per-user correlation between event value and event time
    (``relational.corr_per_group`` — distributed co-moment partials):
    "is this user's engagement trending?" as a keys-cardinality
    aggregate.  Timestamps are unit-pinned to epoch-µs then centered
    (corr is translation-invariant; centering keeps the closed form
    numerically equal to DuckDB's stable online corr at 4 decimals —
    verified exact over all 150 sf0.01 users before wiring)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        t = b["ts"].to_numpy("datetime64[us]").astype("int64") / 1e6 - _CORR_EPOCH_C
        return pd.DataFrame({"user_id": b["user_id"], "value": b["value"], "t": t})

    return rel.corr_per_group(
        ev.map_batches(prep, batch_format="pandas"), "user_id", "value", "t", out_col="corr_vt"
    )


SQL_EVENT_CORR = """
SELECT user_id, ROUND(corr(value, EPOCH(ts)), 4) AS corr_vt
FROM events GROUP BY user_id
"""


def q_event_lag_delta(sf_dir: str):
    """Per-user change detection: each event's value delta vs the user's
    PREVIOUS event (``relational.lag_per_group`` — distributed window
    navigation).  One range-sort; only 2×#blocks border rows reach the
    driver; first-in-group rows (SQL NULL lag) are filtered so the
    oracle never compares NaN against NULL."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    lagged = rel.lag_per_group(
        ev, "user_id", ["ts", "event_id"], "value", out_col="prev_value"
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["prev_value"].notna()]
        return pd.DataFrame(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "prev_value": np.round(b["prev_value"], 6),
                "delta": np.round(b["value"] - b["prev_value"], 6),
            }
        )

    return lagged.map_batches(finish, batch_format="pandas")


SQL_EVENT_LAG_DELTA = """
SELECT event_id, user_id, ROUND(prev_value, 6) AS prev_value,
       ROUND(value - prev_value, 6) AS delta
FROM (SELECT event_id, user_id, value,
             LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_value
      FROM events)
WHERE prev_value IS NOT NULL
"""


def q_doc_langs_concat(sf_dir: str):
    """Per-source ordered list aggregation (SQL ``string_agg(DISTINCT
    lang ORDER BY lang)``) — the "summarize a group as a deterministic
    delimited list" op.  Composition: distributed DISTINCT over the
    bounded (source, lang) pairs (``sorted_agg_by`` with empty aggs —
    the raw corpus never shuffles, only distinct partials) →
    ``sorted_map_groups`` join into one sorted comma-list per source."""
    from ..stages.canonicalize import sorted_agg_by, sorted_map_groups

    docs = _read(sf_dir, "documents", ["source", "lang"])
    dist = sorted_agg_by(docs, ["source", "lang"], {})

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"source": [g["source"].iloc[0]], "langs": [",".join(sorted(g["lang"]))]}
        )

    return sorted_map_groups(dist, ["source"], concat)


SQL_DOC_LANGS_CONCAT = """
SELECT source, string_agg(lang, ',' ORDER BY lang) AS langs
FROM (SELECT DISTINCT source, lang FROM documents) GROUP BY source
"""
