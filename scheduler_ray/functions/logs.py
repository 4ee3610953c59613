"""M6 — structured-log parsing (reference userCode/lib/dagster.py:33-59).

The reference reads the crawl container's stdout line-by-line, parses each
line as JSON ``{"level": ..., "msg": ...}``, routes it to the matching
logger level, and falls back to ``info`` with the raw line on parse
failure.  Here the same contract is a vectorized batch function usable in
``map_batches`` over captured log streams, plus a per-level counter for
the lineage manifests.
"""

from __future__ import annotations

import json

import pyarrow as pa

LEVELS = ("debug", "info", "warning", "error", "critical")


def parse_log_line(line: str) -> tuple[str, str]:
    """One line → (level, msg); non-JSON / unknown-level → ('info', raw)."""
    try:
        doc = json.loads(line)
    except (ValueError, TypeError):
        return "info", line
    if not isinstance(doc, dict):
        return "info", line
    level = str(doc.get("level", "info")).lower()
    if level == "warn":
        level = "warning"
    if level not in LEVELS:
        level = "info"
    return level, str(doc.get("msg", line))


def parse_log_batch(batch: pa.Table, line_col: str = "line") -> pa.Table:
    """Batch form: adds ``level`` and ``msg`` columns."""
    levels, msgs = [], []
    for line in batch[line_col].to_pylist():
        lv, msg = parse_log_line(line if line is not None else "")
        levels.append(lv)
        msgs.append(msg)
    return batch.append_column(
        "level", pa.array(levels, pa.large_string())
    ).append_column("msg", pa.array(msgs, pa.large_string()))


def level_counts(batch: pa.Table, line_col: str = "line") -> dict[str, int]:
    """Per-level counters (what the manifests carry as the M6 metric)."""
    out = {lv: 0 for lv in LEVELS}
    for line in batch[line_col].to_pylist():
        lv, _ = parse_log_line(line if line is not None else "")
        out[lv] += 1
    return out


def failure_alert_text(message: str, partition_key: str | None = None) -> str:
    """The failure-notification text contract (reference
    ``userCode/lib/dagster.py:87-95`` ``slack_error_fn`` + the run-failure
    sensor wiring in ``userCode/defs.py:129-138``): partitioned failures
    name the source being crawled; unpartitioned ones just carry the
    error.  The alert FAN-OUT (Slack) is an external transport out of
    sandbox scope — this renders the exact message a runner would send."""
    if partition_key:
        return (
            f"Error in Geoconnex pipeline for partition: "
            f"`{partition_key}`: `{message}`"
        )
    return f"Error in Geoconnex pipeline: `{message}`"


def failure_alerts(batch: pa.Table, line_col: str = "line", partition_col: str | None = None) -> pa.Table:
    """Alert manifest from a parsed log stream: one row per error/critical
    line, carrying the rendered notification text.  Pure data — a thin
    runner owns the delivery, mirroring how the reference's sensor watches
    run failures rather than the pipeline posting inline."""
    parsed = parse_log_batch(batch, line_col)
    import pyarrow.compute as pc

    bad = parsed.filter(pc.is_in(parsed["level"], value_set=pa.array(["error", "critical"])))
    parts = bad[partition_col].to_pylist() if partition_col and partition_col in bad.column_names else [None] * bad.num_rows
    texts = [failure_alert_text(m, p) for m, p in zip(bad["msg"].to_pylist(), parts)]
    return bad.append_column("alert_text", pa.array(texts, pa.large_string()))
