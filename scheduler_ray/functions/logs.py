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
