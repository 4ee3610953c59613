"""Sitemap-index reader (SURVEY.md S1/M4 — partition discovery).

The reference bootstraps its dynamic partitions by fetching a sitemap
*index* XML and extracting one ``sitemap_id`` per source, with whitespace
stripping, empty-id rejection, warn-and-skip duplicate handling (first
wins) and a deterministic sort (reference
userCode/assetGroups/config.py:106-149).  Per-source crawl hints
(``max_request_concurrency``, ``add_associated_mainstems``) ride along in
the index (reference testdata/sitemap.xml:12-13).

Here the index parses into the ``sources`` config table that gates the
linker stage; partition *discovery from data* (deriving the source from
each url) lives in stages/extract.py.
"""

from __future__ import annotations

import logging
import xml.etree.ElementTree as ET

import pandas as pd

logger = logging.getLogger(__name__)

_NS = {
    "sm": "http://www.sitemaps.org/schemas/sitemap/0.9",
    "geoconnex": "https://geoconnex.us/sitemap",
}


def parse_sitemap_index(xml_text: str) -> pd.DataFrame:
    """Index XML → sources table (source_id, loc, max_request_concurrency,
    add_associated_mainstems), deduped (first wins) and sorted."""
    root = ET.fromstring(xml_text)
    rows: list[dict] = []
    seen: set[str] = set()
    for sm in root.findall("sm:sitemap", _NS):
        sid_el = sm.find("geoconnex:sitemap_id", _NS)
        sid = (sid_el.text or "").strip() if sid_el is not None else ""
        if not sid:
            logger.warning("skipping sitemap entry with empty sitemap_id")
            continue
        if sid in seen:
            logger.warning("duplicate sitemap_id %r — first occurrence wins", sid)
            continue
        seen.add(sid)
        loc_el = sm.find("sm:loc", _NS)
        conc_el = sm.find("geoconnex:max_request_concurrency", _NS)
        ms_el = sm.find("geoconnex:add_associated_mainstems", _NS)
        rows.append(
            {
                "source_id": sid,
                "loc": (loc_el.text or "").strip() if loc_el is not None else "",
                "max_request_concurrency": int((conc_el.text or "1").strip())
                if conc_el is not None
                else 1,
                "add_associated_mainstems": (ms_el.text or "").strip().lower() == "true"
                if ms_el is not None
                else False,
            }
        )
    rows.sort(key=lambda r: r["source_id"])  # deterministic registration order
    return pd.DataFrame(
        rows,
        columns=["source_id", "loc", "max_request_concurrency", "add_associated_mainstems"],
    )


def reconcile_partitions(current: set[str], fresh: set[str]) -> tuple[set[str], set[str]]:
    """J4 partition reconciliation: (to_delete, to_add) so the registered
    set matches the fresh index (reference userCode/lib/dagster.py:19-30)."""
    return current - fresh, fresh - current
