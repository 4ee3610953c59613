"""Deterministic synthetic web-page corpus (pages / registry / sources).

The engine's primary input is a Common-Crawl-style Parquet table
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` (BASELINE.json ``input_hint``).  The driver's testdata does
not ship such a table, so this module derives one *deterministically* from
``documents.parquet`` — every byte of every page is a pure function of
``(doc_id, source, n_chars, text)`` — which lets the DuckDB oracle SQL in
``__ray_entry__`` reconstruct extraction output and golden triples with
plain string concatenation over the ``documents`` view.

Shape of the embedded JSON-LD mirrors the Geoconnex feature documents whose
triples the reference asserts (reference: userCode/defs_test.py:75-80,
104-130; payload shape documented in FIXTURES.md §2):

* ``doc_id % 17 == 0``  → page has NO ld+json block (null extraction).
* ``doc_id % 19 == 0``  → malformed JSON block (extraction succeeds
  byte-identically, parsing yields zero triples; counted as an error row —
  the analogue of the reference's non-fatal exit-3 harvest failures,
  userCode/lib/utils.py:89-97).
* ``doc_id % 2 == 1``   → case A: ``@id`` is already the canonical PID.
* ``doc_id % 10 == 0``  → case C: two-node ``@graph`` forming a 2-hop
  owl:sameAs chain  alias → provider → PID (union-find must close it).
* other even doc_ids    → case B: ``@id`` is a provider URI with a 1-hop
  ``owl:sameAs`` to the PID.
* ``doc_id % 13 == 0``  (valid docs) → the payload carries an inline
  ``@context`` mapping the ``schema``/``hyf`` prefixes, so expansion must
  emit full-IRI predicates/types for these documents.
* ``doc_id % 23 == 0``  (valid docs) → the page has a SECOND ld+json
  ``<script>`` block with a datatyped (``@value``/``@type``) and a
  language-tagged literal — multi-block extraction + typed-literal
  expansion coverage.
* ``doc_id % 29 == 0``  (valid docs) → an EXTRA ld+json block exercising
  the round-3 JSON-LD completeness features: a remote string context
  (``"https://schema.org"``, resolved via the pinned offline table), a
  ``@base`` with relative-IRI ``@id``s, an ``@list`` collection
  (rdf:first/rdf:rest/rdf:nil chain over deterministic blank nodes) and a
  ``@reverse`` edge — 7 golden triples per such page.
* ``doc_id % 31 == 0``  (valid docs) → a FOURTH ld+json block with a
  dict-valued ``@context`` term definition (``@type: "@id"`` coercion +
  prefixed term remaps) — 3 golden triples per such page (round-4).
* ``doc_id % 7``  selects the script-tag variant
  (corpus.SCRIPT_OPEN/CLOSE_VARIANTS); variants 5-6 wrap block content in
  CDATA / HTML-comment wrappers (corpus.WRAP_*_VARIANTS, round-4).
* ``doc_id % 37 == 0`` → schema:name is a TWO-element list (violates the
  shape's ``sh:maxCount 1``); else ``doc_id % 41 == 0`` → a lowercase
  ``feature ...`` label (violates ``sh:not`` / ``sh:xone``) — both classes
  fail SHACL conformance, so the validate-during-expand gate drops their
  main-block triples (round-4; see oracles.CONFORMS / _name_json).

All html/JSON text is pure ASCII so byte lengths equal character counts.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

PID_PREFIX = "https://pids.geoconnex.dev/"
PROV_PREFIX = "https://provider.example/"
ALIAS_PREFIX = "https://mirror.example/"
MAINSTEM_PREFIX = "https://reference.geoconnex.us/collections/mainstems/items/"

# A skewed domain map: two "hot" domains hold most sources, mirroring the
# USGS/NOAA skew called out in BASELINE.json north_star.
HOT_DOMAINS = ("waterdata.usgs.gov", "water.noaa.gov")

#: replication stride for bench-scale amplification; replica r of doc d has
#: virtual doc_id = d + r * AMPLIFY_STRIDE (keeps ids disjoint and rules
#: deterministic).
AMPLIFY_STRIDE = 1_000_000

MALFORMED_JSON = '{"@id": "broken", "schema:name": "unterminated'

#: real-world script-tag variants (round-2 verdict item 2), chosen per page
#: by ``doc_id % 7`` — extra attributes in any order, quote styles, case,
#: charset parameter, whitespace before the closing ``>``.  Variants 5-6
#: (round-3 verdict item 10) wrap the block CONTENT in a JS-comment-guarded
#: CDATA section / an HTML comment (see WRAP_*_VARIANTS) — extraction stays
#: byte-identical (wrapper bytes included); expansion strips the wrapper.
#: Extraction must treat all of them identically (reference harvest
#: contract userCode/lib/containers.py:62-76); the exact bytes are mirrored
#: by oracles.OPEN_TAG / CLOSE_TAG / WRAP_PRE / WRAP_SUF.
SCRIPT_OPEN_VARIANTS = (
    '<script type="application/ld+json">',
    "<script async type='application/ld+json'>",
    '<SCRIPT TYPE="application/LD+JSON" data-x="1">',
    '<script data-y="2" type=application/ld+json>',
    '<script  type = "application/ld+json; charset=utf-8" >',
    '<script type="application/ld+json">',
    "<script type='application/ld+json' defer>",
)
SCRIPT_CLOSE_VARIANTS = (
    "</script>",
    "</script>",
    "</SCRIPT>",
    "</script>",
    "</script >",
    "</script>",
    "</script>",
)
#: content wrappers per variant (empty for 0-4): CDATA / HTML comment
WRAP_PRE_VARIANTS = ("", "", "", "", "", "/*<![CDATA[*/", "<!--")
WRAP_SUF_VARIANTS = ("", "", "", "", "", "/*]]>*/", "-->")

#: inline @context planted on doc_id%13==0 documents (exact bytes — the
#: oracle reproduces them)
CONTEXT_JSON = (
    '"@context":{"schema":"https://schema.org/",'
    '"hyf":"https://www.opengis.net/def/schema/hy_features/hyf/"},'
)
SCHEMA_IRI = "https://schema.org/"
HYF_IRI = "https://www.opengis.net/def/schema/hy_features/hyf/"


def domain_for_source(source: str) -> str:
    """Deterministic source→domain map with 2 hot domains (~60% of sources)."""
    n = int(source[3:]) if source.startswith("src") and source[3:].isdigit() else 0
    if n % 10 < 4:
        return HOT_DOMAINS[0]
    if n % 10 < 6:
        return HOT_DOMAINS[1]
    return f"data.{source}.example.org"


def _vec(df: pd.DataFrame) -> dict[str, pd.Series]:
    """Vectorized building blocks shared by page/registry generation."""
    did = df["doc_id"].astype("int64")
    d = did.astype(str)
    src = df["source"].astype(str)
    pid = PID_PREFIX + src + "/" + d
    prov = PROV_PREFIX + src + "/" + d
    alias = ALIAS_PREFIX + src + "/" + d
    lat = ((did * 37) % 180000 - 90000).astype(str)
    lon = ((did * 53) % 360000 - 180000).astype(str)
    name = "Feature " + d
    desc = "Document " + d + " in " + src + " with " + df["n_chars"].astype(str) + " chars"
    mainstem = MAINSTEM_PREFIX + ((did * 7) % 50000).astype(str)
    return {
        "doc_id": did,
        "d": d,
        "src": src,
        "pid": pid,
        "prov": prov,
        "alias": alias,
        "lat": lat,
        "lon": lon,
        "name": name,
        "desc": desc,
        "mainstem": mainstem,
    }


def _name_json(v: dict[str, pd.Series], shape: str = "full") -> pd.Series:
    """The JSON value of ``schema:name`` per document (round-4 SHACL
    rules — quotes/brackets included):

    * ``doc_id % 37 == 0`` → a TWO-element name list (violates the
      shape's ``sh:maxCount 1``);
    * else ``doc_id % 41 == 0`` → a lowercase ``"feature <id>"`` label
      (violates ``sh:not`` ^feature and matches neither ``sh:xone``
      naming scheme);
    * else the conforming ``"Feature <id>"``.
    """
    did = v["doc_id"]
    d = v["d"]
    single = '"' + v["name"] + '"'
    if shape == "r2":  # BENCH-ONLY regression-decomposition shape
        return single
    double = '["Feature ' + d + '","Feature ' + d + ' (alt)"]'
    lower = '"feature ' + d + '"'
    return single.where(did % 41 != 0, lower).where(did % 37 != 0, double)


def _node(
    subj: pd.Series,
    v: dict[str, pd.Series],
    same_as: pd.Series | None,
    name_json: pd.Series,
) -> pd.Series:
    body = (
        '{"@id":"' + subj + '","@type":"hyf:HY_HydroLocation"'
        ',"schema:name":' + name_json
        + ',"schema:description":"' + v["desc"] + '"'
        ',"schema:geo":{"schema:latitude":' + v["lat"]
        + ',"schema:longitude":' + v["lon"] + "}"
    )
    if same_as is not None:
        body = body + ',"owl:sameAs":"' + same_as + '"'
    return body + "}"


def jsonld_for_documents(df: pd.DataFrame, shape: str = "full") -> pd.Series:
    """The exact ld+json payload per document (None → no block).

    This is THE conformance function: the extraction stage must reproduce
    these bytes per url (per-row invariant in BASELINE.json input_hint).
    ``doc_id % 13 == 0`` payloads carry the inline ``@context``.
    """
    v = _vec(df)
    did = v["doc_id"]
    ctx = pd.Series(np.where(did % 13 == 0, CONTEXT_JSON, ""), index=df.index)
    name_json = _name_json(v, shape)
    case_a = "{" + ctx + _node(v["pid"], v, None, name_json).str.slice(1)
    case_b = "{" + ctx + _node(v["prov"], v, v["pid"], name_json).str.slice(1)
    chain_edge = '{"@id":"' + v["prov"] + '","owl:sameAs":"' + v["pid"] + '"}'
    case_c = (
        "{" + ctx + '"@graph":['
        + _node(v["alias"], v, v["prov"], name_json) + "," + chain_edge + "]}"
    )

    out = case_a.where(did % 2 == 1, case_b)
    out = out.where(did % 10 != 0, case_c)
    out = out.where(did % 19 != 0, MALFORMED_JSON)
    out = out.mask(did % 17 == 0, None)
    return out


def second_block_for_documents(df: pd.DataFrame) -> pd.Series:
    """The second ld+json block (None when absent): planted on valid
    ``doc_id % 23 == 0`` pages; carries a datatyped + a language-tagged
    literal at the document's RAW subject."""
    v = _vec(df)
    did = v["doc_id"]
    raw_subj = v["pid"].where(did % 2 == 1, v["prov"]).where(did % 10 != 0, v["alias"])
    block = (
        '{"@id":"' + raw_subj + '",'
        '"schema:dateCreated":{"@value":"2026-01-17","@type":"schema:Date"},'
        '"schema:alternateName":{"@value":"Fluss ' + v["d"] + '","@language":"de"}}'
    )
    valid = (did % 17 != 0) & (did % 19 != 0)
    return block.where(valid & (did % 23 == 0), None)


def third_block_for_documents(df: pd.DataFrame) -> pd.Series:
    """The JSON-LD-completeness block (None when absent): planted on valid
    ``doc_id % 29 == 0`` pages.  Remote schema.org context (pinned,
    offline), ``@base``-relative ``@id``s, an ``@list`` collection and a
    ``@reverse`` edge (round-2 verdict item 3).  ``alternateName`` (not
    ``name``) keeps the block out of the entity linker's mention set and
    the feature-table pivot."""
    v = _vec(df)
    did = v["doc_id"]
    base = PID_PREFIX + v["src"] + "/"
    block = (
        '{"@context":["https://schema.org",{"@base":"' + base + '"}],'
        '"@id":"' + v["d"] + '/extra",'
        '"alternateName":"Extra node ' + v["d"] + '",'
        '"itemListElement":{"@list":["first ' + v["d"] + '","second ' + v["d"] + '"]},'
        '"@reverse":{"isPartOf":{"@id":"' + v["d"] + '/child"}}}'
    )
    valid = (did % 17 != 0) & (did % 19 != 0)
    return block.where(valid & (did % 29 == 0), None)


def fourth_block_for_documents(df: pd.DataFrame) -> pd.Series:
    """The dict-valued-@context block (None when absent): planted on valid
    ``doc_id % 31 == 0`` pages (round-3 verdict item 4).  Exercises the
    standard schema.org context idiom: a dict-valued term definition with
    ``@type: "@id"`` value coercion (``author`` — its relative-IRI string
    value resolves against ``@base`` into a node reference), a prefixed
    string-valued term (``about`` → schema:about, resolved against the
    ``schema`` prefix of the same context), and a prefixed ``@type``.
    3 golden triples per page (oracles.EXTRA31_ROWS)."""
    v = _vec(df)
    did = v["doc_id"]
    base = PID_PREFIX + v["src"] + "/"
    block = (
        '{"@context":{"schema":"https://schema.org/","@base":"' + base + '",'
        '"author":{"@id":"schema:author","@type":"@id"},"about":"schema:about"},'
        '"@id":"' + v["d"] + '/meta",'
        '"@type":"schema:CreativeWork",'
        '"author":"people/' + v["d"] + '",'
        '"about":"Topic ' + v["d"] + '"}'
    )
    valid = (did % 17 != 0) & (did % 19 != 0)
    return block.where(valid & (did % 31 == 0), None)


def pages_from_documents(df: pd.DataFrame, pad_kb: int = 0, shape: str = "full") -> pd.DataFrame:
    """documents rows → pages rows (url, warc_ts, html, text, lang).

    ``pad_kb`` appends that many KB of inert filler to each page body —
    the BENCH-ONLY knob for the realistic regime where Common-Crawl pages
    are ~100 KB and extraction is byte-bound.  The ld+json blocks precede
    the filler, so extraction/expansion semantics (and the oracles, which
    only run at pad_kb=0) are unchanged.

    ``shape="r2"`` (BENCH-ONLY, round-4 verdict item 3) reproduces the
    round-2 corpus semantics for regression decomposition: one canonical
    script-tag variant (no wrappers), no third/fourth blocks, no SHACL
    violation classes.  The oracles only run at shape="full".
    """
    v = _vec(df)
    url = "https://" + v["src"].map(domain_for_source) + "/" + v["src"] + "/items/" + v["d"]
    payload = jsonld_for_documents(df, shape)
    vi = (v["doc_id"] % 7).to_numpy() if shape != "r2" else np.zeros(len(df), np.int64)
    open_tag = pd.Series(np.array(SCRIPT_OPEN_VARIANTS, object)[vi], index=df.index)
    close_tag = pd.Series(np.array(SCRIPT_CLOSE_VARIANTS, object)[vi], index=df.index)
    wrap_pre = pd.Series(np.array(WRAP_PRE_VARIANTS, object)[vi], index=df.index)
    wrap_suf = pd.Series(np.array(WRAP_SUF_VARIANTS, object)[vi], index=df.index)
    script = (open_tag + wrap_pre + payload + wrap_suf + close_tag).fillna("")
    block2 = second_block_for_documents(df)
    script2 = (open_tag + wrap_pre + block2 + wrap_suf + close_tag).fillna("")
    if shape == "r2":
        script3 = script4 = pd.Series("", index=df.index)
    else:
        block3 = third_block_for_documents(df)
        script3 = (open_tag + wrap_pre + block3 + wrap_suf + close_tag).fillna("")
        block4 = fourth_block_for_documents(df)
        script4 = (open_tag + wrap_pre + block4 + wrap_suf + close_tag).fillna("")
    filler = "<!--" + "x" * (pad_kb * 1024) + "-->" if pad_kb else ""
    html = (
        "<html><head><title>Feature " + v["d"] + "</title>"
        + script
        + script2
        + script3
        + script4
        + "</head><body><p>" + df["text"].astype(str) + "</p>" + filler + "</body></html>"
    )
    ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(v["doc_id"] % AMPLIFY_STRIDE, unit="s")
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": ts.astype("datetime64[us]"),
            "html": html.str.encode("utf-8"),
            "text": df["text"].astype(str),
            "lang": df["lang"].astype(str),
        }
    )


def registry_from_documents(df: pd.DataFrame, shape: str = "full") -> pd.DataFrame:
    """The PID registry / entity-link target table (FIXTURES.md §3).

    Broadcast small side of J1/J2 (reference's mainstem hydrofabric +
    pids.geoconnex.dev registry, userCode/assetGroups/config.py:34-82).
    ``mainstem_uri`` is the flattened stand-in for the FlatGeobuf spatial
    join; present iff doc_id % 3 == 0.
    """
    from .stages.spatial import wkb_polygons, wkb_polylines

    v = _vec(df)
    did = v["doc_id"]
    xmin = (did * 37 % 180000 - 90000) / 1000.0
    ymin = (did * 53 % 360000 - 180000) / 1000.0
    # real geometry per registry row (round-2 verdict item 6): a diamond
    # ring around (cx, cy) = feature point + (0.002, 0.001) with radii
    # (0.0045, 0.0035).  Containment |dx|/rx + |dy|/ry ≤ 1 is, in integer
    # milli-units, 14|dxm| + 18|dym| ≤ 63 — even vs odd, so no point can
    # ever sit exactly ON the boundary and the float ray-casting kernel
    # agrees bit-stably with the integer SQL oracle.
    px = xmin.to_numpy(np.float64)
    py = ymin.to_numpy(np.float64)
    cx, cy = px + 0.002, py + 0.001
    rx, ry = 0.0045, 0.0035
    vx = np.stack([cx - rx, cx, cx + rx, cx, cx - rx], axis=1)
    vy = np.stack([cy, cy + ry, cy, cy - ry, cy], axis=1)
    # flowline geometry per mainstem-bearing row (round-4 verdict item 6):
    # a 3-vertex polyline passing EXACTLY through the feature point
    # (px, py), so the nearest-flowline association resolves to the row's
    # own mainstem at distance 0 — geometry-true mechanism, attribute-
    # equal result (the SQL oracle stays expressible).
    lvx = np.stack([px - 0.004, px, px + 0.004], axis=1)
    lvy = np.stack([py - 0.002, py, py + 0.002], axis=1)
    flowline = pd.Series(wkb_polylines(lvx, lvy), index=df.index)
    out = pd.DataFrame(
        {
            "id": v["pid"],
            "geoconnex_sitemap": v["src"],
            "feature_name": v["name"],
            "feature_description": v["desc"],
            "bbox_xmin": xmin,
            "bbox_ymin": ymin,
            "bbox_xmax": xmin + 0.01,
            "bbox_ymax": ymin + 0.01,
            "ring_wkb": wkb_polygons(vx, vy),
            "mainstem_uri": v["mainstem"].where(did % 3 == 0, None),
            "flowline_wkb": flowline.where(did % 3 == 0, None),
        }
    )
    if shape == "r2":  # round-2 linker shape: bbox-only, no geometry columns
        out = out.drop(columns=["ring_wkb", "flowline_wkb"])
    return out


def sources_config(sources: pd.Series) -> pd.DataFrame:
    """Per-source crawl hints (mirrors sitemap-index metadata, reference
    userCode/assetGroups/testdata/sitemap.xml:12-13).

    ``add_associated_mainstems`` is False for src3, src7, src11, ... —
    i.e. sources whose numeric suffix % 4 == 3 — gating the linker stage.
    """
    uniq = sorted(set(sources.astype(str)))
    nums = [int(s[3:]) if s.startswith("src") and s[3:].isdigit() else 0 for s in uniq]
    return pd.DataFrame(
        {
            "source_id": uniq,
            "max_request_concurrency": [1 + (n % 4) for n in nums],
            "add_associated_mainstems": [n % 4 != 3 for n in nums],
        }
    )


def amplify_documents(df: pd.DataFrame, factor: int) -> pd.DataFrame:
    """Replicate the documents table ``factor``× with disjoint doc_ids.

    Replica r gets doc_id += r * AMPLIFY_STRIDE, so every derivation rule
    stays deterministic and the corpus keeps the same source skew.
    """
    if factor <= 1:
        return df
    parts = []
    for r in range(factor):
        p = df.copy()
        p["doc_id"] = p["doc_id"] + r * AMPLIFY_STRIDE
        parts.append(p)
    return pd.concat(parts, ignore_index=True)


def fixture_dir(sf_dir: str, amplify: int = 1, pad_kb: int = 0, shape: str = "full") -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    suffix = f"_p{pad_kb}" if pad_kb else ""
    if shape != "full":
        suffix += f"_{shape}"
    return f"/tmp/scheduler_ray_fixtures/{tag}_x{amplify}{suffix}"


def ensure_pages_fixture(
    sf_dir: str,
    amplify: int = 1,
    rows_per_file: int = 50_000,
    pad_kb: int = 0,
    shape: str = "full",
) -> str:
    """Generate (once, cached) pages/registry/sources parquet for sf_dir.

    Returns the fixture directory containing ``pages/`` (a directory of
    parquet shards so Ray reads in parallel), ``registry.parquet`` and
    ``sources.parquet``.  Deterministic: same inputs → same bytes.
    """
    out = fixture_dir(sf_dir, amplify, pad_kb, shape)
    done = os.path.join(out, "_COMPLETE")
    if os.path.exists(done):
        return out
    os.makedirs(os.path.join(out, "pages"), exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    docs = amplify_documents(docs, amplify)
    if pad_kb:
        # keep files (and row groups) splittable: ~64 MB of padded html
        # per file, else a single multi-GB row group serializes the read
        rows_per_file = min(rows_per_file, max(512, (64 * 1024) // pad_kb))
    registry = registry_from_documents(docs, shape=shape)
    registry.to_parquet(os.path.join(out, "registry.parquet"), index=False)
    sources_config(docs["source"]).to_parquet(os.path.join(out, "sources.parquet"), index=False)
    for i, lo in enumerate(range(0, len(docs), rows_per_file)):
        chunk = pages_from_documents(docs.iloc[lo : lo + rows_per_file], pad_kb=pad_kb, shape=shape)
        tbl = pa.Table.from_pandas(chunk, preserve_index=False)
        tbl = tbl.replace_schema_metadata(None)  # pandas metadata breaks Ray's schema dedup
        pq.write_table(
            tbl,
            os.path.join(out, "pages", f"part-{i:05d}.parquet"),
            row_group_size=min(rows_per_file, 4096),
        )
    with open(done, "w") as f:
        f.write("ok")
    return out
