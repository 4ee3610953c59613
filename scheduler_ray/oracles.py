"""DuckDB oracle SQL for the KG pipeline queries.

Every page/JSON-LD byte is a pure function of the ``documents`` table
(see corpus.py), so ANSI SQL can reconstruct extraction output and golden
triples by string concatenation.  These fragments MUST mirror corpus.py
rule-for-rule; tests/test_oracles.py locks the two together.
"""

from __future__ import annotations

from .corpus import MALFORMED_JSON

# ---- shared scalar fragments over the `documents` view -------------------
D = "CAST(doc_id AS VARCHAR)"
PID = f"'https://pids.geoconnex.dev/' || source || '/' || {D}"
PROV = f"'https://provider.example/' || source || '/' || {D}"
ALIAS = f"'https://mirror.example/' || source || '/' || {D}"
LAT = "CAST((doc_id*37) % 180000 - 90000 AS VARCHAR)"
LON = "CAST((doc_id*53) % 360000 - 180000 AS VARCHAR)"
NAME = f"'Feature ' || {D}"
DESC = f"'Document ' || {D} || ' in ' || source || ' with ' || CAST(n_chars AS VARCHAR) || ' chars'"
MAINSTEM = (
    "'https://reference.geoconnex.us/collections/mainstems/items/' || "
    "CAST((doc_id*7) % 50000 AS VARCHAR)"
)
VALID = "(doc_id % 17 <> 0 AND doc_id % 19 <> 0)"
SRC_NUM = "CAST(SUBSTR(source, 4) AS INT)"
MAINSTEMS_ENABLED = f"(({SRC_NUM}) % 4 <> 3)"
HAS_MAINSTEM = "(doc_id % 3 = 0)"
DOMAIN = (
    f"CASE WHEN ({SRC_NUM}) % 10 < 4 THEN 'waterdata.usgs.gov' "
    f"WHEN ({SRC_NUM}) % 10 < 6 THEN 'water.noaa.gov' "
    "ELSE 'data.' || source || '.example.org' END"
)
URL = f"'https://' || {DOMAIN} || '/' || source || '/items/' || {D}"


def _node_sql(subj: str, sameas: str | None) -> str:
    parts = [
        "'{\"@id\":\"' || " + subj + " || '\",\"@type\":\"hyf:HY_HydroLocation\"'",
        "',\"schema:name\":\"' || " + NAME + " || '\"'",
        "',\"schema:description\":\"' || " + DESC + " || '\"'",
        "',\"schema:geo\":{\"schema:latitude\":' || " + LAT + " || ',\"schema:longitude\":' || " + LON + " || '}'",
    ]
    if sameas is not None:
        parts.append("',\"owl:sameAs\":\"' || " + sameas + " || '\"'")
    parts.append("'}'")
    return " || ".join(parts)


CASE_A = _node_sql(PID, None)
CASE_B = _node_sql(PROV, PID)
_CHAIN_EDGE = "'{\"@id\":\"' || " + PROV + " || '\",\"owl:sameAs\":\"' || " + PID + " || '\"}'"
CASE_C = "'{\"@graph\":[' || " + _node_sql(ALIAS, PROV) + " || ',' || " + _CHAIN_EDGE + " || ']}'"

_ML = MALFORMED_JSON.replace("'", "''")
EXTRACTED = (
    "CASE WHEN doc_id % 17 = 0 THEN NULL "
    f"WHEN doc_id % 19 = 0 THEN '{_ML}' "
    f"WHEN doc_id % 10 = 0 THEN {CASE_C} "
    f"WHEN doc_id % 2 = 0 THEN {CASE_B} "
    f"ELSE {CASE_A} END"
)

RAW_SUBJ = (
    f"CASE WHEN doc_id % 10 = 0 THEN {ALIAS} "
    f"WHEN doc_id % 2 = 0 THEN {PROV} ELSE {PID} END"
)


def _payload_rows(subj: str) -> list[tuple[str, str, str, str]]:
    """(pred, obj, obj_is_literal) select fragments for one node payload."""
    return [
        ("'rdf:type'", "'hyf:HY_HydroLocation'", "FALSE"),
        ("'schema:name'", NAME, "TRUE"),
        ("'schema:description'", DESC, "TRUE"),
        ("'schema:latitude'", LAT, "TRUE"),
        ("'schema:longitude'", LON, "TRUE"),
    ]


def _triples_union(subj: str, where: str, extra: list[tuple[str, str, str, str]] | None = None) -> str:
    selects = []
    for pred, obj, lit in _payload_rows(subj):
        selects.append(
            f"SELECT {subj} AS subj, {pred} AS pred, {obj} AS obj, "
            f"{lit} AS obj_is_literal, source AS graph FROM documents WHERE {where}"
        )
    for subj_e, pred, obj, lit, extra_where in extra or []:
        selects.append(
            f"SELECT {subj_e} AS subj, {pred} AS pred, {obj} AS obj, "
            f"{lit} AS obj_is_literal, source AS graph FROM documents WHERE {extra_where}"
        )
    return " UNION ALL ".join(selects)


#: raw triples = payload at raw subject + sameAs edges + linker triples
RAW_TRIPLES_SQL = _triples_union(
    RAW_SUBJ,
    VALID,
    extra=[
        # case B 1-hop sameAs
        (PROV, "'owl:sameAs'", PID, "FALSE", f"{VALID} AND doc_id % 2 = 0 AND doc_id % 10 <> 0"),
        # case C 2-hop chain
        (ALIAS, "'owl:sameAs'", PROV, "FALSE", f"{VALID} AND doc_id % 10 = 0"),
        (PROV, "'owl:sameAs'", PID, "FALSE", f"{VALID} AND doc_id % 10 = 0"),
        # linker emission at raw subject
        (
            RAW_SUBJ,
            "'hyf:linearElement'",
            MAINSTEM,
            "FALSE",
            f"{VALID} AND {HAS_MAINSTEM} AND {MAINSTEMS_ENABLED}",
        ),
    ],
)

#: canonical = payload at PID, sameAs dropped, linker triple at PID
CANONICAL_TRIPLES_SQL = _triples_union(
    PID,
    VALID,
    extra=[
        (
            PID,
            "'hyf:linearElement'",
            MAINSTEM,
            "FALSE",
            f"{VALID} AND {HAS_MAINSTEM} AND {MAINSTEMS_ENABLED}",
        ),
    ],
)

EXTRACT_SQL = f"SELECT {URL} AS url, source AS source, {EXTRACTED} AS extracted FROM documents"

SOURCES_SQL = "SELECT source, COUNT(*) AS n_pages FROM documents GROUP BY source"

PRED_COUNTS_SQL = (
    f"SELECT pred, COUNT(*) AS n FROM ({CANONICAL_TRIPLES_SQL}) GROUP BY pred"
)

CLEANUP_SQL = f"SELECT {URL} AS url FROM documents WHERE doc_id % 17 = 0"

MERGE_DEDUP_SQL = (
    f"SELECT COUNT(*) AS n_triples FROM (SELECT DISTINCT subj, pred, obj FROM ({CANONICAL_TRIPLES_SQL}))"
)

ENTITY_LINK_SQL = (
    f"SELECT {PID} AS subj, {MAINSTEM} AS mainstem_uri FROM documents "
    f"WHERE {VALID} AND {HAS_MAINSTEM} AND {MAINSTEMS_ENABLED}"
)
