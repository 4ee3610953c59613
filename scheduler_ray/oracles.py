"""DuckDB oracle SQL for the KG pipeline queries.

Every page/JSON-LD byte is a pure function of the ``documents`` table
(see corpus.py), so ANSI SQL can reconstruct extraction output and golden
triples by string concatenation.  These fragments MUST mirror corpus.py
rule-for-rule; tests/test_oracles.py locks the two together.

Round-2 corpus rules mirrored here (see corpus.py docstring):
``doc_id%13==0`` documents carry an inline @context (full-IRI predicates
and type), nested geo nodes expand to blank-node triples
(``_:<raw subject>#b0``), and valid ``doc_id%23==0`` pages have a second
ld+json block with a datatyped + language-tagged literal.
"""

from __future__ import annotations

from .corpus import (
    CONTEXT_JSON,
    HYF_IRI,
    MALFORMED_JSON,
    SCHEMA_IRI,
    SCRIPT_CLOSE_VARIANTS,
    SCRIPT_OPEN_VARIANTS,
    WRAP_PRE_VARIANTS,
    WRAP_SUF_VARIANTS,
)

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
#: SHACL conformance (round-4 verdict item 9): ``doc_id%37==0`` documents
#: carry a TWO-element schema:name list (violates ``sh:maxCount 1``) and
#: ``doc_id%41==0`` ones a lowercase ``feature ...`` label (violates
#: ``sh:not`` and matches neither ``sh:xone`` naming scheme) — the
#: validate-during-expand gate drops their main-block triples entirely.
CONFORMS = f"({VALID} AND doc_id % 37 <> 0 AND doc_id % 41 <> 0)"
SRC_NUM = "CAST(SUBSTR(source, 4) AS INT)"
MAINSTEMS_ENABLED = f"(({SRC_NUM}) % 4 <> 3)"
HAS_MAINSTEM = "(doc_id % 3 = 0)"
DOMAIN = (
    f"CASE WHEN ({SRC_NUM}) % 10 < 4 THEN 'waterdata.usgs.gov' "
    f"WHEN ({SRC_NUM}) % 10 < 6 THEN 'water.noaa.gov' "
    "ELSE 'data.' || source || '.example.org' END"
)
URL = f"'https://' || {DOMAIN} || '/' || source || '/items/' || {D}"

#: context / multi-block gates
CTX = "(doc_id % 13 = 0)"
MULTI = f"({VALID} AND doc_id % 23 = 0)"
#: JSON-LD-completeness extra block (corpus.third_block_for_documents)
EXTRA29 = f"({VALID} AND doc_id % 29 = 0)"
#: dict-valued-@context block (corpus.fourth_block_for_documents, round-4)
EXTRA31 = f"({VALID} AND doc_id % 31 = 0)"


def _tag_case(variants: tuple[str, ...]) -> str:
    """doc_id%7 → the page's script-tag variant bytes (corpus lockstep)."""
    whens = " ".join(
        f"WHEN {i} THEN '{t.replace(chr(39), chr(39) * 2)}'" for i, t in enumerate(variants)
    )
    return f"CASE doc_id % 7 {whens} END"


#: the exact script open/close tag + content-wrapper bytes per page
#: (corpus.SCRIPT_*_VARIANTS / WRAP_*_VARIANTS; wrappers are part of the
#: extracted bytes — expansion strips them)
OPEN_TAG = _tag_case(SCRIPT_OPEN_VARIANTS)
CLOSE_TAG = _tag_case(SCRIPT_CLOSE_VARIANTS)
WRAP_PRE = _tag_case(WRAP_PRE_VARIANTS)
WRAP_SUF = _tag_case(WRAP_SUF_VARIANTS)

#: predicate spellings — full IRIs for @context documents
_P_IRI = {
    "schema:name": SCHEMA_IRI + "name",
    "schema:description": SCHEMA_IRI + "description",
    "schema:geo": SCHEMA_IRI + "geo",
    "schema:latitude": SCHEMA_IRI + "latitude",
    "schema:longitude": SCHEMA_IRI + "longitude",
}


def _pred(term: str) -> str:
    return f"CASE WHEN {CTX} THEN '{_P_IRI[term]}' ELSE '{term}' END"


P_NAME, P_DESC, P_GEO, P_LAT, P_LON = (
    _pred(t)
    for t in (
        "schema:name",
        "schema:description",
        "schema:geo",
        "schema:latitude",
        "schema:longitude",
    )
)
TYPE_OBJ = f"CASE WHEN {CTX} THEN '{HYF_IRI}HY_HydroLocation' ELSE 'hyf:HY_HydroLocation' END"


def _blank(subj: str) -> str:
    """The deterministic blank-node label the expansion allocates for a
    document's nested geo node: ``_:<root subject>#b0``."""
    return f"'_:' || {subj} || '#b0'"


#: the JSON value of schema:name — quotes/brackets included (mirrors
#: corpus._name_json; %37 takes precedence over %41)
NAME_JSON = (
    f"CASE WHEN doc_id % 37 = 0 THEN '[\"Feature ' || {D} || '\",\"Feature ' || {D} || ' (alt)\"]' "
    f"WHEN doc_id % 41 = 0 THEN '\"feature ' || {D} || '\"' "
    f"ELSE '\"Feature ' || {D} || '\"' END"
)


def _node_sql(subj: str, sameas: str | None) -> str:
    """The inner (post-'{') JSON bytes of one feature node."""
    parts = [
        "'\"@id\":\"' || " + subj + " || '\",\"@type\":\"hyf:HY_HydroLocation\"'",
        "',\"schema:name\":' || (" + NAME_JSON + ")",
        "',\"schema:description\":\"' || " + DESC + " || '\"'",
        "',\"schema:geo\":{\"schema:latitude\":' || " + LAT + " || ',\"schema:longitude\":' || " + LON + " || '}'",
    ]
    if sameas is not None:
        parts.append("',\"owl:sameAs\":\"' || " + sameas + " || '\"'")
    parts.append("'}'")
    return " || ".join(parts)


_CTX_SQL = f"CASE WHEN {CTX} THEN '{CONTEXT_JSON}' ELSE '' END"

CASE_A = "'{' || " + _CTX_SQL + " || " + _node_sql(PID, None)
CASE_B = "'{' || " + _CTX_SQL + " || " + _node_sql(PROV, PID)
_CHAIN_EDGE = "'{\"@id\":\"' || " + PROV + " || '\",\"owl:sameAs\":\"' || " + PID + " || '\"}'"
CASE_C = (
    "'{' || " + _CTX_SQL + " || '\"@graph\":[{' || "
    + _node_sql(ALIAS, PROV)
    + " || ',' || "
    + _CHAIN_EDGE
    + " || ']}'"
)

_ML = MALFORMED_JSON.replace("'", "''")
#: block bytes BEFORE wrapping (corpus.jsonld_for_documents)
_PAYLOAD = (
    f"CASE WHEN doc_id % 19 = 0 THEN '{_ML}' "
    f"WHEN doc_id % 10 = 0 THEN {CASE_C} "
    f"WHEN doc_id % 2 = 0 THEN {CASE_B} "
    f"ELSE {CASE_A} END"
)
#: extracted bytes = wrapper-included (byte-identity contract): variants
#: 5-6 carry CDATA / HTML-comment wrappers inside the script tag
EXTRACTED = (
    "CASE WHEN doc_id % 17 = 0 THEN NULL "
    f"ELSE ({WRAP_PRE}) || ({_PAYLOAD}) || ({WRAP_SUF}) END"
)

RAW_SUBJ = (
    f"CASE WHEN doc_id % 10 = 0 THEN {ALIAS} "
    f"WHEN doc_id % 2 = 0 THEN {PROV} ELSE {PID} END"
)

#: the second ld+json block (NULL when absent) — corpus.second_block_for_documents
SECOND_BLOCK = (
    f"CASE WHEN {MULTI} THEN "
    "'{\"@id\":\"' || " + RAW_SUBJ + " || '\",'"
    " || '\"schema:dateCreated\":{\"@value\":\"2026-01-17\",\"@type\":\"schema:Date\"},'"
    " || '\"schema:alternateName\":{\"@value\":\"Fluss ' || " + D + " || '\",\"@language\":\"de\"}}'"
    " ELSE NULL END"
)

#: the JSON-LD-completeness block (NULL when absent) —
#: corpus.third_block_for_documents (remote ctx + @base + @list + @reverse)
THIRD_BLOCK = (
    f"CASE WHEN {EXTRA29} THEN "
    "'{\"@context\":[\"https://schema.org\",{\"@base\":\"https://pids.geoconnex.dev/' || source || '/\"}],'"
    " || '\"@id\":\"' || " + D + " || '/extra\",'"
    " || '\"alternateName\":\"Extra node ' || " + D + " || '\",'"
    " || '\"itemListElement\":{\"@list\":[\"first ' || " + D + " || '\",\"second ' || " + D + " || '\"]},'"
    " || '\"@reverse\":{\"isPartOf\":{\"@id\":\"' || " + D + " || '/child\"}}}'"
    " ELSE NULL END"
)

#: expansion of THIRD_BLOCK: subjects resolved against @base, the @list as
#: an rdf:first/rdf:rest blank chain, the @reverse edge at the child
S29 = f"{PID} || '/extra'"
C29 = f"{PID} || '/child'"
_B29_0 = f"'_:' || {S29} || '#b0'"
_B29_1 = f"'_:' || {S29} || '#b1'"
EXTRA29_ROWS: list[tuple[str, str, str, str, str]] = [
    (S29, f"'{SCHEMA_IRI}alternateName'", f"'Extra node ' || {D}", "TRUE", EXTRA29),
    (S29, f"'{SCHEMA_IRI}itemListElement'", _B29_0, "FALSE", EXTRA29),
    (_B29_0, "'rdf:first'", f"'first ' || {D}", "TRUE", EXTRA29),
    (_B29_0, "'rdf:rest'", _B29_1, "FALSE", EXTRA29),
    (_B29_1, "'rdf:first'", f"'second ' || {D}", "TRUE", EXTRA29),
    (_B29_1, "'rdf:rest'", "'rdf:nil'", "FALSE", EXTRA29),
    (C29, f"'{SCHEMA_IRI}isPartOf'", S29, "FALSE", EXTRA29),
]


#: the dict-valued-@context block (NULL when absent) —
#: corpus.fourth_block_for_documents (term defs + @type:@id coercion)
FOURTH_BLOCK = (
    f"CASE WHEN {EXTRA31} THEN "
    "'{\"@context\":{\"schema\":\"https://schema.org/\",\"@base\":\"https://pids.geoconnex.dev/' || source || '/\",'"
    " || '\"author\":{\"@id\":\"schema:author\",\"@type\":\"@id\"},\"about\":\"schema:about\"},'"
    " || '\"@id\":\"' || " + D + " || '/meta\",'"
    " || '\"@type\":\"schema:CreativeWork\",'"
    " || '\"author\":\"people/' || " + D + " || '\",'"
    " || '\"about\":\"Topic ' || " + D + " || '\"}'"
    " ELSE NULL END"
)

#: expansion of FOURTH_BLOCK: @base-resolved subject, coerced author IRI,
#: prefix-resolved about literal, prefixed @type
S31 = f"{PID} || '/meta'"
EXTRA31_ROWS: list[tuple[str, str, str, str, str]] = [
    (S31, "'rdf:type'", f"'{SCHEMA_IRI}CreativeWork'", "FALSE", EXTRA31),
    (
        S31,
        f"'{SCHEMA_IRI}author'",
        f"'https://pids.geoconnex.dev/' || source || '/people/' || {D}",
        "FALSE",
        EXTRA31,
    ),
    (S31, f"'{SCHEMA_IRI}about'", f"'Topic ' || {D}", "TRUE", EXTRA31),
]


def _payload_rows(subj: str, blank_root: str) -> list[tuple[str, str, str, str]]:
    """(subj, pred, obj, obj_is_literal) fragments for one node payload —
    the geo struct expands to a blank node rooted at ``blank_root``."""
    blank = _blank(blank_root)
    return [
        (subj, "'rdf:type'", TYPE_OBJ, "FALSE"),
        (subj, P_NAME, NAME, "TRUE"),
        (subj, P_DESC, DESC, "TRUE"),
        (subj, P_GEO, blank, "FALSE"),
        (blank, P_LAT, LAT, "TRUE"),
        (blank, P_LON, LON, "TRUE"),
    ]


def _triples_union(rows: list[tuple[str, str, str, str, str]]) -> str:
    """UNION ALL of (subj, pred, obj, lit, where) select fragments."""
    selects = [
        f"SELECT {subj} AS subj, {pred} AS pred, {obj} AS obj, "
        f"{lit} AS obj_is_literal, source AS graph FROM documents WHERE {where}"
        for subj, pred, obj, lit, where in rows
    ]
    return " UNION ALL ".join(selects)


def _with_where(
    payload: list[tuple[str, str, str, str]], where: str
) -> list[tuple[str, str, str, str, str]]:
    return [(s, p, o, lit, where) for s, p, o, lit in payload]


_MULTI_ROWS = [
    (
        "'schema:dateCreated'",
        "'2026-01-17^^schema:Date'",
        "TRUE",
    ),
    (
        "'schema:alternateName'",
        f"'Fluss ' || {D} || '@de'",
        "TRUE",
    ),
]

#: raw triples = payload at raw subject (+ blank geo node) + sameAs edges
#: + second-block literals + linker triples.  The main block is gated on
#: CONFORMS (validation rides on expansion); the extra blocks (2-4) are
#: not validated and stay VALID-gated.
RAW_TRIPLES_SQL = _triples_union(
    _with_where(_payload_rows(RAW_SUBJ, RAW_SUBJ), CONFORMS)
    + [
        # case B 1-hop sameAs
        (PROV, "'owl:sameAs'", PID, "FALSE", f"{CONFORMS} AND doc_id % 2 = 0 AND doc_id % 10 <> 0"),
        # case C 2-hop chain (the chain edge shares the main block, so a
        # non-conforming doc drops it too)
        (ALIAS, "'owl:sameAs'", PROV, "FALSE", f"{CONFORMS} AND doc_id % 10 = 0"),
        (PROV, "'owl:sameAs'", PID, "FALSE", f"{CONFORMS} AND doc_id % 10 = 0"),
        # second-block typed/lang literals at the raw subject
        *[(RAW_SUBJ, p, o, lit, MULTI) for p, o, lit in _MULTI_ROWS],
        # third-block completeness triples (@base/@list/@reverse)
        *EXTRA29_ROWS,
        # fourth-block dict-valued-@context triples (round-4)
        *EXTRA31_ROWS,
        # linker emission at raw subject (linker sees conforming docs only)
        (
            RAW_SUBJ,
            "'hyf:linearElement'",
            MAINSTEM,
            "FALSE",
            f"{CONFORMS} AND {HAS_MAINSTEM} AND {MAINSTEMS_ENABLED}",
        ),
    ]
)

#: second-block subject in the CANONICAL graph: the sameAs rewrite only
#: happens when the main block survived validation (its edges carry the
#: alias→PID mapping); for non-conforming docs the raw subject stays.
CANON_MULTI_SUBJ = f"CASE WHEN {CONFORMS} THEN {PID} ELSE {RAW_SUBJ} END"

#: canonical = payload at PID (blank labels keep the RAW root), sameAs
#: dropped, second-block literals + linker triple at PID
CANONICAL_TRIPLES_SQL = _triples_union(
    _with_where(_payload_rows(PID, RAW_SUBJ), CONFORMS)
    + [
        *[(CANON_MULTI_SUBJ, p, o, lit, MULTI) for p, o, lit in _MULTI_ROWS],
        # third/fourth-block subjects carry no sameAs — canonical unchanged
        *EXTRA29_ROWS,
        *EXTRA31_ROWS,
        (
            PID,
            "'hyf:linearElement'",
            MAINSTEM,
            "FALSE",
            f"{CONFORMS} AND {HAS_MAINSTEM} AND {MAINSTEMS_ENABLED}",
        ),
    ]
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
    f"WHERE {CONFORMS} AND {HAS_MAINSTEM} AND {MAINSTEMS_ENABLED}"
)
