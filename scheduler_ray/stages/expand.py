"""Stage 2: JSON-LD → RDF triples (SURVEY.md M3).

Semantics of the reference's `nabu release` conversion (contract at
reference docs/hdt.md:18-21; invocation
userCode/assetGroups/release_graph_generator.py:83): expand each JSON-LD
document into ``(subj, pred, obj, obj_is_literal, graph)`` rows, where the
graph term is the per-source context (reference docs/hdt.md:3-8 — "quads
don't add anything strictly necessary" beyond provenance, so the graph
column simply carries the source id).

JSON-LD is schemaless, so parsing is inherently per-document
(``json.loads``); the stage is still a ``map_batches`` flat-map that builds
columnar output with list appends + one ``pyarrow.Table`` construction per
batch — no per-row Python *objects* escape the batch.  Documents that fail
to parse yield zero triples (the analogue of the reference's non-fatal
exit-3 harvest failures, userCode/lib/utils.py:89-97) and are counted in
the ``_parse_errors`` lineage metric via :func:`expansion_metrics_batch`.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ray.data import Dataset

RDF_TYPE = "rdf:type"
SAME_AS = "owl:sameAs"

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.large_string()),
        ("pred", pa.large_string()),
        ("obj", pa.large_string()),
        ("obj_is_literal", pa.bool_()),
        ("graph", pa.large_string()),
    ]
)


def _is_uri(v: str) -> bool:
    return v.startswith("http://") or v.startswith("https://")


def _emit_node(node: dict, graph: str, out: list) -> None:
    subj = node.get("@id")
    if not isinstance(subj, str) or not subj:
        return
    for key, val in node.items():
        if key in ("@id", "@graph"):
            continue
        if key == "@type":
            for t in val if isinstance(val, list) else [val]:
                out.append((subj, RDF_TYPE, str(t), False, graph))
            continue
        vals = val if isinstance(val, list) else [val]
        for v in vals:
            if isinstance(v, dict):
                # nested blank node (e.g. schema:geo) — flatten scalar
                # children onto the parent subject, or recurse if it has
                # its own @id.
                if "@id" in v:
                    _emit_node(v, graph, out)
                    out.append((subj, key, str(v["@id"]), False, graph))
                else:
                    for ck, cv in v.items():
                        if isinstance(cv, (str, int, float, bool)):
                            s = str(cv)
                            out.append((subj, ck, s, not _is_uri(s), graph))
            elif isinstance(v, (str, int, float, bool)):
                s = str(v)
                out.append((subj, key, s, not (isinstance(v, str) and _is_uri(s)), graph))


def expand_triples_batch(batch: pa.Table, validate: bool = False) -> pa.Table:
    """(source, extracted, …) → triple rows.  Zero rows for null/bad docs.

    With ``validate=True`` each parsed document is also checked against the
    SHACL-subset shapes (single parse — validation rides on expansion, the
    fused form of the reference's validate-during-harvest contract,
    userCode/lib/containers.py:44-48); shape-violating documents emit no
    triples.
    """
    if validate:
        from .validate import GEO_SHAPE, HYDRO_LOCATION_SHAPE, validate_parsed
    rows: list = []
    extracted = batch["extracted"].to_pylist()
    sources = batch["source"].to_pylist()
    for src, payload in zip(sources, extracted):
        if payload is None:
            continue
        try:
            doc = json.loads(payload)
        except (ValueError, TypeError):
            continue
        if not isinstance(doc, dict):
            continue
        if validate and validate_parsed(doc, HYDRO_LOCATION_SHAPE, GEO_SHAPE):
            continue
        nodes = doc.get("@graph")
        for node in nodes if isinstance(nodes, list) else [doc]:
            if isinstance(node, dict):
                _emit_node(node, src or "", rows)
    if not rows:
        return TRIPLE_SCHEMA.empty_table()
    cols = list(zip(*rows))
    return pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, TRIPLE_SCHEMA)],
        schema=TRIPLE_SCHEMA,
    )


def expansion_metrics_batch(batch: pa.Table) -> pa.Table:
    """Per-batch accounting: pages seen / no-block / parse-errors (A3/M6)."""
    n = batch.num_rows
    no_block = 0
    errors = 0
    for payload in batch["extracted"].to_pylist():
        if payload is None:
            no_block += 1
            continue
        try:
            json.loads(payload)
        except (ValueError, TypeError):
            errors += 1
    return pa.table(
        {
            "pages": pa.array([n], pa.int64()),
            "no_jsonld": pa.array([no_block], pa.int64()),
            "parse_errors": pa.array([errors], pa.int64()),
        }
    )


def expand_stage(
    extracted: Dataset, *, batch_size: int = 4096, validate: bool = False
) -> Dataset:
    import functools

    fn = functools.partial(expand_triples_batch, validate=validate)
    return extracted.map_batches(
        fn,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
