"""N-Quads sink (conformance with the reference's release-graph layout).

The reference emits one gzip-compressed n-quads file per source:
``graphs/latest/<partition>_release.nq.gz`` (`nabu release --compress`,
reference release_graph_generator.py:83; naming asserted at
userCode/defs_test.py:67-69).  We reproduce that layout from the triple
Dataset: ``groupby(graph).map_groups`` — each group task serializes and
gzips its own source's file (parallel, one file per partition).

CURIE prefixes are expanded to absolute IRIs per the schema.org / HY
vocabularies the reference's documents use (docs/hdt.md).
"""

from __future__ import annotations

import gzip
import os

import pandas as pd

from ray.data import Dataset

PREFIXES = {
    "rdf:": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "owl:": "http://www.w3.org/2002/07/owl#",
    "schema:": "https://schema.org/",
    "hyf:": "https://www.opengis.net/def/schema/hy_features/hyf/",
}


def expand_curie(term: str) -> str:
    for pfx, base in PREFIXES.items():
        if term.startswith(pfx):
            return base + term[len(pfx) :]
    return term


def _escape_literal(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def triple_to_nq(subj: str, pred: str, obj: str, is_literal: bool, graph: str) -> str:
    s = f"<{expand_curie(subj)}>"
    p = f"<{expand_curie(pred)}>"
    if is_literal:
        o = f'"{_escape_literal(obj)}"'
    else:
        o = f"<{expand_curie(obj)}>"
    g = f"<urn:graph:{graph}>"
    return f"{s} {p} {o} {g} ."


def write_release_graphs(triples: Dataset, out_dir: str) -> pd.DataFrame:
    """triples → ``{out_dir}/graphs/latest/<source>_release.nq.gz`` per
    source.  Returns a summary frame (source, n_quads, path)."""
    graphs_dir = os.path.join(out_dir, "graphs", "latest")
    os.makedirs(graphs_dir, exist_ok=True)

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        source = g["graph"].iloc[0]
        g = g.sort_values(["pred", "subj", "obj"])  # deterministic bytes
        lines = [
            triple_to_nq(s, p, o, lit, source)
            for s, p, o, lit in zip(g["subj"], g["pred"], g["obj"], g["obj_is_literal"])
        ]
        safe = "".join(c if c.isalnum() or c in "-_." else "-" for c in source)
        path = os.path.join(graphs_dir, f"{safe}_release.nq.gz")
        # mtime=0 → byte-identical gzip output across reruns (the analogue
        # of the reference's bytesum idempotency check)
        with open(path, "wb") as f:
            with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                gz.write(("\n".join(lines) + "\n").encode())
        return pd.DataFrame({"source": [source], "n_quads": [len(lines)], "path": [path]})

    return (
        triples.groupby("graph")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
