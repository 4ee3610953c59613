"""Golden n-quads format parity with the reference release graphs.

Mirrors reference userCode/defs_test.py:55-130: gzip-decode a release
file, assert the exact full-IRI linearElement substring, check every line
against the N-Quads grammar, and run the 3-hop
referencedPosition/HY_IndirectPosition/linearElement join (the SPARQL
pattern the reference asserts) against the analytic golden pid→mainstem
pairs.
"""

from __future__ import annotations

import gzip
import os
import re

import duckdb

from scheduler_ray import oracles
from scheduler_ray.pipelines import flagship
from scheduler_ray.sources import nq

#: one N-Quads statement: 3 terms + graph + ' .'
_NQ_LINE = re.compile(
    r"^(?P<s><[^>]+>|_:\S+) (?P<p><[^>]+>) "
    r"(?P<o><[^>]+>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:@[A-Za-z-]+|\^\^<[^>]+>)?) "
    r"(?P<g><[^>]+>) \.$"
)

HYF = "https://www.opengis.net/def/schema/hy_features/hyf/"


def _golden_pairs(sf_dir: str) -> dict[str, str]:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    df = con.sql(oracles.ENTITY_LINK_SQL).df()
    return dict(zip(df["subj"], df["mainstem_uri"]))


def test_release_nq_golden_format(fixture_sf0001, tmp_out):
    canon = flagship.run_flagship(fixture_sf0001).materialize()
    nq.write_release_graphs(canon, tmp_out, hyf_structural=True)
    graphs_dir = os.path.join(tmp_out, "graphs", "latest")
    files = sorted(os.listdir(graphs_dir))
    assert files and all(f.endswith("_release.nq.gz") for f in files)

    text = ""
    for f in files:
        with gzip.open(os.path.join(graphs_dir, f), "rt") as fh:
            text += fh.read()
    lines = [ln for ln in text.splitlines() if ln]
    # every line satisfies the N-Quads grammar
    for ln in lines:
        assert _NQ_LINE.match(ln), ln
    # the reference's byte-asserted substring shape (defs_test.py:75-80)
    assert f"<{HYF}linearElement> <https://reference.geoconnex.us/collections/mainstems/items/" in text

    # 3-hop join ≡ the reference's SPARQL pattern (defs_test.py:104-130)
    ref_pos: dict[str, str] = {}
    ind_pos: dict[str, str] = {}
    linear: dict[str, str] = {}
    for ln in lines:
        m = _NQ_LINE.match(ln)
        s, p, o = m.group("s"), m.group("p")[1:-1], m.group("o")
        if p == f"{HYF}referencedPosition":
            ref_pos[s[1:-1]] = o
        elif p == f"{HYF}HY_IndirectPosition":
            ind_pos[s] = o
        elif p == f"{HYF}linearElement":
            linear[s] = o[1:-1]
    got = {
        pid: linear[ind_pos[rp]]
        for pid, rp in ref_pos.items()
        if rp in ind_pos and ind_pos[rp] in linear
    }
    want = _golden_pairs("/root/testdata/sf0.001")
    assert got == want and len(want) > 0
    # typed + language-tagged literals appear in proper N-Quads syntax
    assert '"2026-01-17"^^<schema:Date>' in text or '"2026-01-17"^^<https://schema.org/Date>' in text
    assert re.search(r'"Fluss \d+"@de', text)
