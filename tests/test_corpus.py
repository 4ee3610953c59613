"""Corpus generator: determinism + rule coverage (SURVEY.md §5 strategy)."""

from __future__ import annotations

import json

import pandas as pd
import pyarrow.parquet as pq

from scheduler_ray.corpus import (
    MALFORMED_JSON,
    amplify_documents,
    jsonld_for_documents,
    pages_from_documents,
    registry_from_documents,
    sources_config,
)

DOCS = pd.DataFrame(
    {
        "doc_id": [0, 1, 2, 3, 17, 19, 20, 30, 323],
        "text": ["t" + str(i) for i in range(9)],
        "lang": ["en"] * 9,
        "source": ["src0", "src1", "src2", "src3", "src4", "src5", "src6", "src7", "src8"],
        "n_chars": [10, 11, 12, 13, 14, 15, 16, 17, 18],
    }
)


def test_case_rules():
    j = jsonld_for_documents(DOCS)
    by_id = dict(zip(DOCS["doc_id"], j))
    assert by_id[0] is None  # %17
    assert by_id[17] is None
    assert by_id[323] is None  # 17*19: %17 wins
    assert by_id[19] == MALFORMED_JSON
    assert '"@id":"https://pids.geoconnex.dev/src1/1"' in by_id[1]  # case A
    assert "sameAs" not in by_id[1]
    d2 = json.loads(by_id[2])  # case B parses and has a 1-hop sameAs
    assert d2["@id"] == "https://provider.example/src2/2"
    assert d2["owl:sameAs"] == "https://pids.geoconnex.dev/src2/2"
    d20 = json.loads(by_id[20])  # case C: 2-node @graph chain
    nodes = d20["@graph"]
    assert len(nodes) == 2
    assert nodes[0]["@id"] == "https://mirror.example/src6/20"
    assert nodes[0]["owl:sameAs"] == "https://provider.example/src6/20"
    assert nodes[1] == {
        "@id": "https://provider.example/src6/20",
        "owl:sameAs": "https://pids.geoconnex.dev/src6/20",
    }


def test_pages_deterministic_and_ascii_embed():
    p1 = pages_from_documents(DOCS)
    p2 = pages_from_documents(DOCS.copy())
    pd.testing.assert_frame_equal(p1, p2)
    # the ld+json block is embedded byte-identically, inside the page's
    # doc_id%7 script-tag variant (5-6 wrap the content in CDATA / comment)
    from scheduler_ray.corpus import (
        SCRIPT_CLOSE_VARIANTS,
        SCRIPT_OPEN_VARIANTS,
        WRAP_PRE_VARIANTS,
        WRAP_SUF_VARIANTS,
    )

    j = jsonld_for_documents(DOCS)
    for did, suffix in [(2, "/items/2"), (1, "/items/1"), (19, "/items/19"), (20, "/items/20")]:
        row = p1[p1["url"].str.endswith(suffix)].iloc[0]
        payload = j[DOCS.index[DOCS["doc_id"] == did][0]]
        vi = did % 7
        block = (
            SCRIPT_OPEN_VARIANTS[vi]
            + WRAP_PRE_VARIANTS[vi]
            + payload
            + WRAP_SUF_VARIANTS[vi]
            + SCRIPT_CLOSE_VARIANTS[vi]
        )
        assert block.encode() in row["html"]
    assert WRAP_PRE_VARIANTS[5] == "/*<![CDATA[*/" and WRAP_SUF_VARIANTS[6] == "-->"


def test_registry_and_sources():
    r = registry_from_documents(DOCS)
    assert (r["id"].str.startswith("https://pids.geoconnex.dev/")).all()
    assert r.loc[r["id"].str.endswith("/src0/0"), "mainstem_uri"].notna().all()  # %3==0
    assert r.loc[r["id"].str.endswith("/src1/1"), "mainstem_uri"].isna().all()
    s = sources_config(DOCS["source"])
    en = dict(zip(s["source_id"], s["add_associated_mainstems"]))
    assert en["src3"] is False and en["src7"] is False  # n%4==3 disabled
    assert en["src0"] is True and en["src2"] is True


def test_amplify_disjoint_ids():
    a = amplify_documents(DOCS, 3)
    assert len(a) == 3 * len(DOCS)
    assert a["doc_id"].is_unique


def test_fixture_cached(fixture_sf0001):
    meta = pq.read_metadata(f"{fixture_sf0001}/pages/part-00000.parquet")
    assert meta.num_rows == 500
