"""Property-based tests (hypothesis) for correctness-critical kernels.

The reference has no property tests (SURVEY.md §5); these guard the two
invariants everything else rests on: byte-identical extraction and
canonicalization equivalence with a naive union-find oracle.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from scheduler_ray.stages.canonicalize import PID_PREFIX, UnionFind, sameas_edges_batch
from scheduler_ray.stages.extract import extract_jsonld_batch

# payload text that cannot terminate the script block early
payload_st = st.text(
    alphabet=st.characters(blacklist_characters="<", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(payload_st, st.text(alphabet="abcdefgh", min_size=1, max_size=8))
def test_extraction_roundtrip(payload, source):
    """embed(payload) → extract == payload, byte-identical, any content."""
    html = f'<html><script type="application/ld+json">{payload}</script></html>'
    batch = pa.table(
        {
            "url": pa.array([f"https://host/{source}/items/1"]),
            "html": pa.array([html.encode()], pa.binary()),
        }
    )
    out = extract_jsonld_batch(batch)
    assert out["extracted"].to_pylist() == [payload]
    assert out["source"].to_pylist() == [source]


node_st = st.one_of(
    st.integers(0, 30).map(lambda i: f"{PID_PREFIX}s/{i}"),
    st.integers(0, 30).map(lambda i: f"https://provider.example/s/{i}"),
    st.integers(0, 30).map(lambda i: f"https://mirror.example/s/{i}"),
)
edges_st = st.lists(st.tuples(node_st, node_st), min_size=0, max_size=40)


def _naive_canonical(edges):
    """Oracle: full union-find, canonical = PID (lexicographically first)
    if the cluster has one, else the lexicographically smallest member."""
    uf = UnionFind()
    members: set[str] = set()
    for a, b in edges:
        uf.union(a, b)
        members.add(a)
        members.add(b)
    clusters: dict[str, set[str]] = {}
    for m in members:
        clusters.setdefault(uf.find(m), set()).add(m)
    mapping = {}
    for _, ms in clusters.items():
        pids = sorted(m for m in ms if m.startswith(PID_PREFIX))
        canon = pids[0] if pids else min(ms)
        for m in ms:
            if m != canon:
                mapping[m] = canon
    return mapping


def _batch_of_edges(edges):
    n = len(edges)
    return pa.table(
        {
            "subj": pa.array([a for a, _ in edges], pa.large_string()),
            "pred": pa.array(["owl:sameAs"] * n, pa.large_string()),
            "obj": pa.array([b for _, b in edges], pa.large_string()),
            "obj_is_literal": pa.array([False] * n),
            "graph": pa.array(["g"] * n, pa.large_string()),
        }
    )


@settings(max_examples=200, deadline=None)
@given(edges_st)
def test_single_batch_combiner_matches_naive_uf(edges):
    """One batch's combiner output already encodes the naive-UF canonical
    mapping (PID preference included)."""
    out = sameas_edges_batch(_batch_of_edges(edges))
    got = dict(zip(out["node"].to_pylist(), out["root"].to_pylist()))
    assert got == _naive_canonical(edges)


@settings(max_examples=75, deadline=None)
@given(edges_st, st.integers(1, 4))
def test_cross_batch_merge_matches_naive_uf(edges, n_splits):
    """Splitting the edges across blocks and merging distributed must give
    the same mapping as the naive single-pass union-find."""
    import ray.data as rd

    from scheduler_ray.stages.canonicalize import collect_sameas_arrays

    rows = [
        {"subj": a, "pred": "owl:sameAs", "obj": b, "obj_is_literal": False, "graph": "g"}
        for a, b in edges
    ]
    if not rows:
        return
    ds = rd.from_items(rows).repartition(n_splits)
    keys, vals = collect_sameas_arrays(ds)
    got = dict(zip(keys.to_pylist(), vals.to_pylist()))
    assert got == _naive_canonical(edges)
