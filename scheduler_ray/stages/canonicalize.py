"""Stage 4: owl:sameAs canonicalization (SURVEY.md A1/D4).

The reference resolves every feature to its canonical Geoconnex PID
(``https://pids.geoconnex.dev/...`` — asserted at reference
userCode/defs_test.py:121-126); provider-native URIs are aliased to PIDs
via owl:sameAs edges.  We must rewrite every subject/object URI to its
cluster's canonical representative — a connected-components problem over
the sameAs edge graph (chains can be multi-hop: alias → provider → PID).

Ray-Data-first, shuffle-free for the big side:

1. ``sameas_edges``: filter the triple stream to sameAs edges
   (``map_batches`` predicate — the edge set is a tiny fraction of the
   triples).
2. Per-batch **union-find combiner**: each batch collapses its edges
   locally and emits at most one ``(node, root)`` pair per distinct node —
   the classic mergeable-summary pattern, so the driver only ever sees the
   *compressed* alias set, never the raw triples.
3. Driver merges the partial union-finds (alias count ≪ triple count) and
   picks the canonical representative per cluster: the PID if the cluster
   contains one, else the lexicographically smallest URI (deterministic).
4. The mapping is broadcast (``ray.put``) and applied with a fully
   vectorized ``pc.index_in`` + ``pc.take`` rewrite inside ``map_batches``
   — no shuffle of the triple set at all.

Scale note (10^12 docs): step 3 holds one dict entry per *aliased
entity* on the driver.  If the alias set itself outgrows one node, swap
step 2-3 for the hash-partitioned min-label propagation in
:func:`connected_components_distributed` (same output, all-shuffle), which
is provided and tested; the broadcast rewrite in step 4 is unchanged
except the mapping becomes a broadcast-joined small table per partition.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .expand import SAME_AS

PID_PREFIX = "https://pids.geoconnex.dev/"


class UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:
            p[x], x = root, p[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic orientation: larger string points at smaller
            if ra < rb:
                ra, rb = rb, ra
            self.parent[ra] = rb

    def items(self):
        for node in list(self.parent):
            yield node, self.find(node)


def sameas_edges_batch(batch: pa.Table) -> pa.Table:
    """Compress one batch of triples to (node, root) partial-UF pairs."""
    mask = pc.equal(batch["pred"], SAME_AS)
    edges = batch.filter(mask)
    uf = UnionFind()
    for s, o in zip(edges["subj"].to_pylist(), edges["obj"].to_pylist()):
        uf.union(s, o)
    nodes, roots = [], []
    for n, r in uf.items():
        nodes.append(n)
        roots.append(r)
    return pa.table(
        {"node": pa.array(nodes, pa.large_string()), "root": pa.array(roots, pa.large_string())}
    )


def collect_sameas_mapping(triples: Dataset) -> dict[str, str]:
    """Edges → alias→canonical dict (driver-side merge of partial UFs)."""
    partials = triples.map_batches(
        sameas_edges_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    uf = UnionFind()
    for b in partials.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for n, r in zip(b["node"].to_pylist(), b["root"].to_pylist()):
            uf.union(n, r)
    # cluster → choose canonical rep (prefer the Geoconnex PID)
    clusters: dict[str, list[str]] = {}
    for n, r in uf.items():
        clusters.setdefault(r, []).append(n)
    mapping: dict[str, str] = {}
    for root, members in clusters.items():
        all_members = sorted(set(members) | {root})
        pids = [m for m in all_members if m.startswith(PID_PREFIX)]
        canon = pids[0] if pids else all_members[0]
        for m in all_members:
            if m != canon:
                mapping[m] = canon
    return mapping


class CanonicalRewriter:
    """Actor-pool stage: vectorized alias→canonical rewrite + sameAs drop."""

    def __init__(self, mapping_ref, drop_sameas: bool = True):
        mapping = mapping_ref
        if isinstance(mapping, ray.ObjectRef):
            mapping = ray.get(mapping)
        self.keys = pa.array(list(mapping.keys()), pa.large_string())
        self.vals = pa.array(list(mapping.values()), pa.large_string())
        self.drop_sameas = drop_sameas

    def _rewrite(self, col: pa.ChunkedArray) -> pa.Array:
        col = pc.cast(col, pa.large_string())
        if len(self.keys) == 0:
            return col
        idx = pc.index_in(col, value_set=self.keys)
        repl = pc.take(self.vals, idx)
        return pc.coalesce(repl, col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.drop_sameas:
            batch = batch.filter(pc.not_equal(batch["pred"], SAME_AS))
        subj = self._rewrite(batch["subj"])
        # only URI objects are entity references; literals are untouched
        obj = pc.if_else(
            batch["obj_is_literal"],
            pc.cast(batch["obj"], pa.large_string()),
            self._rewrite(batch["obj"]),
        )
        i_subj = batch.schema.get_field_index("subj")
        i_obj = batch.schema.get_field_index("obj")
        return batch.set_column(i_subj, "subj", subj).set_column(i_obj, "obj", obj)


def canonicalize_stage(
    triples: Dataset,
    mapping: dict[str, str],
    *,
    drop_sameas: bool = True,
    batch_size: int = 65536,
    concurrency: int | tuple[int, int] = (1, 4),
) -> Dataset:
    mapping_ref = ray.put(mapping)
    return triples.map_batches(
        CanonicalRewriter,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"mapping_ref": mapping_ref, "drop_sameas": drop_sameas},
        zero_copy_batch=True,
    )


def connected_components_distributed(
    edges: Dataset, *, max_iters: int = 10
) -> Dataset:
    """All-shuffle min-label propagation for alias sets too big to broadcast.

    ``edges(node, root)`` → ``(node, label)`` where label is the cluster
    minimum (with PID preference encoded by a sort key prefix).  Each
    iteration is one ``groupby(node).min(label)`` plus an edge relabel;
    Geoconnex sameAs chains are shallow (SURVEY.md §7), so this converges
    in 2-3 iterations.  Provided for the 10^12-doc path; the default
    pipeline uses the broadcast combiner above.
    """
    import pandas as pd

    def sort_key(u: pd.Series) -> pd.Series:
        # PIDs sort before everything else so min-label == canonical rep
        return pd.Series(
            ["0" + x if x.startswith(PID_PREFIX) else "1" + x for x in u], index=u.index
        )

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        a = pd.DataFrame({"node": b["node"], "peer": b["root"]})
        c = pd.DataFrame({"node": b["root"], "peer": b["node"]})
        s = pd.DataFrame({"node": b["node"], "peer": b["node"]})
        t = pd.DataFrame({"node": b["root"], "peer": b["root"]})
        return pd.concat([a, c, s, t], ignore_index=True)

    und = edges.map_batches(undirect, batch_format="pandas")

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["node"], "label": sort_key(b["peer"])})

    labels = und.map_batches(keyed, batch_format="pandas").groupby("node").min("label")
    labels = labels.map_batches(
        lambda b: b.rename(columns={"min(label)": "label"}), batch_format="pandas"
    )
    for _ in range(max_iters - 1):
        lab = labels.to_pandas()
        lut = dict(zip(lab["node"], lab["label"]))

        def prop(b: pd.DataFrame, lut=lut) -> pd.DataFrame:
            lbl = b["node"].map(lambda n: lut.get(n, "1" + n))
            peer_lbl = b["peer"].map(lambda n: lut.get(n, "1" + n))
            return pd.DataFrame({"node": b["node"], "label": peer_lbl.combine(lbl, min)})

        new_labels = und.map_batches(prop, batch_format="pandas").groupby("node").min("label")
        new_labels = new_labels.map_batches(
            lambda b: b.rename(columns={"min(label)": "label"}), batch_format="pandas"
        )
        new_lab = new_labels.to_pandas().sort_values("node").reset_index(drop=True)
        old_lab = lab.sort_values("node").reset_index(drop=True)
        labels = new_labels
        if old_lab.equals(new_lab):
            break

    def strip(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["node"], "label": b["label"].str.slice(1)})

    return labels.map_batches(strip, batch_format="pandas")
