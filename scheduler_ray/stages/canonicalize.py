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

import numpy as np
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
    """Compress one batch of triples to (node, root) pairs.

    Each batch union-finds its own edges and emits node → *canonical*
    (PID-preferring, deterministic) pairs.  Because a document's sameAs
    edges are emitted adjacently by the expansion stage, within-batch
    closure resolves nearly every cluster — the driver-side merge then
    only deduplicates identical pairs and pointer-jumps the rare
    cross-batch chain (see collect_sameas_arrays).
    """
    mask = pc.equal(batch["pred"], SAME_AS)
    edges = batch.filter(mask)
    uf = UnionFind()
    for s, o in zip(edges["subj"].to_pylist(), edges["obj"].to_pylist()):
        uf.union(s, o)
    clusters: dict[str, list[str]] = {}
    for n, r in uf.items():
        clusters.setdefault(r, []).append(n)
    nodes, roots = [], []
    for root, members in clusters.items():
        all_members = members if root in members else members + [root]
        canon = None
        for m in all_members:
            if m.startswith(PID_PREFIX) and (canon is None or m < canon):
                canon = m
        if canon is None:
            canon = min(all_members)
        for m in all_members:
            if m != canon:
                nodes.append(m)
                roots.append(canon)
    import pandas as pd

    node_hash = pd.util.hash_array(np.array(nodes, dtype=object)) if nodes else np.array([], np.uint64)
    root_hash = pd.util.hash_array(np.array(roots, dtype=object)) if roots else np.array([], np.uint64)
    # hashes computed here (distributed) so the driver merge never touches
    # Python string objects on its fast path
    return pa.table(
        {
            "node": pa.array(nodes, pa.large_string()),
            "root": pa.array(roots, pa.large_string()),
            "node_hash": pa.array(node_hash, pa.uint64()),
            "root_hash": pa.array(root_hash, pa.uint64()),
        }
    )


def _merge_pairs_vectorized(nodes, roots, max_iters: int = 16):
    """Driver-side CC merge over compressed (node, root) pairs — integer
    min-label propagation with pointer jumping (numpy, no per-edge Python
    loop; O(E · α) in practice because alias chains are shallow).

    Canonical representative = cluster minimum under a sort key that ranks
    Geoconnex PIDs first ('0'+pid < '1'+other), matching the reference's
    PID-canonical convention (userCode/defs_test.py:121-126).
    """
    import numpy as np
    import pandas as pd

    canon_idx, uniq = _merge_pairs_idx(nodes, roots, max_iters)
    changed = np.flatnonzero(canon_idx != np.arange(len(uniq)))
    return {uniq[i]: uniq[canon_idx[i]] for i in changed}


def _merge_pairs_idx(nodes, roots, max_iters: int = 16):
    import numpy as np
    import pandas as pd

    codes, uniq = pd.factorize(np.concatenate([nodes, roots]))
    n_edges = len(nodes)
    a, b = codes[:n_edges], codes[n_edges:]
    not_pid = ~pd.Series(uniq).str.startswith(PID_PREFIX).to_numpy()
    # rank PIDs first, lexicographic within rank — matches the per-batch
    # combiner's choice so cross-batch clusters (incl. the pathological
    # two-PID cluster) land on the same canonical everywhere.  This exact
    # path only sees conflict subsets (the hash fast path handles the
    # bulk), so string sorting here is cheap.
    order = np.lexsort((uniq, not_pid))
    pri = np.empty(len(uniq), np.int64)
    pri[order] = np.arange(len(uniq))
    lab = pri.copy()
    for _ in range(max_iters):
        old = lab.copy()
        np.minimum.at(lab, a, lab[b])
        np.minimum.at(lab, b, lab[a])
        lab = np.minimum(lab, lab[order[lab]])  # pointer jump
        if np.array_equal(lab, old):
            break
    return order[lab], uniq


def collect_sameas_arrays(triples: Dataset):
    """Broadcast-ready ``(keys, vals)`` alias→canonical Arrow arrays.

    The heavy lifting (per-cluster canonical choice) happened inside the
    distributed per-batch combiner; the driver merge is O(pairs) and fully
    vectorized:

    1. drop duplicate (node, canon) pairs (a node's cluster usually lives
       in exactly one batch);
    2. nodes with *conflicting* canons across batches — cross-batch
       clusters — are resolved with the exact min-label merge over just
       the conflicted subset (tiny);
    3. pointer-jump canons through the mapping (≤5 rounds) so chains that
       straddle batches land on the final representative.
    """
    import pandas as pd

    # the combiner runs as raw Ray tasks over the dataset's block refs:
    # for a materialized dataset this skips a whole streaming-executor
    # round-trip (to_arrow_refs is free), and the per-block combiner needs
    # no pipelining — one of the few places raw tasks beat the Dataset API
    block_refs = triples.to_arrow_refs()

    @ray.remote(num_cpus=1)
    def _combine(block: pa.Table) -> pa.Table:
        if block.num_rows == 0 or "pred" not in block.schema.names:
            return pa.table({})  # empty placeholder block
        return sameas_edges_batch(block)

    tables = [t for t in ray.get([_combine.remote(r) for r in block_refs]) if t.num_rows > 0]
    empty = pa.array([], pa.large_string())
    if not tables:
        return empty, empty
    tbl = pa.concat_tables(tables)
    # fast path: when every node appears exactly once (the common case —
    # a document's sameAs cluster lives in one batch) and no canon is
    # itself aliased, the pairs ARE the mapping.  Both conditions are
    # checked on the 64-bit hash columns the combiner computed — the
    # driver never touches Python string objects; any suspicion
    # (including a hash collision) falls through to the exact merge.
    hn = tbl["node_hash"].to_numpy()
    hr = tbl["root_hash"].to_numpy()
    hn_sorted = np.sort(hn)
    no_dups = bool((hn_sorted[1:] != hn_sorted[:-1]).all()) if len(hn) > 1 else True
    if no_dups:
        pos = np.searchsorted(hn_sorted, hr)
        pos_c = np.clip(pos, 0, len(hn_sorted) - 1)
        chained = hn_sorted[pos_c] == hr
        if not chained.any():
            return (
                tbl["node"].combine_chunks(),
                tbl["root"].combine_chunks(),
            )
    # exact path: integer-coded via one factorize, then pure numpy
    pdf = tbl.select(["node", "root"]).to_pandas()
    nodes_np, roots_np = pdf["node"].to_numpy(), pdf["root"].to_numpy()
    codes, uniq = pd.factorize(np.concatenate([nodes_np, roots_np]))
    n_pairs = len(nodes_np)
    a, b = codes[:n_pairs].astype(np.int64), codes[n_pairs:].astype(np.int64)
    # dedup identical pairs
    pk = a * len(uniq) + b
    pk_u = np.unique(pk)
    a, b = pk_u // len(uniq), pk_u % len(uniq)
    # conflicted nodes: same node, different canons across batches
    a_sorted = np.sort(a)
    dup_nodes = np.unique(a_sorted[:-1][a_sorted[:-1] == a_sorted[1:]]) if len(a) > 1 else np.array([], np.int64)
    if len(dup_nodes):
        in_conf_node = np.zeros(len(uniq), bool)
        in_conf_node[dup_nodes] = True
        conf_mask = in_conf_node[a]
        # grow the conflict graph by pairs touching any conflicted string
        conf_strings = np.zeros(len(uniq), bool)
        conf_strings[a[conf_mask]] = True
        conf_strings[b[conf_mask]] = True
        conf_mask = conf_strings[a] | conf_strings[b]
        ca, cb = a[conf_mask], b[conf_mask]
        canon_idx, cuniq = _merge_pairs_idx(uniq[ca], uniq[cb])
        changed = np.flatnonzero(canon_idx != np.arange(len(cuniq)))
        res_keys, res_vals = cuniq[changed], cuniq[canon_idx[changed]]
        # recombine with the clean remainder (re-coded once more)
        ka = np.concatenate([uniq[a[~conf_mask]], res_keys])
        va = np.concatenate([uniq[b[~conf_mask]], res_vals])
        codes, uniq = pd.factorize(np.concatenate([ka, va]))
        half = len(ka)
        a, b = codes[:half].astype(np.int64), codes[half:].astype(np.int64)
    # pointer jumping (numpy): a canon that is itself aliased follows on.
    # Loop until convergence (path length halves per round → ≤ log2(chain)
    # rounds); a fixed iteration count would silently leave deep cross-batch
    # chains canonicalized to an intermediate alias (ADVICE r1).
    lut = np.full(len(uniq), -1, np.int64)
    lut[a] = b
    for _ in range(64):
        jumped = lut[b]
        mask = jumped >= 0
        if not mask.any():
            break
        b = np.where(mask, jumped, b)
    keep = a != b
    keys = pa.array(uniq[a[keep]], pa.large_string())
    vals = pa.array(uniq[b[keep]], pa.large_string())
    return keys, vals


def collect_sameas_mapping(triples: Dataset) -> dict[str, str]:
    """Edges → alias→canonical dict (driver-side merge of partial UFs).

    Driver memory is bounded by the number of *aliased* entities (the
    per-batch combiner compresses everything else away); see module
    docstring for the 10^12-doc alternative.
    """
    partials = triples.map_batches(
        sameas_edges_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    pdf = partials.to_pandas()
    if not len(pdf):
        return {}
    return _merge_pairs_vectorized(pdf["node"].to_numpy(), pdf["root"].to_numpy())


def local_exact_dedup(tbl: pa.Table) -> pa.Table:
    """Within-block exact-(subj,pred,obj) dedup.

    Hash prefilter: rows whose 64-bit combined hash is unique are kept
    without any string comparison; only hash-colliding candidates go
    through an exact pandas dedup (usually zero rows).
    """
    import numpy as np
    import pandas as pd

    if tbl.num_rows < 2:
        return tbl
    hs = pd.util.hash_array(tbl["subj"].to_numpy(zero_copy_only=False))
    hp = pd.util.hash_array(tbl["pred"].to_numpy(zero_copy_only=False))
    ho = pd.util.hash_array(tbl["obj"].to_numpy(zero_copy_only=False))
    h = hs * np.uint64(1000003) + hp * np.uint64(31) + ho
    dup_any = pd.Series(h).duplicated(keep=False).to_numpy()
    if not dup_any.any():
        return tbl
    uniq_part = tbl.filter(pa.array(~dup_any))
    cand = tbl.filter(pa.array(dup_any)).to_pandas()
    cand = cand.drop_duplicates(subset=["subj", "pred", "obj"], keep="first")
    return pa.concat_tables(
        [uniq_part, pa.Table.from_pandas(cand, preserve_index=False, schema=tbl.schema)]
    )


class CanonicalRewriter:
    """Actor-pool stage: vectorized alias→canonical rewrite + sameAs drop."""

    def __init__(self, mapping_ref, drop_sameas: bool = True):
        mapping = mapping_ref
        if isinstance(mapping, ray.ObjectRef):
            mapping = ray.get(mapping)
        if isinstance(mapping, tuple):
            # broadcast-friendly form: (keys, vals) Arrow arrays — memcpy
            # deserialization instead of rebuilding a Python dict per worker
            self.keys, self.vals = mapping
        else:
            self.keys = pa.array(list(mapping.keys()), pa.large_string())
            self.vals = pa.array(list(mapping.values()), pa.large_string())
        self.drop_sameas = drop_sameas

    def _rewrite(self, col: pa.ChunkedArray) -> pa.Array:
        col = pc.cast(col, pa.large_string())
        if len(self.keys) == 0:
            return col
        # index_in rebuilds its value_set hash table per call — callers keep
        # block counts low/fixed so this fixed cost stays a small fraction
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
    batch_size: int | None = 65536,
    concurrency: int | tuple[int, int] = (1, 4),
    use_actors: bool = False,
    local_dedup: bool = False,
) -> Dataset:
    """Vectorized alias→canonical rewrite over a broadcast mapping.

    Default is task-mode (per-worker-process cached broadcast, see
    link_stage docstring); ``use_actors=True`` gives the classic actor
    pool.  ``local_dedup=True`` folds a within-batch exact-triple dedup
    into the same stage (cheap combiner before any global dedup).
    """
    if isinstance(mapping, dict):
        mapping = (
            pa.array(list(mapping.keys()), pa.large_string()),
            pa.array(list(mapping.values()), pa.large_string()),
        )
    mapping_ref = ray.put(mapping)
    if use_actors:
        return triples.map_batches(
            CanonicalRewriter,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs={"mapping_ref": mapping_ref, "drop_sameas": drop_sameas},
            zero_copy_batch=True,
        )

    from .link import _cached_get

    def rewrite_fn(batch: pa.Table) -> pa.Table:
        key = "rewriter:" + mapping_ref.hex()
        from .link import _BROADCAST_CACHE

        rw = _BROADCAST_CACHE.get(key)
        if rw is None:
            rw = CanonicalRewriter(_cached_get(mapping_ref), drop_sameas=drop_sameas)
            _BROADCAST_CACHE[key] = rw
        out = rw(batch)
        if local_dedup:
            out = local_exact_dedup(out)
        return out

    return triples.map_batches(
        rewrite_fn,
        batch_format="pyarrow",
        batch_size=batch_size,
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
