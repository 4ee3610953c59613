"""Stage 3: entity linking against the PID registry (SURVEY.md J1/J2, ST1/ST2).

Semantics of the reference's mainstem association: during `nabu release`,
each hydrologic feature is joined against the mainstem hydrofabric and
gains a ``hyf:referencedPosition/HY_IndirectPosition/hyf:linearElement``
triple pointing at its mainstem (reference
userCode/assetGroups/release_graph_generator.py:41-83; golden pairs
asserted at userCode/defs_test.py:75-80,104-130 — dam 1076356 → mainstem
36825).  The join is gated per source by the sitemap hint
``geoconnex:add_associated_mainstems``
(userCode/assetGroups/testdata/sitemap.xml:13).

Ray-Data-first: the registry is the *small* side, so there is **no
shuffle** — it is broadcast once with ``ray.put`` and loaded once per
actor in ``__init__`` (actor pool via ``map_batches(EntityLinker,
concurrency=...)``).  Candidate generation is token-blocking over an
inverted index (minhash-style blocking with a document-frequency cutoff),
scoring is token-set Jaccard, and the argmax per mention is resolved
locally — the whole link is a per-batch lookup.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .expand import TRIPLE_SCHEMA

LINEAR_ELEMENT = "hyf:linearElement"
NAME_PRED = "schema:name"

_TOKEN_RE = re.compile(r"[a-z0-9]+")

#: tokens appearing in more than this fraction of registry names are too
#: common to block on (the "feature" token in 'Feature 123' — analogous to
#: stop-band pruning in minhash blocking).
_DF_CUTOFF = 0.25


def _tokens(s: str) -> list[str]:
    return _TOKEN_RE.findall(s.lower())


class RegistryIndex:
    """Token-blocked candidate index over the registry (built once/actor)."""

    def __init__(self, registry: pd.DataFrame):
        self.ids = registry["id"].to_numpy()
        self.mainstems = registry["mainstem_uri"].to_numpy(dtype=object)
        self.token_sets: list[frozenset[str]] = [
            frozenset(_tokens(n)) for n in registry["feature_name"]
        ]
        postings: dict[str, list[int]] = defaultdict(list)
        for i, toks in enumerate(self.token_sets):
            for t in toks:
                postings[t].append(i)
        cutoff = max(2.0, _DF_CUTOFF * len(self.token_sets))
        self.postings = {t: p for t, p in postings.items() if len(p) <= cutoff}

    def link(self, name: str, min_score: float = 0.5) -> tuple[str | None, str | None]:
        """mention name → (pid, mainstem_uri) or (None, None)."""
        q = frozenset(_tokens(name))
        cands: set[int] = set()
        for t in q:
            cands.update(self.postings.get(t, ()))
        best_i, best_s = -1, min_score
        for i in sorted(cands):  # sorted → deterministic tie-break
            ts = self.token_sets[i]
            inter = len(q & ts)
            if not inter:
                continue
            s = inter / (len(q) + len(ts) - inter)
            if s > best_s:
                best_i, best_s = i, s
        if best_i < 0:
            return None, None
        return self.ids[best_i], self.mainstems[best_i]


class EntityLinker:
    """Actor-pool stage: triples in → triples + mainstem link triples out.

    State (registry index, per-source gating) is built ONCE per actor from
    broadcast ``ray.put`` refs — never re-shipped per batch.
    """

    def __init__(self, registry_ref, sources_ref):
        registry = registry_ref
        if isinstance(registry, ray.ObjectRef):
            registry = ray.get(registry)
        sources = sources_ref
        if isinstance(sources, ray.ObjectRef):
            sources = ray.get(sources)
        self.index = RegistryIndex(registry)
        self.mainstems_enabled: dict[str, bool] = dict(
            zip(sources["source_id"], sources["add_associated_mainstems"])
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = batch["pred"].to_pylist()
        name_rows = [i for i, p in enumerate(preds) if p == NAME_PRED]
        if not name_rows:
            return batch
        subjs = batch["subj"].to_pylist()
        objs = batch["obj"].to_pylist()
        graphs = batch["graph"].to_pylist()
        new: list = []
        for i in name_rows:
            if not self.mainstems_enabled.get(graphs[i], False):
                continue
            pid, mainstem = self.index.link(objs[i])
            if pid is not None and mainstem is not None and not pd.isna(mainstem):
                # emit at the *raw* subject; canonicalization rewrites it to
                # the PID together with everything else.
                new.append((subjs[i], LINEAR_ELEMENT, str(mainstem), False, graphs[i]))
        if not new:
            return batch
        cols = list(zip(*new))
        extra = pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, TRIPLE_SCHEMA)],
            schema=TRIPLE_SCHEMA,
        )
        return pa.concat_tables([batch.cast(TRIPLE_SCHEMA), extra])


def link_stage(
    triples: Dataset,
    registry: pd.DataFrame,
    sources: pd.DataFrame,
    *,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 8192,
) -> Dataset:
    registry_ref = ray.put(registry)
    sources_ref = ray.put(sources)
    return triples.map_batches(
        EntityLinker,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "registry_ref": registry_ref,
            "sources_ref": sources_ref,
        },
        zero_copy_batch=True,
    )
