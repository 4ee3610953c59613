"""Triple-permutation index — the native analogue of the reference's
QLever index build (S10, reference userCode/assetGroups/export.py:194-235:
``qlever index --stxxl-memory 11GB`` as an external subprocess over the
pulled .nq).  QLever materializes sorted permutations of the triple table
and serves pattern lookups by binary search; the Ray-Data-native version
materializes the same sorted permutations as range-partitioned parquet
layouts with a per-file key-range manifest, and serves lookups by manifest
pruning + sorted-file scan.

Shape at 100 TB: each permutation is ONE global range-partitioned sort
(`Dataset.sort` — the unavoidable all-to-all, paid once at index build,
exactly like QLever's stxxl external sort), then a streaming per-block
write.  Lookups read only the files whose key range intersects the probe —
O(matching bytes), never a full scan.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

#: permutation name → sort key order (any single/prefix triple pattern is
#: served by one of these three, QLever-style)
PERMUTATIONS: dict[str, tuple[str, str, str]] = {
    "spo": ("subj", "pred", "obj"),
    "pos": ("pred", "obj", "subj"),
    "osp": ("obj", "subj", "pred"),
}

_MANIFEST = "_index_manifest.parquet"


def build_triple_index(
    graph: Dataset,
    out_dir: str,
    permutations: tuple[str, ...] = ("spo", "pos", "osp"),
) -> dict:
    """Materialize sorted permutation layouts of a triple Dataset.

    Each permutation: global sort on its key order, then a streaming
    per-block parquet write recording the block's leading-key [lo, hi]
    in the permutation manifest — the pruning structure lookups use.
    """
    os.makedirs(out_dir, exist_ok=True)
    summary: dict[str, int] = {}
    for name in permutations:
        keys = PERMUTATIONS[name]
        pdir = os.path.join(out_dir, name)
        os.makedirs(pdir, exist_ok=True)
        lead = keys[0]

        def write_block(
            tbl: pa.Table, pdir: str = pdir, lead: str = lead,
            keys: tuple[str, str, str] = keys,
        ) -> pa.Table:
            if tbl.num_rows == 0:
                return pa.table(
                    {"file": pa.array([], pa.large_string()),
                     "lo": pa.array([], pa.large_string()),
                     "hi": pa.array([], pa.large_string()),
                     "rows": pa.array([], pa.int64())}
                )
            import hashlib

            col = tbl[lead]
            lo = pc.min(col).as_py()
            hi = pc.max(col).as_py()
            # stem from the FULL first/last key rows + count: a hot leading
            # key (one pred spanning many equal-size POS blocks) makes
            # (lo, hi, rows) collide, but rows are distinct triples in one
            # globally sorted sequence, so the boundary rows are unique
            first = "|".join(str(tbl[k][0].as_py()) for k in keys)
            last = "|".join(str(tbl[k][-1].as_py()) for k in keys)
            stem = hashlib.md5(
                f"{first}\x1f{last}\x1f{tbl.num_rows}".encode()
            ).hexdigest()[:16]
            path = os.path.join(pdir, f"part-{stem}.parquet")
            import pyarrow.parquet as pq

            pq.write_table(tbl, path)
            return pa.table(
                {"file": pa.array([path], pa.large_string()),
                 "lo": pa.array([lo], pa.large_string()),
                 "hi": pa.array([hi], pa.large_string()),
                 "rows": pa.array([tbl.num_rows], pa.int64())}
            )

        man = (
            graph.sort(list(keys))
            .map_batches(write_block, batch_format="pyarrow", batch_size=None,
                         zero_copy_batch=True)
            .to_pandas()
        )
        man.to_parquet(os.path.join(pdir, _MANIFEST), index=False)
        summary[name] = int(man["rows"].sum())
    return summary


def lookup(
    index_dir: str,
    perm: str,
    lo: str,
    hi: str | None = None,
) -> Dataset:
    """Range lookup on a permutation's leading key: ``lo <= key <= hi``
    (``hi=None`` → exact match).  File-level pruning via the manifest;
    only intersecting sorted files are read, then the exact predicate is
    applied with Arrow kernels."""
    if perm not in PERMUTATIONS:
        raise KeyError(f"unknown permutation {perm!r}; have {sorted(PERMUTATIONS)}")
    hi = lo if hi is None else hi
    pdir = os.path.join(index_dir, perm)
    man = pd.read_parquet(os.path.join(pdir, _MANIFEST))
    live = man[(man["lo"] <= hi) & (man["hi"] >= lo)]
    lead = PERMUTATIONS[perm][0]
    if live.empty:
        from ..stages.expand import TRIPLE_SCHEMA

        return rd.from_arrow(TRIPLE_SCHEMA.empty_table())
    ds = rd.read_parquet(sorted(live["file"]))

    def exact(t: pa.Table) -> pa.Table:
        col = t[lead]
        mask = pc.and_(pc.greater_equal(col, lo), pc.less_equal(col, hi))
        return t.filter(mask)

    return ds.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True)


def pruned_file_count(index_dir: str, perm: str, lo: str, hi: str | None = None) -> tuple[int, int]:
    """(files read, files total) for a probe — the pruning receipt."""
    hi = lo if hi is None else hi
    man = pd.read_parquet(os.path.join(index_dir, perm, _MANIFEST))
    live = man[(man["lo"] <= hi) & (man["hi"] >= lo)]
    return len(live), len(man)
