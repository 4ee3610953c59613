"""The flagship KG-construction pipeline (SURVEY.md §3.4).

One Ray Data program replacing the reference's three Dagster jobs
(setup_config → harvest → release → export, reference userCode/defs.py):

    read_parquet(pages)
      → extract_stage          (M1/M4: byte-identical JSON-LD per url)
      → expand_stage           (M3: JSON-LD → (subj,pred,obj,lit,graph))
      → link_stage             (J1/J2: actor pool, broadcast PID registry)
      → [materialize or parquet-stage checkpoint]
      → collect_sameas_mapping (D4: per-batch union-find combiner)
      → canonicalize_stage     (A1: broadcast vectorized rewrite)
      → local pre-dedup        (D5)
      → sort(pred, subj)       (O4) → write_parquet(partition_cols=[pred])

The triple stream is consumed twice (once to collect the sameAs edge
summary, once to rewrite), so it is checkpointed between expansion and
rewrite: in-object-store ``materialize()`` by default, or a parquet
staging dir (``cfg.staging_dir``) which doubles as the resumable
checkpoint at 100-TB scale.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data import Dataset

from ..config import PipelineConfig
from ..stages.canonicalize import (
    canonicalize_stage,
    collect_sameas_arrays,  # noqa: F401 — re-exported for callers/tests
    collect_sameas_lut_ref,
    collect_sameas_mapping,  # noqa: F401 — re-exported for callers/tests
)
from ..stages.expand import expand_stage
from ..stages.extract import extract_stage
from ..stages.link import INDEX_CACHE_NAME, link_stage

PAGE_COLUMNS = ["url", "html"]  # prune at the read: warc_ts/text/lang unused here


def raw_triples(
    pages: Dataset,
    registry: pd.DataFrame,
    sources: pd.DataFrame,
    cfg: PipelineConfig | None = None,
    index_cache_path: str | None = None,
) -> Dataset:
    """pages → linked (pre-canonicalization) triples."""
    cfg = (cfg or PipelineConfig()).validate()
    ex = extract_stage(pages, batch_size=cfg.extract_batch_size)
    tri = expand_stage(ex, batch_size=cfg.expand_batch_size, validate=cfg.validate_docs)
    return link_stage(
        tri,
        registry,
        sources,
        concurrency=cfg.link_concurrency,
        batch_size=cfg.link_batch_size,
        use_actors=cfg.link_use_actors,
        index_cache_path=index_cache_path,
    )


import os as _os
import time as _time


def _phase_log(label: str, t0: float) -> float:
    """Phase timings to stderr when SCHEDULER_RAY_TIMINGS is set."""
    if _os.environ.get("SCHEDULER_RAY_TIMINGS"):
        import sys

        print(f"PHASE {label}: {_time.time() - t0:.2f}s", file=sys.stderr, flush=True)
    return _time.time()


def canonical_triples(
    pages: Dataset,
    registry: pd.DataFrame,
    sources: pd.DataFrame,
    cfg: PipelineConfig | None = None,
    index_cache_path: str | None = None,
) -> Dataset:
    """pages → canonical deduped triples (unsorted; sort happens at write)."""
    cfg = (cfg or PipelineConfig()).validate()
    t0 = _time.time()
    tri = raw_triples(pages, registry, sources, cfg, index_cache_path)
    t0 = _phase_log("build_raw_plan", t0)
    if cfg.staging_dir:
        tri.write_parquet(cfg.staging_dir)
        tri = rd.read_parquet(cfg.staging_dir)
    else:
        tri = tri.materialize()
    t0 = _phase_log("materialize_raw", t0)
    # one combiner pass compresses the alias pairs to a (tiny,
    # materialized) edge Dataset; its row count — free metadata — drives
    # the broadcast-vs-joined switch (ROADMAP §2): above
    # cfg.canon_broadcast_max_pairs no single plasma object could hold the
    # LUT, so the rewrite runs as distributed CC + two partitioned joins.
    from ..stages.canonicalize import canonicalize_stage_joined, collect_sameas_edges, lut_ref_from_edges

    edges = collect_sameas_edges(tri)
    n_pairs = edges.count()
    if cfg.canon_broadcast_max_pairs and n_pairs > cfg.canon_broadcast_max_pairs:
        t0 = _phase_log("collect_edges", t0)
        if cfg.canonical_blocks:
            tri = tri.repartition(cfg.canonical_blocks)
        return canonicalize_stage_joined(
            tri,
            edges,
            drop_sameas=cfg.drop_sameas,
            local_dedup=True,
        )
    # tree-reduced merge → remote LUT build; only the ObjectRef comes
    # back (the driver never holds the mapping bytes).  The rewrite tasks
    # block on the ref themselves, overlapping the merge tail with the
    # next execution's startup — only the timing mode inserts a barrier
    # so the phase is attributable.
    mapping = lut_ref_from_edges(edges)
    if _os.environ.get("SCHEDULER_RAY_TIMINGS"):
        ray.wait([mapping])
    t0 = _phase_log("collect_mapping", t0)
    # optional lazy coalesce for the rewrite/sort/write tail (fuses into
    # that execution — no extra pass); the hash-LUT rewrite has near-zero
    # per-task fixed cost, so the count can scale with CPUs for wave balance
    if cfg.canonical_blocks:
        tri = tri.repartition(cfg.canonical_blocks)
    return canonicalize_stage(
        tri,
        mapping,
        drop_sameas=cfg.drop_sameas,
        batch_size=None,  # whole-block batches
        concurrency=cfg.rewrite_concurrency,
        use_actors=cfg.rewrite_use_actors,
        local_dedup=True,
    )


def read_pages(fixture_dir: str, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(f"{fixture_dir}/pages", columns=columns or PAGE_COLUMNS)


def load_side_tables(fixture_dir: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    registry = pq.read_table(f"{fixture_dir}/registry.parquet").to_pandas()
    sources = pq.read_table(f"{fixture_dir}/sources.parquet").to_pandas()
    return registry, sources


def load_sources_only(fixture_dir: str) -> pd.DataFrame:
    return pq.read_table(f"{fixture_dir}/sources.parquet").to_pandas()


def read_graph(out_dir: str, fs=None) -> Dataset:
    """Read a written graph back with the exact TRIPLE_SCHEMA dtypes (hive
    partition columns come back as plain string — recast).

    Manifest-aware (round-3 advice): when a commit manifest exists, ONLY
    the files it names are read — uncommitted garbage from a crashed
    fixup/compaction window (old + new file both on disk) is invisible,
    matching the writer's commit protocol.  The ``pred`` hive value is
    reconstructed from each file's path (explicit file lists bypass
    pyarrow's hive inference).

    ``fs`` selects the filesystem seam the graph was written through
    (default LocalFS): the commit manifest is read via the seam, and an
    ``FsspecFS`` routes the parquet reads through the corresponding
    pyarrow filesystem — the full write→commit→read round trip runs on
    a pure object store with no local-path assumption."""
    import os

    from ..stages.expand import TRIPLE_SCHEMA
    from ..state.fs import FsspecFS, LocalFS, read_commit_manifest

    fs = fs or LocalFS()
    pa_fs = None
    if isinstance(fs, FsspecFS):
        from pyarrow.fs import FSSpecHandler, PyFileSystem

        pa_fs = PyFileSystem(FSSpecHandler(fs.fs))
    man = read_commit_manifest(fs, out_dir)
    if man is not None:
        # two blocks with identical content share a stem → the manifest
        # can name one physical file twice; read each file once
        paths = list(dict.fromkeys(os.path.join(out_dir, f) for f in man["files"]))
        if not paths:
            return rd.from_arrow(TRIPLE_SCHEMA.empty_table())
        # Manifest-driven DIRECT read: the commit manifest already names
        # every live file, so there is nothing for Ray's parquet
        # datasource to discover — its per-fragment stat + footer
        # prefetch + sampling costs ~0.5 ms/file ON THE DRIVER (seconds
        # at thousands of files; at 100-TB output scale, millions of
        # files, it would be the bottleneck of every downstream read).
        # Instead the file list is sharded into groups and each read
        # task opens its own files with pyarrow directly; the hive pred
        # value is reconstructed from each file's directory name.
        group = 32
        shards = [paths[i : i + group] for i in range(0, len(paths), group)]
        seam = fs

        def read_shard(b: pa.Table):
            from urllib.parse import unquote

            import os as _os

            import pyarrow.parquet as pq

            from ..state.fs import FsspecFS as _F

            shard_fs = None
            if isinstance(seam, _F):
                from pyarrow.fs import FSSpecHandler, PyFileSystem

                shard_fs = PyFileSystem(FSSpecHandler(seam.fs))
            for group_paths in b["paths"].to_pylist():
                parts = []
                for p in group_paths:
                    t = pq.read_table(p, filesystem=shard_fs)
                    hive = _os.path.basename(_os.path.dirname(p))
                    if "pred" not in t.column_names and hive.startswith("pred="):
                        pred = pa.array(
                            [unquote(hive[len("pred="):])] * t.num_rows,
                            pa.large_string(),
                        )
                        t = t.append_column("pred", pred)
                    parts.append(t.select(list(TRIPLE_SCHEMA.names)).cast(TRIPLE_SCHEMA))
                if parts:
                    yield pa.concat_tables(parts)

        return rd.from_items(
            [{"paths": s} for s in shards], override_num_blocks=len(shards)
        ).map_batches(
            read_shard, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    else:
        ds = rd.read_parquet(out_dir, filesystem=pa_fs)

    def cast(t: pa.Table) -> pa.Table:
        from urllib.parse import unquote

        import pyarrow.compute as pc

        if "pred" not in t.column_names and "path" in t.column_names:
            # manifest file-list read: derive pred from the hive dir name
            # via the (tiny) unique path set
            upaths = pc.unique(t["path"])
            preds = pa.array(
                [
                    unquote(os.path.basename(os.path.dirname(p))[len("pred="):])
                    for p in upaths.to_pylist()
                ],
                pa.large_string(),
            )
            pred = pc.take(preds, pc.index_in(t["path"], value_set=upaths))
            t = t.drop_columns(["path"]).append_column("pred", pred)
        cols = {f.name: pc.cast(t[f.name], f.type) for f in TRIPLE_SCHEMA}
        # Ray's write_parquet percent-encodes hive partition values
        # (rdf:type → rdf%3Atype) and the reader keeps them encoded —
        # decode via the tiny unique set
        pred = cols["pred"]
        uniq = pc.unique(pred)
        if any("%" in (u or "") for u in uniq.to_pylist()):
            decoded = pa.array([unquote(u) for u in uniq.to_pylist()], pa.large_string())
            pred = pc.take(decoded, pc.index_in(pred, value_set=uniq))
            cols["pred"] = pc.cast(pred, pa.large_string())
        return pa.Table.from_arrays(
            [cols[f.name] for f in TRIPLE_SCHEMA], schema=TRIPLE_SCHEMA
        )

    return ds.map_batches(cast, batch_format="pyarrow", zero_copy_batch=True)


def run_flagship(
    fixture_dir: str,
    out_dir: str | None = None,
    cfg: PipelineConfig | None = None,
    index_ref: "ray.ObjectRef | None" = None,
) -> Dataset:
    """End-to-end: fixture dir → canonical triples (written if out_dir).

    With an ``out_dir`` and ``sort_mode="local"`` (default) the job runs
    the SINGLE-PASS streaming materialize (pipelines/streaming.py): local
    canonicalization fused into the main pass, direct per-block sorted
    hive writes, global merge + fixup only where cross-batch chains land.
    ``sort_mode="global"`` (or no out_dir) uses the two-pass path.

    ``index_ref``: an already-broadcast ``RegistryIndex`` ObjectRef (ST1
    steady state — see link_stage); skips the per-job index load/put.
    """
    import os

    cfg = (cfg or PipelineConfig()).validate()
    cache = f"{fixture_dir}/{INDEX_CACHE_NAME}"
    # with a warm index cache the (possibly huge) registry frame is never
    # loaded — the lazy parquet path goes straight to the cache check
    registry = f"{fixture_dir}/registry.parquet" if os.path.exists(cache) else None
    if registry is None:
        registry, sources = load_side_tables(fixture_dir)
    else:
        sources = load_sources_only(fixture_dir)
    if index_ref is not None:
        registry = index_ref
    pages = read_pages(fixture_dir)

    if out_dir and cfg.single_pass and cfg.sort_mode in ("local", "ranged"):
        from .streaming import write_canonical_single_pass

        t0 = _time.time()
        raw = raw_triples(pages, registry, sources, cfg, cache)
        write_canonical_single_pass(
            raw, out_dir, drop_sameas=cfg.drop_sameas, resume=cfg.file_resume,
            # the same broadcast ceiling the two-pass canonical path uses:
            # past it the writer's fixup runs as a distributed second pass
            # instead of merging one plasma LUT (ROADMAP §2)
            lut_max_pairs=cfg.canon_broadcast_max_pairs or None,
        )
        _phase_log("single_pass_write", t0)
        return read_graph(out_dir)

    canon = canonical_triples(
        pages, registry, sources, cfg,
        index_cache_path=cache,
    )
    if out_dir:
        t0 = _time.time()
        if cfg.sort_mode == "global":
            # Ray's sort range-partitions then sorts — the output files ARE
            # globally ordered by (pred, subj)
            final = canon.sort(["pred", "subj"])
        else:
            # local mode: hive partition dirs by pred + per-FILE (pred,subj)
            # sort; files within a pred dir are not range-partitioned
            def sort_block(t: pa.Table) -> pa.Table:
                return t.sort_by([("pred", "ascending"), ("subj", "ascending")])

            final = canon.map_batches(
                sort_block, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            )
        final.write_parquet(out_dir, partition_cols=[cfg.partition_col])
        _phase_log("sort_write", t0)
        return read_graph(out_dir)
    return canon
