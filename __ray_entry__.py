"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in scheduler_ray) calls ray.init()/ray.shutdown().

The KG-family queries run over a synthetic Common-Crawl-style page table
derived *deterministically* from ``{sf_dir}/documents.parquet`` (see
scheduler_ray/corpus.py), so the DuckDB oracles can reconstruct extraction
bytes and golden triples with plain SQL over the ``documents`` view.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pandas as pd
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count

from scheduler_ray import oracles
from scheduler_ray.corpus import ensure_pages_fixture
from scheduler_ray.pipelines import flagship
from scheduler_ray.stages.extract import extract_stage
from scheduler_ray.stages.link import LINEAR_ELEMENT


def _fixture(sf_dir: str) -> str:
    return ensure_pages_fixture(sf_dir)


def entry() -> Any:
    """Flagship KG pipeline on sf0.001: pages → canonical triples."""
    fx = _fixture("/root/testdata/sf0.001")
    return flagship.run_flagship(fx)


# ---------------------------------------------------------------- queries


def _q_kg_extract(sf_dir: str):
    fx = _fixture(sf_dir)
    pages = flagship.read_pages(fx)
    ex = extract_stage(pages)
    return ex.select_columns(["url", "source", "extracted"])


def _q_kg_sources(sf_dir: str):
    fx = _fixture(sf_dir)
    pages = flagship.read_pages(fx)
    ex = extract_stage(pages)
    out = ex.groupby("source").aggregate(Count(alias_name="n_pages"))
    return out.map_batches(
        lambda df: df.rename(columns={"source": "source"}), batch_format="pandas"
    )


def _q_kg_triples_raw(sf_dir: str):
    fx = _fixture(sf_dir)
    registry, sources = flagship.load_side_tables(fx)
    pages = flagship.read_pages(fx)
    return flagship.raw_triples(pages, registry, sources)


def _q_kg_canonical(sf_dir: str):
    fx = _fixture(sf_dir)
    return flagship.run_flagship(fx)


def _q_kg_pred_counts(sf_dir: str):
    ds = _q_kg_canonical(sf_dir)
    return ds.groupby("pred").aggregate(Count(alias_name="n"))


def _q_kg_cleanup(sf_dir: str):
    fx = _fixture(sf_dir)
    pages = flagship.read_pages(fx)
    ex = extract_stage(pages)
    gone = ex.map_batches(
        lambda t: t.filter(pc.is_null(t["extracted"])).select(["url"]),
        batch_format="pyarrow",
    )
    return gone


def _q_kg_merge_dedup(sf_dir: str):
    ds = _q_kg_canonical(sf_dir)
    merged = ds.union(_q_kg_canonical(sf_dir))
    distinct = merged.groupby(["subj", "pred", "obj"]).aggregate(Count(alias_name="c"))
    return pd.DataFrame({"n_triples": [distinct.count()]})


def _q_kg_entity_link(sf_dir: str):
    ds = _q_kg_canonical(sf_dir)
    links = ds.map_batches(
        lambda t: t.filter(pc.equal(t["pred"], LINEAR_ELEMENT)).select(["subj", "obj"]),
        batch_format="pyarrow",
    )
    return links.map_batches(
        lambda df: df.rename(columns={"obj": "mainstem_uri"}), batch_format="pandas"
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_extract": _q_kg_extract,
        "kg_sources": _q_kg_sources,
        "kg_triples_raw": _q_kg_triples_raw,
        "kg_canonical_triples": _q_kg_canonical,
        "kg_pred_counts": _q_kg_pred_counts,
        "kg_cleanup_antijoin": _q_kg_cleanup,
        "kg_merge_dedup": _q_kg_merge_dedup,
        "kg_entity_link": _q_kg_entity_link,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_extract": oracles.EXTRACT_SQL,
        "kg_sources": oracles.SOURCES_SQL,
        "kg_triples_raw": oracles.RAW_TRIPLES_SQL,
        "kg_canonical_triples": oracles.CANONICAL_TRIPLES_SQL,
        "kg_pred_counts": oracles.PRED_COUNTS_SQL,
        "kg_cleanup_antijoin": oracles.CLEANUP_SQL,
        "kg_merge_dedup": oracles.MERGE_DEDUP_SQL,
        "kg_entity_link": oracles.ENTITY_LINK_SQL,
    }
