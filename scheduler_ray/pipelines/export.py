"""Export projections: the GeoParquet-shaped feature table (SURVEY.md S8).

The reference converts the merged graph to a feature table with columns
``id, geoconnex_sitemap, feature_name, feature_description, bbox,
geometry`` plus a Hilbert spatial sort and bounded row groups (reference
userCode/assetGroups/export.py:111-186; columns asserted at
export_test.py:77-86).  Ray-Data-first equivalent:

* triples → one row per subject via per-batch partial pivot + a
  ``groupby(subj)`` merge of the (already single-valued) fields — the
  wide triple stream shuffles only one pivoted row per subject per batch;
* WKB point geometry encoded from the document's lat/lon (F11 bbox
  computation);
* Hilbert-curve sort key (O2) for locality-preserving output; written
  with bounded row groups.
"""

from __future__ import annotations

import struct

import pandas as pd

from ray.data import Dataset
from ray.data.aggregate import Max

from ..stages.spatial import hilbert_index

#: both predicate spellings (prefixed / @context-expanded IRI)
_FIELD_PREDS = {
    "schema:name": "feature_name",
    "https://schema.org/name": "feature_name",
    "schema:description": "feature_description",
    "https://schema.org/description": "feature_description",
    "schema:latitude": "lat_milli",
    "https://schema.org/latitude": "lat_milli",
    "schema:longitude": "lon_milli",
    "https://schema.org/longitude": "lon_milli",
}
_GEO_PREDS = {"schema:geo", "https://schema.org/geo"}


def _pivot_partial(b: pd.DataFrame) -> pd.DataFrame:
    """Partial per-batch pivot.

    lat/lon live on the geo BLANK node (``expand.py`` emits
    ``(feature, schema:geo, _:…#b0)`` + the coordinates at the label);
    the blank→feature edge is resolved batch-locally.  Partitioning
    assumption: a document's rows are contiguous within one batch —
    true for the expansion/canonicalization stream this pivot consumes
    (do NOT run it over pred-partitioned files).
    """
    b = b[b["pred"].isin(_FIELD_PREDS) | b["pred"].isin(_GEO_PREDS)]
    blank_parent: dict = {}
    for subj, pred, obj in zip(b["subj"], b["pred"], b["obj"]):
        if pred in _GEO_PREDS:
            blank_parent[obj] = subj
    rows: dict[tuple, dict] = {}
    for subj, pred, obj, graph in zip(b["subj"], b["pred"], b["obj"], b["graph"]):
        if pred in _GEO_PREDS:
            rows.setdefault(subj, {"id": subj, "geoconnex_sitemap": graph})
            continue
        if subj.startswith("_:"):
            # coordinate row on a blank node → credit the parent feature
            parent = blank_parent.get(subj)
            if parent is None:
                continue  # orphan blank (parent in another batch) — skip
            r = rows.setdefault(parent, {"id": parent, "geoconnex_sitemap": graph})
        else:
            r = rows.setdefault(subj, {"id": subj, "geoconnex_sitemap": graph})
        if pred in _FIELD_PREDS:
            r[_FIELD_PREDS[pred]] = obj
    out = pd.DataFrame(list(rows.values()))
    for col in ("id", "geoconnex_sitemap", "feature_name", "feature_description",
                "lat_milli", "lon_milli"):
        if col not in out:
            out[col] = pd.Series([], dtype=object) if out.empty else None
    return out[
        ["id", "geoconnex_sitemap", "feature_name", "feature_description", "lat_milli", "lon_milli"]
    ]


def wkb_point(x: float, y: float) -> bytes:
    """Little-endian WKB Point (the geometry column's encoding)."""
    return b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", x, y)


def feature_table(canon: Dataset) -> Dataset:
    """Canonical triples → one feature row per subject.

    Partial pivot per batch, then ``groupby(subj)`` merging with Max —
    every field is single-valued per subject, so Max acts as coalesce
    (non-null wins over null) while staying a combiner-friendly aggregate.
    """
    partial = canon.map_batches(_pivot_partial, batch_format="pandas")
    merged = partial.groupby("id").aggregate(
        Max("geoconnex_sitemap", alias_name="geoconnex_sitemap"),
        Max("feature_name", alias_name="feature_name"),
        Max("feature_description", alias_name="feature_description"),
        Max("lat_milli", alias_name="lat_milli"),
        Max("lon_milli", alias_name="lon_milli"),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        lat = b["lat_milli"].astype("float64") / 1000.0
        lon = b["lon_milli"].astype("float64") / 1000.0
        b = b.drop(columns=["lat_milli", "lon_milli"])
        b["bbox_xmin"] = lon
        b["bbox_ymin"] = lat
        b["bbox_xmax"] = lon
        b["bbox_ymax"] = lat
        b["geometry"] = [wkb_point(x, y) for x, y in zip(lon, lat)]
        b["hilbert"] = hilbert_index(lon.to_numpy(), lat.to_numpy())
        return b

    return merged.map_batches(finish, batch_format="pandas")


def write_geoparquet(features: Dataset, path: str, *, rows_per_group: int = 50_000) -> None:
    """Hilbert-sorted, bounded-row-group parquet (S8/O2 semantics)."""
    features.sort("hilbert").write_parquet(path, row_group_size=rows_per_group)
