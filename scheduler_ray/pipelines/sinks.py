"""Relational sink: GeoParquet → SQL database (SURVEY.md S9).

The reference loads the feature GeoParquet into PostGIS in 100k-row
chunks, forces EPSG:4326, creates an id index and a geometry index, and
audits the row count after the load (reference
userCode/assetGroups/export.py:345-394).  No PostGIS exists in this
sandbox; the same load contract is implemented against DuckDB (the
in-container relational engine): chunked inserts bounded by
``chunk_rows`` (the reference's OOM guard), id + sitemap indexes, and a
``SELECT count(*)`` audit that must match the source row count.  The
function is engine-parametric in spirit — swapping the connection for a
PostGIS `to_postgis` writer reuses the same chunk loop.
"""

from __future__ import annotations

import pyarrow.dataset as pads

GEO_COLUMNS = [
    "id",
    "geoconnex_sitemap",
    "feature_name",
    "feature_description",
    "bbox_xmin",
    "bbox_ymin",
    "bbox_xmax",
    "bbox_ymax",
    "geometry",
]


def load_geoparquet_to_sql(
    geo_dir: str,
    db_path: str,
    table: str = "features",
    *,
    chunk_rows: int = 100_000,
) -> dict:
    """Chunked load of a GeoParquet directory into a SQL table.

    Returns an audit summary ``{rows_loaded, rows_in_db, chunks}``;
    raises ``ValueError`` if the post-load count audit fails (the
    reference logs the count after load — here a mismatch is fatal).
    """
    import duckdb

    ds = pads.dataset(geo_dir)
    con = duckdb.connect(db_path)
    try:
        con.execute(f"DROP TABLE IF EXISTS {table}")
        con.execute(
            f"""CREATE TABLE {table} (
                id VARCHAR, geoconnex_sitemap VARCHAR, feature_name VARCHAR,
                feature_description VARCHAR, bbox_xmin DOUBLE, bbox_ymin DOUBLE,
                bbox_xmax DOUBLE, bbox_ymax DOUBLE, geometry BLOB)"""
        )
        rows_loaded = 0
        chunks = 0
        # bounded-memory chunked load (the reference's 100k-row guard)
        for batch in ds.to_batches(columns=GEO_COLUMNS, batch_size=chunk_rows):
            if batch.num_rows == 0:
                continue
            import pyarrow as pa

            chunk_tbl = pa.Table.from_batches([batch])  # noqa: F841 — registered below
            con.register("chunk_tbl_view", chunk_tbl)
            con.execute(
                f"INSERT INTO {table} SELECT * FROM chunk_tbl_view"
            )
            con.unregister("chunk_tbl_view")
            rows_loaded += batch.num_rows
            chunks += 1
        # id + sitemap indexes (reference creates id + GiST geometry
        # indexes; DuckDB has no spatial index — sitemap stands in)
        con.execute(f"CREATE INDEX IF NOT EXISTS {table}_id_idx ON {table} (id)")
        con.execute(
            f"CREATE INDEX IF NOT EXISTS {table}_sitemap_idx ON {table} (geoconnex_sitemap)"
        )
        rows_in_db = con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]
        if rows_in_db != rows_loaded:
            raise ValueError(
                f"row-count audit failed: loaded {rows_loaded}, table has {rows_in_db}"
            )
        return {"rows_loaded": rows_loaded, "rows_in_db": rows_in_db, "chunks": chunks}
    finally:
        con.close()
