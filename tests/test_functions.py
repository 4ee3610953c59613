from __future__ import annotations

import pyarrow as pa

from scheduler_ray.functions import scalars as fn
from scheduler_ray.sources.sitemap import parse_sitemap_index, reconcile_partitions

XML = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
              xmlns:geoconnex="https://geoconnex.us/sitemap">
  <sitemap>
    <loc>https://example.org/sitemaps/b.xml</loc>
    <geoconnex:sitemap_id> beta:dams </geoconnex:sitemap_id>
    <geoconnex:max_request_concurrency>4</geoconnex:max_request_concurrency>
    <geoconnex:add_associated_mainstems>true</geoconnex:add_associated_mainstems>
  </sitemap>
  <sitemap>
    <loc>https://example.org/sitemaps/a.xml</loc>
    <geoconnex:sitemap_id>alpha:gauges</geoconnex:sitemap_id>
  </sitemap>
  <sitemap>
    <loc>https://example.org/sitemaps/dup.xml</loc>
    <geoconnex:sitemap_id>beta:dams</geoconnex:sitemap_id>
  </sitemap>
  <sitemap>
    <loc>https://example.org/sitemaps/empty.xml</loc>
    <geoconnex:sitemap_id>  </geoconnex:sitemap_id>
  </sitemap>
</sitemapindex>
"""


def test_parse_sitemap_index_dedupe_sort_hints():
    df = parse_sitemap_index(XML)
    assert list(df["source_id"]) == ["alpha:gauges", "beta:dams"]  # sorted, deduped
    beta = df[df["source_id"] == "beta:dams"].iloc[0]
    assert beta["max_request_concurrency"] == 4
    assert bool(beta["add_associated_mainstems"]) is True
    assert beta["loc"].endswith("/b.xml")  # first occurrence won
    alpha = df[df["source_id"] == "alpha:gauges"].iloc[0]
    assert alpha["max_request_concurrency"] == 1
    assert bool(alpha["add_associated_mainstems"]) is False


def test_reconcile_partitions():
    delete, add = reconcile_partitions({"a", "b"}, {"b", "c"})
    assert delete == {"a"} and add == {"c"}


def test_scalar_functions():
    col = pa.array(["ref:dams!", "  x  "])
    assert fn.strip_non_alphanumeric(col).to_pylist() == ["refdams", "x"]
    assert fn.container_safe_name(pa.array(["a:b:c" * 30])).to_pylist()[0] == ("a-b-c" * 30)[:63]
    assert fn.trim_id(col).to_pylist() == ["ref:dams!", "x"]
    ts = fn.parse_lastmod(pa.array(["2026-01-02T03:04:05"]))
    assert fn.date_tag(ts).to_pylist() == ["2026_01_02"]
    assert fn.has_content(pa.array(["x", ""])).to_pylist() == [True, False]
    assert fn.ends_with_any(
        pa.array(["a.nq", "b.nq.gz", "c.bytesum"]), (".nq", ".nq.gz")
    ).to_pylist() == [True, True, False]
    assert fn.format_gb(2_500_000_000) == "2.50 GB"
    assert fn.env_bool("TRUE") and not fn.env_bool(None)
    assert fn.env_int(" 7 ") == 7 and fn.env_int(None, 3) == 3
