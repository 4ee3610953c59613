"""Checkpoint/resume + n-quads sink tests (mirrors the reference's
bytesum-idempotency e2e assertions, userCode/defs_test.py:86-98)."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from scheduler_ray.pipelines import checkpoint as cp
from scheduler_ray.sources import nq
from scheduler_ray.state import manifest as mf


def test_input_summary_deterministic(fixture_sf0001):
    a = cp.input_summary(fixture_sf0001).sort_values("source").reset_index(drop=True)
    b = cp.input_summary(fixture_sf0001).sort_values("source").reset_index(drop=True)
    assert a.equals(b)
    assert a["n_pages"].sum() == 500


def test_run_resume_skips_completed(fixture_sf0001, tmp_out):
    out = os.path.join(tmp_out, "kg")
    r1 = cp.run_checkpointed(fixture_sf0001, out)
    assert len(r1["completed"]) == 20 and not r1["skipped"]
    total1 = cp.read_output(out).count()
    assert total1 == 2824
    # manifests carry lineage metrics
    m = mf.load_manifest(out, r1["completed"][0])
    assert m["rows_in"] > 0 and "content_hash" in m and "input_hash" in m
    mtimes1 = {
        f: os.path.getmtime(os.path.join(out, "manifests", f))
        for f in os.listdir(os.path.join(out, "manifests"))
    }

    # rerun: everything skipped, nothing rewritten (bytesum semantics)
    r2 = cp.run_checkpointed(fixture_sf0001, out)
    assert not r2["completed"] and len(r2["skipped"]) == 20
    mtimes2 = {
        f: os.path.getmtime(os.path.join(out, "manifests", f))
        for f in os.listdir(os.path.join(out, "manifests"))
    }
    assert mtimes1 == mtimes2
    assert cp.read_output(out).count() == total1

    # delete one manifest → only that partition recomputes, same content
    victim = r1["completed"][3]
    os.remove(mf.manifest_path(out, victim))
    m_before = m
    r3 = cp.run_checkpointed(fixture_sf0001, out)
    assert r3["completed"] == [victim] and len(r3["skipped"]) == 19
    assert cp.read_output(out).count() == total1
    m_after = mf.load_manifest(out, r1["completed"][0])
    assert m_after["content_hash"] == m_before["content_hash"]


def test_partition_barrier(tmp_out):
    mf.write_manifest(tmp_out, "a", {"input_hash": "1"})
    assert not mf.all_partitions_complete(tmp_out, {"a", "b"})
    mf.write_manifest(tmp_out, "b", {"input_hash": "2"})
    assert mf.all_partitions_complete(tmp_out, {"a", "b"})


def test_nq_writer_deterministic(fixture_sf0001, tmp_out):
    from scheduler_ray.pipelines import flagship

    canon = flagship.run_flagship(fixture_sf0001).materialize()
    s1 = nq.write_release_graphs(canon, os.path.join(tmp_out, "r1"))
    s2 = nq.write_release_graphs(canon, os.path.join(tmp_out, "r2"))
    assert s1["n_quads"].sum() == 2824
    assert list(s1["source"]) == list(s2["source"])
    # byte-identical gzip across runs (mtime pinned) — bytesum analogue
    p1, p2 = s1["path"].iloc[0], s2["path"].iloc[0]
    assert open(p1, "rb").read() == open(p2, "rb").read()
    # content round-trips and contains a golden quad
    text = gzip.decompress(open(p1, "rb").read()).decode()
    assert "<https://www.opengis.net/def/schema/hy_features/hyf/linearElement>" in text
    assert text.endswith(".\n")


def test_expand_curie():
    assert nq.expand_curie("rdf:type") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert nq.expand_curie("https://x/y") == "https://x/y"


def test_nq_writer_salted_equivalent(fixture_sf0001, tmp_out):
    """Salted (gzip-member) output decompresses to the same quad multiset
    as the unsalted file for the hot sources."""
    import gzip as _gz
    import os as _os

    from scheduler_ray.pipelines import flagship

    canon = flagship.run_flagship(fixture_sf0001).materialize()
    s_plain = nq.write_release_graphs(canon, _os.path.join(tmp_out, "plain"))
    s_salted = nq.write_release_graphs(
        canon, _os.path.join(tmp_out, "salted"), salt_factor=4, hot_fraction=0.02
    )
    assert list(s_plain["n_quads"]) == list(s_salted["n_quads"])
    for p_plain, p_salt in zip(s_plain["path"], s_salted["path"]):
        a = sorted(_gz.decompress(open(p_plain, "rb").read()).decode().splitlines())
        b = sorted(_gz.decompress(open(p_salt, "rb").read()).decode().splitlines())
        assert a == b


def test_lsh_params():
    from scheduler_ray.stages.dedup import lsh_params

    assert lsh_params(0.8, 64) == (32, 2)
    assert lsh_params(0.6, 64) == (32, 2)
    b, r = lsh_params(0.95, 64)
    assert b * r == 64 and (1 - 0.95**r) ** b <= 1e-6 and r >= 4


def test_manifest_gc_oldest_first_bounded(tmp_out):
    """A4 retention GC: oldest-first order, bounded batch, data dir goes
    with the manifest (reference instance.py:26-51 semantics)."""
    import json as _json
    import os as _os

    from scheduler_ray.state import manifest as mf

    now = 1_000_000.0
    for i, age in enumerate([500, 100, 300, 10]):  # src0 oldest→src3 newest
        p = mf.write_manifest(tmp_out, f"src{i}", {"input_hash": "h"})
        with open(p) as f:
            m = _json.load(f)
        m["written_at"] = now - age
        with open(p, "w") as f:
            _json.dump(m, f)
        _os.makedirs(_os.path.join(tmp_out, "data", f"graph=src{i}"), exist_ok=True)

    # bounded batch of 2, retention 50s → the two oldest (src0, src2) go
    deleted = mf.gc_manifests(tmp_out, max_age_s=50, max_delete=2, now=now)
    assert deleted == ["src0", "src2"]
    assert not _os.path.exists(_os.path.join(tmp_out, "data", "graph=src0"))
    assert _os.path.exists(_os.path.join(tmp_out, "data", "graph=src1"))
    # second sweep picks up the remaining expired one; src3 is retained
    assert mf.gc_manifests(tmp_out, max_age_s=50, now=now) == ["src1"]
    assert mf.load_manifest(tmp_out, "src3") is not None


def test_read_output_ignores_uncommitted_partition(fixture_sf0001, tmp_out):
    """Round-3 advice: a partition dir written but never manifest-committed
    (crash between write_parquet and write_manifest) is invisible to
    read_output, and the graph hive column survives the gated read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(tmp_out, "kg")
    cp.run_checkpointed(fixture_sf0001, out)
    total = cp.read_output(out).count()
    # plant an uncommitted partition with plausible triples
    bogus = os.path.join(out, "data", "graph=bogus")
    os.makedirs(bogus, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "subj": pa.array(["s"], pa.large_string()),
                "pred": pa.array(["p"], pa.large_string()),
                "obj": pa.array(["o"], pa.large_string()),
                "obj_is_literal": pa.array([False]),
            }
        ),
        os.path.join(bogus, "part-0.parquet"),
    )
    ds = cp.read_output(out)
    assert ds.count() == total
    gvals = set(ds.unique("graph"))
    assert "bogus" not in gvals and len(gvals) == 20


# ----------------------------------------------------- publishing dry runs
def _release_dir(tmp_path):
    d = tmp_path / "graphs"
    d.mkdir()
    (d / "src1_release.nq").write_text("<s> <p> <o> <g> .\n")
    (d / "src2_release.nq.gz").write_bytes(b"\x1f\x8b fake")
    (d / "src1_release.nq.bytesum").write_text("123")
    (d / "notes.txt").write_text("not a graph")
    return str(d)


def test_oci_push_manifest_golden(tmp_path):
    """S11 dry run matches the reference's oras push contract
    (export.py:249-262): nq/nq.gz layers only, date+latest tags, the two
    image annotations."""
    from scheduler_ray.pipelines.publish import oci_push_manifest

    m = oci_push_manifest(_release_dir(tmp_path), date_str="2026_08_18")
    assert m.target == "ghcr.io/internetofwater/geoconnex-graph:2026_08_18,latest"
    assert [f["file"] for f in m.files] == ["src1_release.nq", "src2_release.nq.gz"]
    assert all(f["media_type"] == "application/n-quads" for f in m.files)
    assert sorted(s["file"] for s in m.skipped) == [
        "notes.txt",
        "src1_release.nq.bytesum",
    ]
    assert "org.opencontainers.image.source" in m.metadata["annotations"]
    assert m.command.startswith("oras push ghcr.io/")
    # test mode routes to the local registry, like RUNNING_AS_TEST_OR_DEV
    m2 = oci_push_manifest(str(tmp_path / "graphs"), date_str="2026_08_18", test_mode=True)
    assert m2.target.startswith("localhost:5000/")


def test_lakefs_copy_manifest_golden(tmp_path):
    """S12 dry run matches classes.py:297-330: include *.nq/*.nq.gz,
    exclude *.bytesum, branch pre-clear + commit message with the source
    prefix."""
    from scheduler_ray.pipelines.publish import lakefs_copy_manifest

    m = lakefs_copy_manifest(
        _release_dir(tmp_path),
        source_prefix="graphs/latest",
        destination_branch="release_2026_08",
        destination_prefix="geoconnex/release_graphs",
    )
    assert m.target == "lakefs:geoconnex/release_2026_08/geoconnex/release_graphs"
    assert [f["file"] for f in m.files] == ["src1_release.nq", "src2_release.nq.gz"]
    reasons = {s["file"]: s["reason"] for s in m.skipped}
    assert reasons["src1_release.nq.bytesum"] == "--exclude *.bytesum"
    assert "graphs/latest" in m.metadata["commit_message"]
    assert "--include *.nq" in m.command and "--exclude *.bytesum" in m.command
    assert m.command.startswith("rclone copy gs:iow/graphs/latest ")


def test_zenodo_deposit_manifest_golden(tmp_path):
    """S13 dry run matches export.py:465-522: bytesum silently skipped,
    other non-nq files warn-skipped, per-file sizes recorded, fixed deposit
    metadata."""
    from scheduler_ray.pipelines.publish import zenodo_deposit_manifest

    m = zenodo_deposit_manifest(_release_dir(tmp_path))
    assert [f["file"] for f in m.files] == ["src1_release.nq", "src2_release.nq.gz"]
    assert all(f["size_bytes"] > 0 for f in m.files)
    assert [s["file"] for s in m.skipped] == ["notes.txt"]  # bytesum is silent
    md = m.metadata["metadata"]
    assert md["title"] == "Geoconnex Graph" and md["upload_type"] == "dataset"
    assert md["creators"][0]["name"] == "Internet of Water Coalition"
