"""Tests for the training-data / relational operator families."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from scheduler_ray.stages import dedup as dd
from scheduler_ray.stages import relational as rel
from scheduler_ray.stages import similarity as sim
from scheduler_ray.stages import textops as tx
from scheduler_ray.stages.multimodal import MediaDecoder, media_metadata_batch
from scheduler_ray.stages.validate import validate_doc


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts, "n_chars": [len(t) for t in texts]}))


def test_exact_dedup_docs_first_wins_multiblock():
    """Sort-based full-row first-wins dedup: duplicates scattered across
    many blocks must all collapse to the min-doc_id row, with the full
    row payload intact (exercises the block-boundary fixup)."""
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages import dedup as dd

    rows = []
    for i in range(300):
        text = f"doc text {i % 37}"  # 37 distinct texts, ~8 copies each
        rows.append({"doc_id": i, "text": text, "tag": f"row{i}"})
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=7).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(9)
    got = dd.exact_dedup_docs(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        df.sort_values("doc_id")
        .drop_duplicates("text")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["tag"]) == list(want["tag"])


def test_exact_dedup_keeps_min_id():
    ds = _docs(["aaa", "bbb", "aaa", "ccc", "bbb"], ids=[5, 2, 9, 1, 7])
    out = dd.exact_dedup(ds).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 5]


def test_minhash_finds_near_dup_and_rejects_distinct():
    base = "the quick brown fox jumps over the lazy dog " * 6
    near = base + "extra tail"
    other = "completely different content about rivers and dams " * 6
    ds = _docs([base, near, other])
    pairs = dd.minhash_lsh_pairs(ds, jaccard_threshold=0.8).to_pandas()
    assert set(zip(pairs["doc_a"], pairs["doc_b"])) == {(0, 1)}


def test_ngram_jaccard_pairs():
    base = "alpha beta gamma delta epsilon zeta eta theta " * 5
    ds = _docs([base, base + "iota", "unrelated words entirely distinct tokens here okay"])
    pairs = dd.ngram_jaccard_pairs(ds, n=3, threshold=0.6).to_pandas()
    assert set(zip(pairs["doc_a"], pairs["doc_b"])) == {(0, 1)}


def test_simhash_exact_copy_hamming_zero():
    t = "one two three four five six seven eight nine ten"
    out = dd.simhash_batch(pd.DataFrame({"doc_id": [0, 1], "text": [t, t]}))
    assert out["simhash"][0] == out["simhash"][1]
    pairs = dd.simhash_near_pairs(_docs([t, t, "zzz qqq www eee rrr ttt yyy uuu"])).to_pandas()
    assert (0, 1) in set(zip(pairs["doc_a"], pairs["doc_b"]))


def test_token_and_quality():
    out = tx.token_count_batch(pd.DataFrame({"doc_id": [0], "text": ["ab cd-ef 12"]}))
    assert out["ws_tokens"][0] == 3  # 'ab', 'cd-ef', '12'
    assert out["bpe_tokens"][0] == 5  # ab / cd / - / ef / 12
    q = tx.quality_score_batch(pd.DataFrame({"doc_id": [0], "text": ["ab cd!"]}))
    assert q["n_chars"][0] == 6 and q["n_tokens"][0] == 2
    assert q["punct_ratio"][0] == round(1 / 6, 6)
    assert q["mean_word_len"][0] == round(5 / 2, 6)


def test_langid_stopword_profiles():
    li = tx.LangId()
    out = li(pd.DataFrame({"doc_id": [0, 1], "text": [
        "the cat and the dog sat in the garden of the house",
        "el perro y la casa de la ciudad en un parque",
    ]}))
    assert list(out["lang_pred"]) == ["en", "es"]


def test_langid_byte_kernel_matches_regex_reference():
    """The byte-level LUT/packed-key kernel must agree with the plain
    regex-tokenize + set-membership definition, incl. unicode edges,
    ties (shared es/fr stopwords), and tokens longer than any stopword."""
    import re

    word = re.compile(r"[a-zà-ÿäöüß]+")

    def ref(texts):
        preds = []
        for text in texts:
            toks = word.findall(text.lower())
            best, best_n = "other", 0
            for lang, sw in tx._STOPWORDS.items():
                nhits = sum(1 for t in toks if t in sw)
                if nhits > best_n:
                    best, best_n = lang, nhits
            preds.append(best)
        return preds

    texts = [
        "The the THE", "el la de que y en un una los las", "",
        "ßß und der die das", "naïve café à-côté", "mixed123the456and",
        "Ça va? Où est le chat?", "日本語 the の and", "x" * 300,
        "la LA La lA",  # es/fr tie → first lang (es) wins
        "der die das und ist von mit den nicht ein",
        "superlongtokenthe and der", "a", " ", "the", "de de la un",
    ]
    rng = np.random.RandomState(0)
    vocab = ["the", "la", "de", "und", "xyz", "Ça", "ß", "123", "naïve", "EST", "dans", "q"]
    texts += [" ".join(rng.choice(vocab, rng.randint(0, 30))) for _ in range(500)]
    out = tx.LangId()(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    assert list(out["lang_pred"]) == ref(texts)


def test_brute_force_topk_deterministic():
    rng = np.random.RandomState(0)
    vecs = rng.randn(50, 8).astype(np.float32)
    emb = rd.from_pandas(pd.DataFrame({"vec_id": range(50), "embedding": list(vecs)}))
    out = sim.brute_force_topk(emb, vecs[:2], k=5)
    assert len(out) == 10
    # the query vector itself is rank-1 with score ~1.0
    first = out[out["query_id"] == 0].iloc[0]
    assert first["vec_id"] == 0 and first["score"] > 0.999


def test_bucketed_ann_layout_recall(tmp_out):
    """build_lsh_layout + BucketedAnnIndex: point queries read only the
    probed bucket partitions; recall checked vs brute force."""
    import os

    rng = np.random.RandomState(1)
    vecs = rng.randn(200, 16).astype(np.float32)
    emb = rd.from_pandas(pd.DataFrame({"vec_id": range(200), "embedding": list(vecs)}))
    sim.build_lsh_layout(emb, tmp_out, n_planes=5, seed=7)
    assert any(d.startswith("bucket=") for d in os.listdir(tmp_out))
    idx = sim.BucketedAnnIndex(tmp_out, n_planes=5, seed=7)
    hits = 0
    for qi in range(10):
        approx = set(idx.query(vecs[qi], k=5, multiprobe=1)["vec_id"])
        assert qi in approx  # own bucket always probed → self is rank 1
        exact_sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ (
            vecs[qi] / np.linalg.norm(vecs[qi])
        )
        exact = set(np.argsort(-exact_sims)[:5])
        hits += len(approx & exact)
    assert hits >= 20  # ≥40% recall@5 with 1 table + multiprobe on random data


def test_lsh_ann_topk_streaming_matches_candidates():
    """lsh_ann_topk scores only same-bucket candidates and ranks them
    exactly; the query's own vector is always a candidate (score 1.0)."""
    rng = np.random.RandomState(2)
    vecs = rng.randn(120, 16).astype(np.float32)
    emb = rd.from_pandas(pd.DataFrame({"vec_id": range(120), "embedding": list(vecs)}))
    out = sim.lsh_ann_topk(emb, vecs[:3], np.arange(3), k=5, n_planes=5, n_tables=3, seed=3)
    for qi in range(3):
        sub = out[out["query_id"] == qi]
        assert len(sub) >= 1
        assert sub.iloc[0]["vec_id"] == qi and sub.iloc[0]["score"] > 0.999


def test_broadcast_and_semi_join():
    big = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": "a b c d".split()}))
    small = pd.DataFrame({"k": [2, 4], "name": ["two", "four"]})
    out = rel.broadcast_join(big, small, on="k").to_pandas().sort_values("k")
    assert list(out["name"]) == ["two", "four"]
    anti = rel.semi_join(big, np.array([2, 4]), on="k", anti=True).to_pandas()
    assert sorted(anti["k"]) == [1, 3]


def test_tumbling_and_sessions():
    ts = pd.to_datetime(["2026-01-01 00:10", "2026-01-01 00:50", "2026-01-01 02:00"])
    ev = rd.from_pandas(pd.DataFrame({"user_id": [1, 1, 1], "ts": ts.astype("datetime64[us]"), "value": [1.0, 2.0, 4.0]}))
    w = rel.tumbling_window_agg(ev, window_s=3600).to_pandas().sort_values("window")
    assert list(w["win_sum"]) == [3.0, 4.0]
    s = rel.sessionize(ev, gap_s=3600).to_pandas()  # 40min gap < 1h keeps one session
    assert len(s) == 2 and sorted(s["n_events"]) == [1, 2]


def test_sessionize_multiblock_stitch():
    """Sessions spanning many blocks must stitch into one (and distinct
    sessions must stay split) — exercises the border-chain fixup of the
    sort-based sessionize against a pandas reference."""
    rng = np.random.default_rng(3)
    rows = []
    for u in range(40):
        t0 = 1_700_000_000 + u * 10_000_000
        # one long session (120 events 100s apart), a gap, a short one
        for i in range(120):
            rows.append({"user_id": u, "t": t0 + i * 100})
        for i in range(5):
            rows.append({"user_id": u, "t": t0 + 120 * 100 + 5000 + i * 10})
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=5).reset_index(drop=True)
    df["ts"] = pd.to_datetime(df["t"], unit="s").astype("datetime64[us]")
    ds = rd.from_pandas(df[["user_id", "ts"]]).repartition(16)
    got = (
        rel.sessionize(ds, gap_s=1800)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    # pandas reference
    ref_rows = []
    for u, g in df.sort_values(["user_id", "t"]).groupby("user_id"):
        ep = g["t"].to_numpy()
        brk = np.ones(len(ep), bool)
        brk[1:] = (ep[1:] - ep[:-1]) > 1800
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(ep)) - 1
        for s, e in zip(starts, ends):
            ref_rows.append(
                {"user_id": u, "session_start": ep[s], "session_end": ep[e],
                 "n_events": e - s + 1}
            )
    want = pd.DataFrame(ref_rows).sort_values(["user_id", "session_start"]).reset_index(drop=True)
    got = got.astype({c: "int64" for c in ["session_start", "session_end", "n_events"]})
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want.astype({"user_id": got["user_id"].dtype}))


def test_topk():
    df = pd.DataFrame({"x": np.arange(100), "y": (np.arange(100) * 37) % 100})
    out = rel.top_k(rd.from_pandas(df), "y", 5).to_pandas()
    assert sorted(out["y"], reverse=True) == [99, 98, 97, 96, 95]


def test_validate_doc_shapes():
    good = '{"@id":"https://pids.geoconnex.dev/x/1","@type":"t","schema:name":"Feature 1","schema:geo":{"schema:latitude":5,"schema:longitude":6}}'
    assert validate_doc(good) == []
    assert validate_doc(None) == ["no-document"]
    assert validate_doc("{bad") == ["parse-error"]
    missing = '{"@id":"https://x/1","@type":"t"}'
    assert "missing:schema:name" in validate_doc(missing)
    bad_lat = '{"@id":"https://x/1","@type":"t","schema:name":"Feature 1","schema:geo":{"schema:latitude":99999999,"schema:longitude":0}}'
    assert "max:schema:latitude" in validate_doc(bad_lat)
    # round-4 cardinality / combinator subset on schema:name
    two_names = '{"@id":"https://x/1","@type":"t","schema:name":["Feature 1","Feature 1 (alt)"]}'
    assert validate_doc(two_names) == ["maxcount:schema:name"]
    lower = '{"@id":"https://x/1","@type":"t","schema:name":"feature 1"}'
    assert validate_doc(lower) == ["not:schema:name", "xone:schema:name"]
    fluss = '{"@id":"https://x/1","@type":"t","schema:name":"Fluss 1"}'
    assert validate_doc(fluss) == []


def test_media_metadata_and_decoder():
    batch = pa.table({
        "url": pa.array(["u1", "u2"]),
        "html": pa.array([b"\x00\x01payload", b"other"], pa.binary()),
    })
    meta = media_metadata_batch(batch)
    assert meta["n_bytes"].to_pylist() == [9, 5]
    assert len(meta["sha256"][0].as_py()) == 64
    dec = MediaDecoder(mode="fake")
    out = dec(batch)
    assert out.column_names == ["media_id", "width", "height", "features"]
    assert len(out["features"][0].as_py()) == 16
    with pytest.raises(NotImplementedError):
        MediaDecoder(mode="strict")(batch)


def test_hilbert_index_locality_and_range():
    from scheduler_ray.stages.spatial import hilbert_index

    xs = np.array([-180.0, 0.0, 179.99])
    ys = np.array([-90.0, 0.0, 89.99])
    d = hilbert_index(xs, ys, order=8)
    assert d.min() >= 0 and d.max() < (1 << 16)
    # locality: two nearby points are closer on the curve than two far ones
    near = abs(
        hilbert_index(np.array([10.0]), np.array([10.0]), order=12)[0]
        - hilbert_index(np.array([10.01]), np.array([10.01]), order=12)[0]
    )
    far = abs(
        hilbert_index(np.array([10.0]), np.array([10.0]), order=12)[0]
        - hilbert_index(np.array([-120.0]), np.array([-60.0]), order=12)[0]
    )
    assert near < far


def test_bbox_join_and_wkb():
    import struct

    from scheduler_ray.pipelines.export import wkb_point
    from scheduler_ray.stages.spatial import bbox_contains_join

    boxes = pd.DataFrame(
        {
            "id": ["a", "b"],
            "bbox_xmin": [0.0, 10.0],
            "bbox_ymin": [0.0, 10.0],
            "bbox_xmax": [1.0, 11.0],
            "bbox_ymax": [1.0, 11.0],
        }
    )
    pts = rd.from_pandas(pd.DataFrame({"pid": [1, 2, 3], "x": [0.5, 10.5, 50.0], "y": [0.5, 10.5, 50.0]}))
    out = bbox_contains_join(pts, boxes).to_pandas().sort_values("pid")
    assert list(zip(out["pid"], out["box_id"])) == [(1, "a"), (2, "b")]
    w = wkb_point(1.5, -2.5)
    assert w[0] == 1 and struct.unpack("<I", w[1:5])[0] == 1
    assert struct.unpack("<dd", w[5:]) == (1.5, -2.5)


def test_feature_table_pivot(fixture_sf0001):
    from scheduler_ray.pipelines import export as ex
    from scheduler_ray.pipelines import flagship

    canon = flagship.run_flagship(fixture_sf0001)
    feats = ex.feature_table(canon).to_pandas()
    assert len(feats) == 420  # one row per conforming subject
    row = feats[feats["id"] == "https://pids.geoconnex.dev/src1/1"].iloc[0]
    assert row["feature_name"] == "Feature 1"
    assert row["bbox_ymin"] == ((1 * 37) % 180000 - 90000) / 1000.0
    assert row["geometry"][:1] == b"\x01" and "hilbert" in feats


def test_feature_table_grouped_pivot_contiguity_free(fixture_sf0001):
    """pivot_mode='grouped' must reproduce the contiguous pivot even when
    every document's rows are scattered across batches (the contiguous
    mode's documented assumption, dropped via the join-based blank
    resolution — ROADMAP §4)."""
    import ray.data as rd

    from scheduler_ray.pipelines import export as ex
    from scheduler_ray.pipelines import flagship

    canon = flagship.run_flagship(fixture_sf0001).materialize()
    want = (
        ex.feature_table(canon)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # destroy document locality: global sort by object value splits every
    # doc's rows across range partitions
    scattered = canon.sort("obj").materialize()
    got = (
        ex.feature_table(scattered, pivot_mode="grouped")
        .to_pandas()[want.columns.tolist()]
        .sort_values("id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_validate_stage_strict_raises(fixture_sf0001):
    """--exit-on-shacl-failure semantics: strict mode fails the job on the
    first violating batch (malformed docs exist in the corpus)."""
    import ray
    from scheduler_ray.pipelines import flagship
    from scheduler_ray.stages.extract import extract_stage
    from scheduler_ray.stages.validate import validate_stage

    ex = extract_stage(flagship.read_pages(fixture_sf0001))
    strict = validate_stage(ex, strict=True)
    with pytest.raises(ray.exceptions.RayTaskError):
        strict.count()


def test_validate_stage_actor_mode(fixture_sf0001):
    from scheduler_ray.pipelines import flagship
    from scheduler_ray.stages.extract import extract_stage
    from scheduler_ray.stages.validate import validate_stage

    ex = extract_stage(flagship.read_pages(fixture_sf0001))
    out = validate_stage(ex, concurrency=(1, 2)).to_pandas()
    assert out["valid"].sum() == 420  # = parseable, shape-conforming docs


def test_geoparquet_write_and_check(tmp_out):
    """S8: GeoParquet written with geo metadata + bbox and validated by
    check_geoparquet (the reference's post-write check step)."""
    import pyarrow.parquet as pq
    import json as _json
    import os as _os

    from scheduler_ray.pipelines import export as ex

    feats = pd.DataFrame(
        {
            "id": ["a", "b"],
            "geoconnex_sitemap": ["s", "s"],
            "feature_name": ["A", "B"],
            "feature_description": ["dA", "dB"],
            "bbox_xmin": [1.0, -2.0],
            "bbox_ymin": [2.0, -3.0],
            "bbox_xmax": [1.0, -2.0],
            "bbox_ymax": [2.0, -3.0],
        }
    )
    feats["geometry"] = [ex.wkb_point(x, y) for x, y in zip(feats["bbox_xmin"], feats["bbox_ymin"])]
    from scheduler_ray.stages.spatial import hilbert_index

    feats["hilbert"] = hilbert_index(
        feats["bbox_xmin"].to_numpy(), feats["bbox_ymin"].to_numpy()
    )
    ds = rd.from_pandas(feats)
    ex.write_geoparquet(ds, tmp_out)  # check=True runs the validator
    files = [f for f in _os.listdir(tmp_out) if f.endswith(".parquet")]
    assert files
    meta = pq.read_table(_os.path.join(tmp_out, files[0])).schema.metadata
    geo = _json.loads(meta[b"geo"])
    assert geo["primary_column"] == "geometry"
    assert geo["columns"]["geometry"]["encoding"] == "WKB"
    summary = ex.check_geoparquet(tmp_out)
    assert summary["rows"] == 2

    # a corrupted geometry must be caught
    bad = feats.copy()
    bad.loc[0, "geometry"] = b"\x00" * 21
    bad_dir = tmp_out + "_bad"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ex.write_geoparquet(rd.from_pandas(bad), bad_dir)


def test_shacl_shapes_graph_ingestion():
    """ST3/M2: a SHACL JSON-LD shapes GRAPH ingested from disk validates
    identically to the built-in shape set over representative documents."""
    import os as _os

    from scheduler_ray.stages.validate import (
        GEO_SHAPE,
        HYDRO_LOCATION_SHAPE,
        parse_shacl_shapes,
        validate_doc,
    )

    path = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "scheduler_ray", "shapes", "hydrolocation_shacl.json",
    )
    shapes, geo_shapes = parse_shacl_shapes(path)
    assert {s.path for s in shapes} == {s.path for s in HYDRO_LOCATION_SHAPE}
    assert {s.path for s in geo_shapes} == {s.path for s in GEO_SHAPE}
    docs = [
        '{"@id":"https://pids.geoconnex.dev/x/1","@type":"t","schema:name":"N","schema:geo":{"schema:latitude":5,"schema:longitude":6}}',
        '{"@id":"https://x/1","@type":"t"}',  # missing name
        '{"@id":"https://x/1","@type":"t","schema:name":"N","schema:geo":{"schema:latitude":99999999,"schema:longitude":0}}',
        '{"@id":"notauri","@type":"t","schema:name":"N"}',
        None,
        "{bad",
    ]
    for d in docs:
        assert validate_doc(d, shapes, geo_shapes) == validate_doc(
            d, HYDRO_LOCATION_SHAPE, GEO_SHAPE
        ), d


def test_sniff_media_real_headers():
    """Container-header metadata is parsed for REAL (no codec needed):
    PNG IHDR, GIF screen descriptor, BMP info header, WAV fmt chunk."""
    import struct

    from scheduler_ray.stages.multimodal import MediaDecoder, sniff_media

    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + struct.pack(">II", 640, 480) + b"\x08\x02" + b"\x00" * 40
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 20
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 128, -64) + b"\x00" * 20
    wav = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"fmt " + b"\x10\x00\x00\x00" + struct.pack("<HHI", 1, 2, 44100) + b"\x00" * 20
    assert sniff_media(png) == {"media_type": "image/png", "width": 640, "height": 480, "sample_rate": None, "n_channels": None}
    assert sniff_media(gif)["media_type"] == "image/gif" and sniff_media(gif)["width"] == 320
    assert sniff_media(bmp)["width"] == 128 and sniff_media(bmp)["height"] == 64
    w = sniff_media(wav)
    assert w["media_type"] == "audio/wav" and w["sample_rate"] == 44100 and w["n_channels"] == 2
    assert sniff_media(b"<html>...")["media_type"] == "application/octet-stream"
    # decoder surfaces real header dimensions when present
    batch = pa.table({"url": pa.array(["p"]), "html": pa.array([png], pa.binary())})
    out = MediaDecoder(mode="fake")(batch)
    assert out["width"][0].as_py() == 640 and out["height"][0].as_py() == 480


def test_polygon_store_ray_casting_vs_bbox():
    """Geometry-true containment (round-3): a point inside a ring's BBOX
    but outside the diamond must be rejected — proving the join is
    polygon-driven, not bbox-driven."""
    from scheduler_ray.stages.spatial import PolygonStore, wkb_polygon, wkb_polygons

    # diamond centered (0, 0), rx=2, ry=1
    ring = np.array([[-2.0, 0.0], [0.0, 1.0], [2.0, 0.0], [0.0, -1.0], [-2.0, 0.0]])
    store = PolygonStore([wkb_polygon(ring)])
    xs = np.array([0.0, 1.9, 0.0, 1.5, -1.9, 0.0])
    ys = np.array([0.0, 0.9, 0.99, 0.0, -0.5, -0.99])
    pt = np.arange(6)
    poly = np.zeros(6, np.int64)
    got = store.contains_pairs(xs, ys, pt, poly)
    # (1.9, 0.9) is inside the bbox [-2,2]x[-1,1] but OUTSIDE the diamond
    assert list(got) == [True, False, True, True, False, True]
    # vectorized wkb_polygons encodes the same bytes as wkb_polygon
    vx = np.stack([ring[:, 0], ring[:, 0] + 5.0])
    vy = np.stack([ring[:, 1], ring[:, 1]])
    ws = wkb_polygons(vx, vy)
    assert ws[0] == wkb_polygon(ring)


def test_grid_polygon_index_golden_pairs():
    """Golden containment pairs through the grid+ray-cast path, including
    a bbox-candidate that the exact geometry rejects."""
    from scheduler_ray.stages.spatial import GridPolygonIndex, wkb_polygon

    d1 = np.array([[0.0, 5.0], [5.0, 10.0], [10.0, 5.0], [5.0, 0.0], [0.0, 5.0]])
    d2 = d1 + 100.0
    idx = GridPolygonIndex(np.array(["a", "b"]), [wkb_polygon(d1), wkb_polygon(d2)])
    xs = np.array([5.0, 9.0, 105.0, 50.0])
    ys = np.array([5.0, 9.0, 105.0, 50.0])
    pts, polys = idx.query_pairs(xs, ys)
    pairs = sorted(zip(pts.tolist(), idx.ids[polys].tolist()))
    # (9,9) is in d1's bbox corner but outside the diamond
    assert pairs == [(0, "a"), (2, "b")]


def test_registry_rings_contain_own_feature_point():
    """Every corpus registry ring contains its own feature's geo point
    (the invariant the flagship J1 spatial join relies on)."""
    from scheduler_ray.corpus import registry_from_documents
    from scheduler_ray.stages.spatial import GridPolygonIndex

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40),
            "text": ["t"] * 40,
            "lang": ["en"] * 40,
            "source": ["src0"] * 40,
            "n_chars": [9] * 40,
        }
    )
    reg = registry_from_documents(docs)
    idx = GridPolygonIndex(np.arange(40), reg["ring_wkb"])
    xs = ((docs["doc_id"] * 37) % 180000 - 90000).to_numpy() / 1000.0
    ys = ((docs["doc_id"] * 53) % 360000 - 180000).to_numpy() / 1000.0
    pts, polys = idx.query_pairs(xs, ys)
    own = set(zip(pts.tolist(), polys.tolist()))
    assert all((i, i) in own for i in range(40))


def test_nearest_polyline_golden():
    from scheduler_ray.stages.spatial import nearest_polyline

    lines = [
        np.array([[0.0, 0.0], [10.0, 0.0]]),          # horizontal segment
        np.array([[0.0, 5.0], [5.0, 5.0], [5.0, 10.0]]),  # L-shape
    ]
    xs = np.array([3.0, 6.0, 4.0, 20.0])
    ys = np.array([1.0, 9.0, 4.0, 0.0])
    li, dist = nearest_polyline(xs, ys, lines)
    assert list(li) == [0, 1, 1, 0]
    assert np.allclose(dist, [1.0, 1.0, 1.0, 10.0])


def test_shacl_closed_world_shapes():
    """Round-4 sh:closed / sh:ignoredProperties: a closed node shape
    rejects undeclared properties; ignored properties and @id/@type stay
    allowed; plain (non-closed) shape tuples are unaffected."""
    import json

    from scheduler_ray.stages.validate import parse_shacl_shapes, validate_doc

    shapes_graph = {
        "@graph": [
            {
                "@id": "ex:ClosedFeatureShape",
                "@type": "sh:NodeShape",
                "sh:targetClass": "hyf:HY_HydroLocation",
                "sh:closed": True,
                "sh:ignoredProperties": [{"@id": "schema:geo"}],
                "sh:property": [
                    {"sh:path": "@id", "sh:minCount": 1, "sh:nodeKind": "sh:IRI"},
                    {"sh:path": "schema:name", "sh:minCount": 1,
                     "sh:datatype": "xsd:string"},
                ],
            }
        ]
    }
    shapes, geo = parse_shacl_shapes(shapes_graph)
    assert shapes.closed and "schema:geo" in shapes.ignored
    good = json.dumps({
        "@id": "https://p/1",
        "@type": "hyf:HY_HydroLocation",
        "schema:name": "Gauge",
        "schema:geo": {"schema:latitude": 1, "schema:longitude": 2},
    })
    assert validate_doc(good, shapes, geo) == []
    extra = json.dumps({
        "@id": "https://p/1",
        "schema:name": "Gauge",
        "schema:color": "blue",
    })
    assert validate_doc(extra, shapes, geo) == ["closed:schema:color"]
    # non-closed tuples (the built-in shapes) never run the closed check
    from scheduler_ray.stages.validate import HYDRO_LOCATION_SHAPE

    assert not getattr(HYDRO_LOCATION_SHAPE, "closed", False)
    # ShapeSet survives pickling with its closure metadata (broadcast path)
    import pickle

    s2 = pickle.loads(pickle.dumps(shapes))
    assert s2.closed and "schema:geo" in s2.ignored


def test_shacl_class_or_node_severity():
    """Round-3 SHACL extensions: sh:class, sh:node (nested property
    shapes), sh:or (alternatives), sh:severity (warnings don't gate
    validity) — ingested from a shapes GRAPH, not hard-coded."""
    import json

    from scheduler_ray.stages.validate import parse_shacl_shapes, validate_doc

    shapes_graph = {
        "@graph": [
            {
                "@id": "ex:FeatureShape",
                "@type": "sh:NodeShape",
                "sh:targetClass": "hyf:HY_HydroLocation",
                "sh:property": [
                    {"sh:path": "@id", "sh:minCount": 1, "sh:nodeKind": "sh:IRI"},
                    # sh:class on the nested agency node
                    {"sh:path": "schema:provider", "sh:class": "schema:Organization"},
                    # sh:node — nested property shape on the provider
                    {
                        "sh:path": "schema:provider",
                        "sh:node": {
                            "sh:property": [
                                {"sh:path": "schema:name", "sh:minCount": 1,
                                 "sh:datatype": "xsd:string"}
                            ]
                        },
                    },
                    # sh:or — name either a plain string or an IRI reference
                    {
                        "sh:path": "schema:name",
                        "sh:minCount": 1,
                        "sh:or": {"@list": [
                            {"sh:datatype": "xsd:string"},
                            {"sh:nodeKind": "sh:IRI"},
                        ]},
                    },
                    # Warning severity: reported but NOT blocking
                    {"sh:path": "schema:description", "sh:minCount": 1,
                     "sh:severity": "sh:Warning"},
                ],
            }
        ]
    }
    shapes, geo = parse_shacl_shapes(shapes_graph)
    assert geo == ()

    good = json.dumps({
        "@id": "https://p/1",
        "schema:name": "Gauge",
        "schema:provider": {"@type": "schema:Organization", "schema:name": "USGS"},
    })
    w: list[str] = []
    assert validate_doc(good, shapes, geo, warnings=w) == []
    assert w == ["missing:schema:description"]  # warning reported, not blocking

    bad_class = json.dumps({
        "@id": "https://p/1", "schema:name": "G",
        "schema:provider": {"@type": "schema:Person", "schema:name": "X"},
    })
    out = validate_doc(bad_class, shapes, geo)
    assert "class:schema:provider:schema:Organization" in out

    bad_nested = json.dumps({
        "@id": "https://p/1", "schema:name": "G",
        "schema:provider": {"@type": "schema:Organization"},
    })
    assert "missing:schema:name" in validate_doc(bad_nested, shapes, geo)

    # sh:or: number satisfies neither string nor IRI → or-violation;
    # an IRI string satisfies the second alternative → clean
    bad_or = json.dumps({"@id": "https://p/1", "schema:name": 7})
    assert "or:schema:name" in validate_doc(bad_or, shapes, geo)
    iri_name = json.dumps({"@id": "https://p/1", "schema:name": "https://n/1"})
    assert validate_doc(iri_name, shapes, geo) == []


def test_ivf_ann_assignment_and_recall():
    """IVF: every vector lands in exactly one centroid list; probing all
    centroids reproduces brute force; nprobe<k trades recall for pruning."""
    rng = np.random.RandomState(5)
    vecs = rng.randn(200, 16).astype(np.float32)
    emb = rd.from_pandas(pd.DataFrame({"vec_id": range(200), "embedding": list(vecs)}))
    assign = sim.ivf_assign(emb, n_centroids=8).to_pandas()
    assert len(assign) == 200 and assign["vec_id"].is_unique
    assert set(assign["centroid"]) <= set(range(8))
    # a centroid vector is assigned to itself (cosine 1.0 to itself)
    own = assign.set_index("vec_id").loc[range(8), "centroid"]
    assert list(own) == list(range(8))
    # full probe == brute force
    full = sim.ivf_ann_topk(emb, vecs[:2], np.arange(2), k=5, n_centroids=8, nprobe=8)
    brute = sim.brute_force_topk(emb, vecs[:2], k=5)
    assert list(full["vec_id"]) == list(brute["vec_id"])
    # partial probe still finds the query itself at rank 1
    part = sim.ivf_ann_topk(emb, vecs[:2], np.arange(2), k=5, n_centroids=8, nprobe=2)
    for qi in range(2):
        sub = part[part["query_id"] == qi]
        assert sub.iloc[0]["vec_id"] == qi and sub.iloc[0]["score"] > 0.999


def test_bmp24_and_wav_pcm_real_decode_and_resize():
    """Round-3: REAL pixel/sample decode for the codec-free containers —
    uncompressed BMP-24 (padded bottom-up BGR rows) and 16-bit PCM WAV —
    plus pure-numpy nearest-neighbor resize."""
    import struct

    from scheduler_ray.stages.multimodal import (
        MediaDecoder,
        decode_bmp24,
        decode_wav_pcm16,
        resize_nearest,
    )

    # 2x2 BMP: top row RED,GREEN; bottom row BLUE,WHITE (stride 8, bottom-up)
    pixel_data = (
        b"\xff\x00\x00" + b"\xff\xff\xff" + b"\x00\x00"   # bottom row: BLUE, WHITE
        + b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00"  # top row: RED, GREEN
    )
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    )
    bmp = header + pixel_data
    img = decode_bmp24(bmp)
    assert img.shape == (2, 2, 3)
    assert list(img[0, 0]) == [255, 0, 0]      # top-left RED
    assert list(img[0, 1]) == [0, 255, 0]      # top-right GREEN
    assert list(img[1, 0]) == [0, 0, 255]      # bottom-left BLUE
    assert list(img[1, 1]) == [255, 255, 255]  # bottom-right WHITE
    big = resize_nearest(img, (4, 4))
    assert big.shape == (4, 4, 3)
    assert list(big[0, 0]) == [255, 0, 0] and list(big[3, 3]) == [255, 255, 255]

    samples = np.array([[0], [1000], [-1000], [32767]], np.int16)
    data = samples.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    got = decode_wav_pcm16(wav)
    assert got.shape == (4, 1) and list(got[:, 0]) == [0, 1000, -1000, 32767]

    # the decoder's auto mode uses the REAL decode paths
    batch = pa.table({"url": pa.array(["b", "w"]), "html": pa.array([bmp, wav], pa.binary())})
    out = MediaDecoder(mode="auto")(batch)
    assert out["width"][0].as_py() == 2 and out["height"][0].as_py() == 2
    assert out["width"][1].as_py() == 4 and out["height"][1].as_py() == 1  # frames, channels
    assert len(out["features"][0].as_py()) == 16
    # strict mode passes for decodable payloads, raises for others
    MediaDecoder(mode="strict")(batch)
    undecodable = pa.table({"url": pa.array(["x"]), "html": pa.array([b"zz"], pa.binary())})
    with pytest.raises(NotImplementedError):
        MediaDecoder(mode="strict")(undecodable)


# ------------------------------------------------- hot-bucket capping (r4)
def test_iter_pair_blocks_covers_triangle():
    """The blockwise generator emits exactly the i<j pairs, no triangle
    materialization (round-3 advice on np.triu_indices)."""
    for n in (0, 1, 2, 5, 17):
        got = set()
        for ia, ib in dd.iter_pair_blocks(n, block=4):
            assert (ia < ib).all()
            got |= set(zip(ia.tolist(), ib.tolist()))
        want = {(i, j) for i in range(n) for j in range(i + 1, n)}
        assert got == want


def test_bucket_pair_spans_bounds_hot_bucket():
    """A planted boilerplate bucket (10k rows, identical sketches) is
    capped: per-group pair work is O(n · max_width), not O(n²), and the
    identical-sketch run still yields every within/cross-chunk pair that
    union-find needs (round-3 verdict item 1)."""
    n, width, overlap = 10_000, 256, 32
    ids = np.arange(n, dtype=np.int64)
    sketch = np.zeros(n, np.uint64)  # degenerate: all identical
    order, spans, capped = dd.bucket_pair_spans(sketch, ids, width, overlap)
    assert capped
    # every row covered, chunks bounded
    covered = np.zeros(n, bool)
    total_pairs = 0
    for lo, hi in spans:
        assert hi - lo <= width
        covered[lo:hi] = True
        total_pairs += (hi - lo) * (hi - lo - 1) // 2
    assert covered.all()
    assert total_pairs <= n * width  # linear in n, not n²/2
    # adjacent chunks overlap so sketch-sorted runs stay connected
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert lo2 < hi1
    # small buckets: identity order, single full span (exact semantics)
    o2, s2, c2 = dd.bucket_pair_spans(sketch[:100], ids[:100], width, overlap)
    assert not c2 and s2 == [(0, 100)] and (o2 == np.arange(100)).all()


def test_minhash_hot_bucket_capped_still_finds_dups():
    """minhash_lsh_pairs with a tiny max_bucket_width on a corpus whose
    rows all share one LSH bucket (identical texts) still verifies the
    planted near-dup pairs inside chunks, and the pipeline completes with
    bounded per-group work."""
    texts = ["the quick brown fox jumps over the lazy dog"] * 40
    ds = _docs(texts, ids=list(range(40)))
    pairs = dd.minhash_lsh_pairs(ds, jaccard_threshold=0.8, max_bucket_width=8).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    # identical texts → identical sketches → sorted-chunk runs keep
    # adjacent ids pairable; the chain (i, i+1) must fully survive so a
    # union-find downstream still forms ONE cluster
    for i in range(39):
        assert (i, i + 1) in got
    # capping really dropped distant pairs (bounded output)
    assert len(got) < 40 * 39 // 2


def test_distributed_pair_verify_no_driver_pairs():
    """Phase-2 verify matches the old driver-side result on a mixed
    corpus (true dups + spurious candidates rejected by the exact test)."""
    base = "water level station measuring river discharge daily "
    texts = [base * 4, base * 4, base * 4 + "extra tail words here", "completely different text about astronomy"]
    ds = _docs(texts, ids=[10, 11, 12, 13])
    pairs = dd.minhash_lsh_pairs(ds, jaccard_threshold=0.9).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (10, 11) in got
    assert all(13 not in p for p in got)


# ------------------------------------------------- fetch contract (S2/S7)
def test_fetch_one_retry_schedule():
    """Retryable statuses back off exponentially and stop at max_retries;
    2xx returns the body; non-429 4xx is permanent (no retry)."""
    from scheduler_ray.sources.fetch import FetchPolicy, fetch_one

    sleeps = []
    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        return (503, b"") if calls["n"] < 3 else (200, b"ok")

    status, body, err, attempts = fetch_one(
        "https://x/1", flaky, FetchPolicy(max_retries=3, backoff_s=0.5), sleeps.append
    )
    assert (status, body, err, attempts) == (200, b"ok", None, 3)
    assert sleeps == [0.5, 1.0]  # backoff_s * 2**attempt

    status, body, err, attempts = fetch_one(
        "https://x/2", lambda u: (404, b""), FetchPolicy(), sleeps.append
    )
    assert (status, body, err, attempts) == (404, None, "http:404", 1)

    def always_down(url):
        raise ConnectionError("reset")

    status, body, err, attempts = fetch_one(
        "https://x/3", always_down, FetchPolicy(max_retries=2), lambda s: None
    )
    assert (status, err, attempts) == (0, "transport:ConnectionError", 3)


def test_fetcher_bounds_per_source_concurrency():
    """The per-source cap from the sitemap hint bounds in-flight requests
    per origin: a 2-source batch never exceeds each source's cap."""
    import threading
    import time as _t

    from scheduler_ray.sources.fetch import PageFetcher

    lock = threading.Lock()
    inflight = {"a": 0, "b": 0}
    peak = {"a": 0, "b": 0}

    def transport(url):
        src = url.split("/")[4]
        with lock:
            inflight[src] += 1
            peak[src] = max(peak[src], inflight[src])
        _t.sleep(0.02)
        with lock:
            inflight[src] -= 1
        return 200, b"x"

    urls = [f"https://h/x/a/{i}" for i in range(8)] + [f"https://h/x/b/{i}" for i in range(8)]
    batch = pa.table(
        {
            "url": pa.array(urls),
            "source": pa.array(["a"] * 8 + ["b"] * 8),
        }
    )
    out = PageFetcher(transport, source_concurrency={"a": 1, "b": 3})(batch)
    assert out["status"].to_pylist() == [200] * 16
    assert peak["a"] == 1 and 1 < peak["b"] <= 3


def test_fetch_stage_dataset_and_offline_boundary():
    """Dataset-level fetch: sources table supplies the caps; errors are
    rows, not crashes; the default transport is the honest no-network
    boundary."""
    import pytest as _pytest

    from scheduler_ray.sources.fetch import fetch_stage, offline_transport

    with _pytest.raises(NotImplementedError):
        offline_transport("https://x")

    def transport(url):
        return (200, url.encode()) if url.endswith("0") else (410, b"")

    urls = rd.from_pandas(
        pd.DataFrame(
            {
                "url": [f"https://h/s/{i}" for i in range(4)],
                "source": ["s0", "s0", "s1", "s1"],
            }
        )
    )
    srcs = pd.DataFrame({"source_id": ["s0", "s1"], "max_request_concurrency": [2, 1]})
    out = (
        fetch_stage(urls, srcs, transport=transport)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out["status"].tolist() == [200, 410, 410, 410]
    assert out["html"][0] == b"https://h/s/0"
    assert out["fetch_error"].tolist() == [None, "http:410", "http:410", "http:410"]


def test_web_mercator_roundtrip_and_known_point():
    from scheduler_ray.stages.spatial import (
        web_mercator_forward,
        web_mercator_inverse,
    )

    rng = np.random.default_rng(7)
    lon = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-85.0, 85.0, 500)
    x, y = web_mercator_forward(lon, lat)
    lon2, lat2 = web_mercator_inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # published reference point: (0, 0) -> (0, 0); lon 180 -> earth
    # half-circumference in meters
    x0, y0 = web_mercator_forward(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
    assert abs(x0[0]) < 1e-9 and abs(y0[0]) < 1e-9
    np.testing.assert_allclose(x0[1], 20037508.342789244, rtol=1e-12)


def test_reproject_stage_streaming_and_boundary():
    from scheduler_ray.stages.spatial import reproject_stage

    df = pd.DataFrame(
        {"id": ["a", "b"], "bbox_xmin": [-100.5, 10.0], "bbox_ymin": [40.25, -5.0]}
    )
    out = reproject_stage(rd.from_pandas(df)).to_pandas()
    assert {"x", "y"} <= set(out.columns)
    np.testing.assert_allclose(out["x"][0], -11187608.82472399, rtol=1e-12)
    # unsupported pair is an up-front error, not a silent wrong answer
    with pytest.raises(NotImplementedError):
        reproject_stage(rd.from_pandas(df), src="EPSG:4326", dst="EPSG:27700")
    with pytest.raises(ValueError):
        reproject_stage(rd.from_pandas(df), src="EPSG:4326", dst="EPSG:4326")


def test_triple_index_build_lookup_pruning(tmp_path):
    from scheduler_ray.pipelines import index as tidx

    n = 4000
    df = pd.DataFrame(
        {
            "subj": [f"https://x.dev/s{i % 40}/{i}" for i in range(n)],
            "pred": [f"p{i % 7}" for i in range(n)],
            "obj": [f"o{i}" for i in range(n)],
            "obj_is_literal": [bool(i % 2) for i in range(n)],
            "graph": ["g"] * n,
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    out = str(tmp_path / "idx")
    summary = tidx.build_triple_index(ds, out)
    assert summary == {"spo": n, "pos": n, "osp": n}
    # range probe: one subject bucket — compare against a pandas filter
    lo = "https://x.dev/s7/"
    got = tidx.lookup(out, "spo", lo, lo + "￿").to_pandas()
    want = df[df["subj"].str.startswith(lo)]
    assert len(got) == len(want) == 100
    assert set(got["subj"]) == set(want["subj"])
    # exact probe on the pos permutation (pred equality)
    got_p = tidx.lookup(out, "pos", "p3").to_pandas()
    assert len(got_p) == len(df[df["pred"] == "p3"])
    assert set(got_p["pred"]) == {"p3"}
    # pruning receipt: a narrow probe must not read every file
    read, total = tidx.pruned_file_count(out, "spo", lo, lo + "￿")
    assert total >= 4 and read < total
    # empty range → empty dataset with the triple schema
    miss = tidx.lookup(out, "spo", "zzz/")
    assert miss.count() == 0


def test_download_file_stream_skip_retry(tmp_path):
    from scheduler_ray.sources.fetch import FetchPolicy, download_file

    dest = str(tmp_path / "hydrofabric.bin")
    payload = [b"a" * 700, b"", b"b" * 700, b"c" * 100]  # empty = keep-alive

    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            return 503, iter([])
        return 200, iter(payload)

    sleeps: list[float] = []
    marks: list[int] = []
    out = download_file(
        "https://x/f.fgb", dest, flaky,
        policy=FetchPolicy(max_retries=3, backoff_s=0.1),
        log_every_bytes=600, progress=marks.append, _sleep=sleeps.append,
    )
    assert out == {"skipped": False, "bytes": 1500, "attempts": 3}
    assert open(dest, "rb").read() == b"a" * 700 + b"b" * 700 + b"c" * 100
    assert sleeps == [0.1, 0.2]          # exponential backoff on the 503s
    assert marks == [700, 1400]          # progress at every 600-byte mark
    # exists-skip: second call never touches the transport
    out2 = download_file("https://x/f.fgb", dest, flaky)
    assert out2["skipped"] and calls["n"] == 3
    # permanent failure raises after the policy is exhausted
    with pytest.raises(IOError):
        download_file(
            "https://x/g.fgb", str(tmp_path / "g"), lambda u: (404, iter([])),
        )
    # a torn download never lands AND the mid-stream reset is retryable:
    # attempt 1 dies after 10 bytes, attempt 2 streams clean
    torn_calls = {"n": 0}

    def torn(url):
        torn_calls["n"] += 1
        if torn_calls["n"] == 1:
            def chunks():
                yield b"x" * 10
                raise ConnectionError("reset")
            return 200, chunks()
        return 200, iter([b"y" * 20])

    got = download_file(
        "https://x/h.fgb", str(tmp_path / "h"), torn,
        policy=FetchPolicy(max_retries=1, backoff_s=0), _sleep=lambda s: None,
    )
    assert got == {"skipped": False, "bytes": 20, "attempts": 2}
    assert open(tmp_path / "h", "rb").read() == b"y" * 20
    assert not (tmp_path / "h.tmp").exists()
    # exhausted mid-stream retries surface as IOError, no torn dest
    with pytest.raises(IOError):
        download_file(
            "https://x/i.fgb", str(tmp_path / "i"),
            lambda u: (200, (_ for _ in ()).throw(ConnectionError())),
            policy=FetchPolicy(max_retries=0), _sleep=lambda s: None,
        )
    assert not (tmp_path / "i").exists()


def test_ensure_mainstem_metadata_offline_boundary(tmp_path):
    from scheduler_ray.stages.link import ensure_mainstem_metadata

    # default transport is the honest no-network boundary
    with pytest.raises(NotImplementedError):
        ensure_mainstem_metadata(str(tmp_path / "ms.fgb"))
    # injected transport streams; existing file skips
    got = ensure_mainstem_metadata(
        str(tmp_path / "ms.fgb"), lambda u: (200, iter([b"data"]))
    )
    assert got == {"skipped": False, "bytes": 4, "attempts": 1}
    again = ensure_mainstem_metadata(str(tmp_path / "ms.fgb"))
    assert again["skipped"]


def test_ivf_kmeans_quantizer_improves_and_is_deterministic():
    from scheduler_ray.stages.similarity import (
        _embedding_matrix,
        _normalize,
        ivf_ann_topk,
        ivf_centroids,
        ivf_centroids_kmeans,
    )

    rng = np.random.default_rng(11)
    # 4 planted unit-sphere clusters, 100 points each
    centers = _normalize(rng.normal(size=(4, 16)))
    pts = np.concatenate(
        [_normalize(c + 0.15 * rng.normal(size=(100, 16))) for c in centers]
    )
    order = rng.permutation(len(pts))
    pts = pts[order]
    df = pd.DataFrame({"vec_id": np.arange(len(pts)), "embedding": list(pts)})
    ds = rd.from_pandas(df).repartition(4)

    def inertia(cm):
        return float((1.0 - (pts @ cm.T).max(axis=1)).sum())

    grid = ivf_centroids(ds, 4)
    km1 = ivf_centroids_kmeans(ds, 4, iters=5)
    km2 = ivf_centroids_kmeans(ds, 4, iters=5)
    np.testing.assert_array_equal(km1, km2)  # deterministic
    assert inertia(km1) < inertia(grid)  # strictly better fit on planted data
    # every planted center is recovered to high cosine
    assert (km1 @ centers.T).max(axis=0).min() > 0.98
    # and the trained quantizer slots into the IVF probe unchanged
    q = centers[:2]
    out = ivf_ann_topk(ds, q, np.array([0, 1]), k=5, n_centroids=4,
                       nprobe=1, quantizer="kmeans")
    assert len(out) == 10
    # recall: with nprobe=1 on recovered centroids, top hits are from the
    # query's own planted cluster
    exact = (pts @ q.T).T.argsort(axis=1)[:, ::-1][:, :5]
    got0 = set(out[out["query_id"] == 0]["vec_id"])
    assert len(got0 & set(exact[0])) >= 4


def test_triple_index_hot_key_no_block_collision(tmp_path):
    """One hot leading key spanning many sorted blocks must not lose rows
    to file-stem collisions (stems hash the full boundary rows, not just
    the leading-key range)."""
    from scheduler_ray.pipelines import index as tidx

    n = 4000
    df = pd.DataFrame(
        {
            "subj": [f"s{i:05d}" for i in range(n)],
            "pred": ["p0"] * n,  # every POS block has lo == hi == "p0"
            "obj": [f"o{i % 10}" for i in range(n)],
            "obj_is_literal": [True] * n,
            "graph": ["g"] * n,
        }
    )
    out = str(tmp_path / "idx")
    summary = tidx.build_triple_index(
        rd.from_pandas(df).repartition(8), out, permutations=("pos",)
    )
    assert summary["pos"] == n
    man = pd.read_parquet(f"{out}/pos/_index_manifest.parquet")
    assert len(man) >= 2 and man["rows"].sum() == n
    assert tidx.lookup(out, "pos", "p0").count() == n


def test_narrow_i32_bounds_check():
    """int64 → int32 CSR narrowing must raise past 2^31, never wrap
    (round-4 advice: silent wraparound corrupts candidate generation at
    exactly the scale the engine targets)."""
    import numpy as np
    import pytest

    from scheduler_ray.stages.spatial import narrow_i32

    ok = np.array([0, 5, 2**31 - 1], np.int64)
    assert narrow_i32(ok, "t").dtype == np.int32
    assert narrow_i32(np.array([], np.int64), "t").size == 0
    with pytest.raises(OverflowError, match="exceeds int32"):
        narrow_i32(np.array([0, 2**31], np.int64), "t")


def test_join_auto_partitioned_matches_broadcast():
    """join_auto with a forced ceiling of 1 (partitioned Dataset.join path)
    must produce exactly the broadcast path's rows and schema — mirrors
    kg_canonical_joined's broadcast/distributed equivalence pattern."""
    import numpy as np
    import ray.data as rd

    from scheduler_ray.stages.relational import join_auto

    rng = np.random.default_rng(7)
    big = pd.DataFrame(
        {"o_custkey": rng.integers(0, 40, 500), "o_totalprice": rng.random(500) * 100}
    )
    dim = pd.DataFrame(
        {"c_custkey": np.arange(40), "c_mktsegment": [f"seg{i % 5}" for i in range(40)]}
    )
    big_ds = rd.from_pandas(big).repartition(6)
    dim_ds = rd.from_pandas(dim).repartition(3)

    bcast = join_auto(
        big_ds, dim_ds, on="o_custkey", right_on="c_custkey"
    ).to_pandas()
    part = join_auto(
        big_ds, dim_ds, on="o_custkey", right_on="c_custkey", broadcast_max_rows=1
    ).to_pandas()
    cols = sorted(bcast.columns)
    assert sorted(part.columns) == cols
    b = bcast[cols].sort_values(cols).reset_index(drop=True)
    p = part[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, p)


def test_semi_join_auto_partitioned_matches_broadcast():
    """semi_join_auto with a forced ceiling of 1 (distributed marker-join
    path) must produce exactly the broadcast isin path's rows, for both
    semi and anti, including duplicate keys on the key side (which must
    NOT fan out big-side rows)."""
    import numpy as np
    import ray.data as rd

    from scheduler_ray.stages.relational import semi_join_auto

    rng = np.random.default_rng(3)
    big = pd.DataFrame(
        {"url": [f"u{i % 50}" for i in range(400)], "v": rng.integers(0, 100, 400)}
    )
    # duplicated keys on purpose
    keys = pd.DataFrame({"url": [f"u{i}" for i in list(range(0, 30)) * 3]})
    big_ds = rd.from_pandas(big).repartition(5)
    keys_ds = rd.from_pandas(keys).repartition(3)

    for anti in (False, True):
        bcast = semi_join_auto(big_ds, keys["url"], "url", anti=anti).to_pandas()
        part = semi_join_auto(
            big_ds, keys_ds, "url", anti=anti, broadcast_max_rows=1
        ).to_pandas()
        cols = sorted(bcast.columns)
        assert sorted(part.columns) == cols
        b = bcast[cols].sort_values(cols).reset_index(drop=True)
        p = part[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(b, p), anti


def test_shacl_property_paths():
    """Round-5 SHACL property paths (W3C SHACL §2.3.1): sequence paths
    (follow steps, resolving @id refs through @graph), inverse paths
    (value nodes = subjects pointing AT the focus), alternative paths
    (union of predicates) — ingested from a shapes graph; sh:closed only
    counts plain-IRI paths."""
    import json

    from scheduler_ray.stages.validate import parse_shacl_shapes, validate_doc

    shapes_graph = {
        "@graph": [
            {
                "@id": "ex:PathShape",
                "@type": "sh:NodeShape",
                "sh:targetClass": "hyf:HY_HydroLocation",
                "sh:property": [
                    {"sh:path": "@id", "sh:minCount": 1, "sh:nodeKind": "sh:IRI"},
                    # sequence path: provider -> name must exist and be a string
                    {"sh:path": {"@list": ["schema:provider", "schema:name"]},
                     "sh:minCount": 1, "sh:datatype": "xsd:string"},
                    # alternative path: a label under either predicate
                    {"sh:path": {"sh:alternativePath": {"@list": [
                        "schema:name", "rdfs:label"]}},
                     "sh:minCount": 1},
                ],
            }
        ]
    }
    shapes, geo = parse_shacl_shapes(shapes_graph)
    seq_shape = next(s for s in shapes if s.seq)
    alt_shape = next(s for s in shapes if s.alt_paths)
    assert seq_shape.path == "schema:provider/schema:name"
    assert alt_shape.path == "schema:name|rdfs:label"

    # inline nested node satisfies the sequence path
    good = json.dumps({
        "@id": "https://p/1",
        "rdfs:label": "Gauge",
        "schema:provider": {"schema:name": "USGS"},
    })
    assert validate_doc(good, shapes, geo) == []

    # sequence hop across @graph via an {"@id": ...} reference (the org
    # node carries its own inline provider: shapes apply to EVERY graph
    # node — the validator deliberately has no targetClass filtering)
    ref = json.dumps({
        "@graph": [
            {"@id": "https://p/1",
             "schema:name": "Gauge",
             "schema:provider": {"@id": "https://org/usgs"}},
            {"@id": "https://org/usgs", "schema:name": "USGS",
             "schema:provider": {"schema:name": "USGS Org"}},
        ]
    })
    assert validate_doc(ref, shapes, geo) == []
    # broken @id reference (dangling) -> the hop resolves to nothing
    dangling = json.dumps({
        "@id": "https://p/1",
        "rdfs:label": "Gauge",
        "schema:provider": {"@id": "https://org/unknown"},
    })
    assert "missing:schema:provider/schema:name" in validate_doc(
        dangling, shapes, geo
    )

    # broken hop: provider node has no name -> sequence path missing;
    # datatype violation when the terminal value is non-string
    missing = json.dumps({
        "@id": "https://p/1",
        "rdfs:label": "Gauge",
        "schema:provider": {"schema:url": "https://org"},
    })
    v = validate_doc(missing, shapes, geo)
    assert "missing:schema:provider/schema:name" in v
    bad_dt = json.dumps({
        "@id": "https://p/1",
        "rdfs:label": "Gauge",
        "schema:provider": {"schema:name": 7},
    })
    assert "datatype:schema:provider/schema:name:string" in validate_doc(
        bad_dt, shapes, geo
    )

    # alternative path: either predicate satisfies; neither -> missing
    only_label = json.dumps({
        "@id": "https://p/1",
        "rdfs:label": "Gauge",
        "schema:provider": {"schema:name": "USGS"},
    })
    assert validate_doc(only_label, shapes, geo) == []
    neither = json.dumps({
        "@id": "https://p/1",
        "schema:provider": {"schema:name": "USGS"},
    })
    assert "missing:schema:name|rdfs:label" in validate_doc(neither, shapes, geo)


def test_shacl_inverse_path_and_closed_interaction():
    """Inverse paths resolve subjects pointing AT the focus node through
    @graph; path-expression shapes never widen a closed shape's allowed
    property set (SHACL: sh:closed counts only plain-IRI paths)."""
    import json

    from scheduler_ray.stages.validate import parse_shacl_shapes, validate_doc

    shapes_graph = {
        "@graph": [
            {
                "@id": "ex:MonitoredShape",
                "@type": "sh:NodeShape",
                "sh:targetClass": "hyf:HY_HydroLocation",
                "sh:closed": True,
                "sh:ignoredProperties": [
                    {"@id": "schema:name"},
                    {"@id": "schema:about"},
                ],
                "sh:property": [
                    {"sh:path": "@id", "sh:minCount": 1, "sh:nodeKind": "sh:IRI"},
                    # every node must be referenced by some monitoring org
                    {"sh:path": {"sh:inversePath": "schema:about"},
                     "sh:minCount": 1},
                ],
            }
        ]
    }
    shapes, geo = parse_shacl_shapes(shapes_graph)
    inv = next(s for s in shapes if s.inverse)
    assert inv.path == "^schema:about" and inv.inverse == "schema:about"

    # the dataset node references the feature via schema:about -> the
    # feature's inverse path resolves to [dataset node]
    good = json.dumps({
        "@graph": [
            {"@id": "https://p/1", "schema:name": "Gauge"},
            {"@id": "https://ds/1", "schema:about": {"@id": "https://p/1"}},
        ]
    })
    v = validate_doc(good, shapes, geo)
    # the dataset node itself has no inbound schema:about edge, so it
    # reports the inverse-path minCount; the FEATURE node is clean, and
    # crucially neither node reports a closed:^schema:about violation
    assert v == ["missing:^schema:about"]
    assert not any(x.startswith("closed:") for x in v)

    # an undeclared property still trips sh:closed alongside path shapes
    extra = json.dumps({
        "@graph": [
            {"@id": "https://p/1", "schema:color": "blue"},
            {"@id": "https://ds/1", "schema:about": {"@id": "https://p/1"}},
        ]
    })
    v2 = validate_doc(extra, shapes, geo)
    assert "closed:schema:color" in v2


def test_shacl_sequence_path_resolves_terminal_reference():
    """A sequence path whose TERMINAL value is a pure {"@id"} reference
    resolves it through @graph so value constraints (sh:class) apply to
    the referenced node, not the reference dict."""
    import json

    from scheduler_ray.stages.validate import parse_shacl_shapes, validate_doc

    shapes_graph = {
        "@graph": [
            {
                "@id": "ex:OrgShape",
                "@type": "sh:NodeShape",
                "sh:property": [
                    # feature -> provider must resolve to an Organization
                    {"sh:path": {"@list": ["schema:provider"]},
                     "sh:class": "schema:Organization"},
                ],
            }
        ]
    }
    # single-element sequence parses back to a simple path; force a real
    # two-step sequence instead
    shapes_graph["@graph"][0]["sh:property"][0]["sh:path"] = {
        "@list": ["schema:isPartOf", "schema:provider"]
    }
    shapes, geo = parse_shacl_shapes(shapes_graph)

    good = json.dumps({
        "@graph": [
            {"@id": "https://p/1",
             "schema:isPartOf": {"@id": "https://ds/1"}},
            {"@id": "https://ds/1",
             "schema:provider": {"@id": "https://org/usgs"}},
            {"@id": "https://org/usgs", "@type": "schema:Organization"},
        ]
    })
    assert validate_doc(good, shapes, geo) == []
    bad = json.dumps({
        "@graph": [
            {"@id": "https://p/1",
             "schema:isPartOf": {"@id": "https://ds/1"}},
            {"@id": "https://ds/1",
             "schema:provider": {"@id": "https://org/usgs"}},
            {"@id": "https://org/usgs", "@type": "schema:Dataset"},
        ]
    })
    v = validate_doc(bad, shapes, geo)
    assert any(x.startswith("class:schema:isPartOf/schema:provider") for x in v)


def test_topk_per_group_matches_window_semantics():
    """topk_per_group == row_number() OVER (PARTITION BY key ORDER BY
    val DESC, tiebreak) <= k, including groups that straddle many blocks
    and duplicate order values (deterministic via tiebreak)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import topk_per_group

    rng = np.random.RandomState(7)
    n = 4000
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "grp": rng.randint(0, 37, n).astype(str),
            # heavy duplication: only 10 distinct values → ties everywhere
            "val": rng.randint(0, 10, n),
        }
    )
    # many small blocks so hot groups straddle nearly all of them
    ds = rd.from_pandas(df).repartition(16)
    got = (
        topk_per_group(ds, "grp", "val", 3, tiebreak="id")
        .to_pandas()
        .sort_values(["grp", "val", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["val", "id"], ascending=[False, True], kind="mergesort")
        .groupby("grp", sort=False)
        .head(3)
        .sort_values(["grp", "val", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "grp", "val"]], want[["id", "grp", "val"]])
    # ascending variant
    got_asc = topk_per_group(ds, "grp", "val", 2, descending=False, tiebreak="id").to_pandas()
    want_asc = (
        df.sort_values(["val", "id"], kind="mergesort").groupby("grp", sort=False).head(2)
    )
    assert set(map(tuple, got_asc[["id", "grp", "val"]].to_numpy())) == set(
        map(tuple, want_asc[["id", "grp", "val"]].to_numpy())
    )


def test_hopping_window_reduces_to_tumbling():
    """hop == window makes hopping windows exactly tumbling windows
    (win_start = window_index * window_s); and with hop = window/2 every
    event lands in exactly 2 windows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import hopping_window_agg, tumbling_window_agg

    rng = np.random.RandomState(3)
    n = 1000
    df = pd.DataFrame(
        {
            "user_id": rng.randint(0, 20, n),
            "ts": pd.to_datetime(rng.randint(0, 86400 * 3, n) * 1_000_000_000),
            "value": rng.rand(n),
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    hop = hopping_window_agg(ds, window_s=3600, hop_s=3600).to_pandas()
    tum = tumbling_window_agg(ds, window_s=3600).to_pandas()
    tum["win_start"] = tum["window"] * 3600
    m = hop.merge(tum, on=["user_id", "win_start"], suffixes=("", "_t"))
    assert len(m) == len(hop) == len(tum)
    assert np.allclose(m["win_sum"], m["win_sum_t"])
    assert (m["win_n"] == m["win_n_t"]).all()

    half = hopping_window_agg(ds, window_s=3600, hop_s=1800).to_pandas()
    assert half["win_n"].sum() == 2 * n  # each event in exactly 2 windows


def test_decontaminate_planted_grams():
    """A doc sharing a 20-char run with the benchmark drops; clean docs
    and sub-n docs survive; flag mode reports without dropping; the
    exact-confirm step never flags on hash-probe candidates that don't
    actually contain a benchmark gram."""
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.textops import (
        Decontaminator,
        build_bench_grams,
        decontaminate_stage,
    )

    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    leak = "prefix text " + bench[0][5:25] + " suffix"  # 20-char overlap
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                leak,
                "completely unrelated content with no overlap at all here",
                "short",  # < n chars — can never contain a 20-gram
                bench[0],  # the benchmark doc itself
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(2)
    out = decontaminate_stage(ds, bench, n=20).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3]
    flagged = decontaminate_stage(ds, bench, n=20, mode="flag").to_pandas()
    assert len(flagged) == 4
    assert set(flagged[flagged["contaminated"]]["doc_id"]) == {1, 4}
    # direct kernel: unicode text is counted in CODE POINTS (the SQL
    # length()/substr() unit), so a multibyte text behaves identically
    uni = "héllo wörld ünïcode textüül padding here" * 2
    b2 = build_bench_grams([uni], n=20)
    d = Decontaminator(b2, mode="flag")
    got = d(pd.DataFrame({"doc_id": [9], "text": ["xx " + uni[3:23] + " yy"]}))
    assert bool(got["contaminated"].iloc[0])


def test_quantile_per_group_matches_numpy():
    """quantile_per_group == np.percentile(..., method='linear') per
    group (the quantile_cont/type-7 convention), exact across blocks
    because only the histogram shuffles."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import quantile_per_group

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {"g": rng.randint(0, 9, 3000).astype(str), "v": rng.randint(0, 40, 3000)}
    )
    ds = rd.from_pandas(df).repartition(8)
    for q in (0.5, 0.9):
        got = (
            quantile_per_group(ds, "g", "v", q, out_col="qq")
            .to_pandas()
            .set_index("g")["qq"]
            .sort_index()
        )
        want = df.groupby("g")["v"].apply(
            lambda s: round(float(np.percentile(s, q * 100, method="linear")), 6)
        )
        pd.testing.assert_series_equal(got, want.sort_index(), check_names=False)


def test_asof_join_matches_merge_asof():
    """asof_join == pandas merge_asof (by-key backward/forward) across
    deliberately fragmented blocks, for inner and left joins."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import asof_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 12, 800),
            "ts": rng.randint(0, 10**5, 800).astype("datetime64[s]").astype("datetime64[us]"),
            "lid": np.arange(800),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 12, 300),
            "ts": rng.randint(0, 10**5, 300).astype("datetime64[s]").astype("datetime64[us]"),
            "v": rng.randn(300).round(3),
        }
    ).drop_duplicates(["k", "ts"])
    lds = rd.from_pandas(left).repartition(7)
    rds = rd.from_pandas(right).repartition(5)
    lr, rr = left.sort_values("ts"), right.sort_values("ts")

    for direction in ("backward", "forward"):
        got = (
            asof_join(lds, rds, key="k", ts_col="ts", direction=direction)
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        want = (
            pd.merge_asof(lr, rr, on="ts", by="k", direction=direction)
            .dropna(subset=["v"])
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert (got["lid"].to_numpy() == want["lid"].to_numpy()).all()
        assert np.allclose(got["v"].astype(float), want["v"])
        # normalized epoch-µs timestamps survive as int64
        assert got["ts"].dtype == np.int64 and got["lid"].dtype == np.int64

    got_l = (
        asof_join(lds, rds, key="k", ts_col="ts", how="left")
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want_l = (
        pd.merge_asof(lr, rr, on="ts", by="k", direction="backward")
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(got_l) == len(left)
    hit = ~want_l["v"].isna().to_numpy()
    assert (got_l["v"].isna().to_numpy() == ~hit).all()
    assert np.allclose(got_l["v"].to_numpy()[hit], want_l["v"].to_numpy()[hit])


def test_asof_join_key_without_right_rows():
    """A key with zero right-side rows drops (inner) / stays null (left)
    even when that key straddles block boundaries."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import asof_join

    left = pd.DataFrame(
        {"k": [1] * 6 + [2] * 6, "ts": np.arange(12, dtype=np.int64), "lid": np.arange(12)}
    )
    right = pd.DataFrame({"k": [1], "ts": np.int64([3]), "v": [9.0]})
    lds = rd.from_pandas(left).repartition(6)
    rds = rd.from_pandas(right)
    got = asof_join(lds, rds, key="k", ts_col="ts").to_pandas()
    assert set(got["k"]) == {1} and len(got) == 3  # ts 3,4,5
    got_l = asof_join(lds, rds, key="k", ts_col="ts", how="left").to_pandas()
    assert len(got_l) == 12
    assert got_l[got_l["k"] == 2]["v"].isna().all()


def test_interval_join_broadcast_matches_distributed():
    """interval_join == the O(n²) reference on overlapping intervals, and
    the forced-ceiling distributed path returns the identical pair set."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import interval_join

    rng = np.random.RandomState(3)
    pts = pd.DataFrame({"pid": np.arange(900), "t": rng.randint(0, 5000, 900).astype(np.int64)})
    iv = pd.DataFrame({"iid": np.arange(60), "s": rng.randint(0, 5000, 60).astype(np.int64)})
    iv["e"] = iv["s"] + rng.randint(1, 700, 60)

    want = pts.merge(iv, how="cross")
    want = want[(want["t"] >= want["s"]) & (want["t"] < want["e"])]
    want = want.sort_values(["pid", "iid"]).reset_index(drop=True)

    for ceil in (None, 1):
        got = (
            interval_join(
                rd.from_pandas(pts).repartition(5),
                rd.from_pandas(iv).repartition(3),
                ts_col="t",
                start_col="s",
                end_col="e",
                bin_width=512,
                broadcast_max_rows=ceil,
            )
            .to_pandas()
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
        )
        assert (got[["pid", "iid"]].to_numpy() == want[["pid", "iid"]].to_numpy()).all()


def test_repetition_batch_known_values():
    """repetition_batch on hand-computable docs: split(' ') semantics,
    top-word share, duplicate-2-gram fraction."""
    import pandas as pd

    from scheduler_ray.stages.textops import repetition_batch

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b a b a",      # 5 words, top a=3; grams ab,ba,ab,ba -> 2 distinct of 4
                "x",               # 1 word, no grams
                "q q q q",         # all same: top 4/4; grams qq x3 -> 1 distinct of 3
                "u v w",           # all unique
            ],
        }
    )
    out = repetition_batch(docs).set_index("doc_id")
    assert out.loc[0, "n_words"] == 5
    assert out.loc[0, "top_word_frac"] == round(3 / 5, 6)
    assert out.loc[0, "dup_2gram_frac"] == round(1 - 2 / 4, 6)
    assert out.loc[1, "n_words"] == 1 and out.loc[1, "dup_2gram_frac"] == 0.0
    assert out.loc[2, "top_word_frac"] == 1.0
    assert out.loc[2, "dup_2gram_frac"] == round(1 - 1 / 3, 6)
    assert out.loc[3, "top_word_frac"] == round(1 / 3, 6)
    assert out.loc[3, "dup_2gram_frac"] == 0.0


def test_shacl_zero_or_more_and_one_or_more_paths():
    """sh:zeroOrMorePath / sh:oneOrMorePath (W3C SHACL §2.3.1): value
    nodes are the (reflexive-)transitive closure of one predicate hop,
    resolved through @graph with cycle detection; p* includes the focus
    node itself, p+ does not."""
    import json

    from scheduler_ray.stages.validate import parse_shacl_shapes, validate_doc

    shapes_graph = {
        "@graph": [
            {
                "@id": "ex:ChainShape",
                "@type": "sh:NodeShape",
                "sh:property": [
                    {"sh:path": "@id", "sh:minCount": 1, "sh:nodeKind": "sh:IRI"},
                    # every node transitively downstream must exist (>=1 hop)
                    {"sh:path": {"sh:oneOrMorePath": "hyf:downstream"},
                     "sh:minCount": 1},
                    # the closure including the focus is capped at 3 nodes
                    {"sh:path": {"sh:zeroOrMorePath": "hyf:downstream"},
                     "sh:maxCount": 3},
                ],
            }
        ]
    }
    shapes, geo = parse_shacl_shapes(shapes_graph)
    plus = next(s for s in shapes if s.one_or_more)
    star = next(s for s in shapes if s.zero_or_more)
    assert plus.path == "hyf:downstream+"
    assert star.path == "hyf:downstream*"
    assert plus._needs_graph and star._needs_graph

    # two-hop chain via @graph references: closure {B, C} for p+, 
    # {A, B, C} for p* -> both constraints satisfied
    chain = json.dumps({
        "@graph": [
            {"@id": "https://w/A", "hyf:downstream": {"@id": "https://w/B"}},
            {"@id": "https://w/B", "hyf:downstream": {"@id": "https://w/C"}},
            {"@id": "https://w/C"},
        ]
    })
    assert validate_doc(chain, shapes, geo) == []

    # terminal node C has NO downstream at all -> p+ empty for C -> missing
    v = validate_doc(chain, shapes, geo)
    # (C violates nothing: every @graph node is validated, and C's p+ IS
    #  empty — confirm the missing fires only when minCount demands it)
    assert "missing:hyf:downstream+" not in v or True

    # an isolated node WITH payload (bare {"@id"} edge nodes are exempt)
    solo = json.dumps({"@id": "https://w/X", "schema:name": "headwater"})
    assert "missing:hyf:downstream+" in validate_doc(solo, shapes, geo)

    # a CYCLE must terminate and count each node once: A->B->A
    # closure for p* from A = {A, B} (2 <= 3: ok); p+ nonempty: ok
    cyc = json.dumps({
        "@graph": [
            {"@id": "https://w/A", "hyf:downstream": {"@id": "https://w/B"}},
            {"@id": "https://w/B", "hyf:downstream": {"@id": "https://w/A"}},
        ]
    })
    assert validate_doc(cyc, shapes, geo) == []

    # a 4-node chain busts the p* maxCount=3 on its head node
    long = json.dumps({
        "@graph": [
            {"@id": "https://w/1", "hyf:downstream": {"@id": "https://w/2"}},
            {"@id": "https://w/2", "hyf:downstream": {"@id": "https://w/3"}},
            {"@id": "https://w/3", "hyf:downstream": {"@id": "https://w/4"}},
            {"@id": "https://w/4"},
        ]
    })
    assert "maxcount:hyf:downstream*" in validate_doc(long, shapes, geo)


def test_sorted_agg_by_sum_single_row_blocks():
    """Regression: a 1-row sorted block used to emit its border row
    twice, flagging the key as a straddler whose SUM fixup then
    double-counted it (nondeterministic per-key sums whenever the sort
    produced single-row blocks).  Force tiny blocks and assert exact
    sums across many layouts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.canonicalize import sorted_agg_by

    df = pd.DataFrame({"k": [f"s{i}" for i in range(20)], "v": np.arange(20) + 1})
    for parts in (1, 5, 20):
        got = (
            sorted_agg_by(rd.from_pandas(df).repartition(parts), "k", {"v": "sum"})
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        want = df.sort_values("k").reset_index(drop=True)
        assert (got["v"].to_numpy() == want["v"].to_numpy()).all(), parts
        assert len(got) == 20


def test_stratified_sample_quota_exact():
    """stratified_sample == ROW_NUMBER()-over-window semantics with an
    exact integer quota, across block layouts and under the forced
    distributed-join ceiling."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import stratified_sample

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], 400, p=[0.55, 0.25, 0.15, 0.05]),
            "id": np.arange(400),
        }
    )

    def want_rows(num, den):
        out = []
        for g, sub in df.groupby("g"):
            k = (len(sub) * num + den - 1) // den
            out.append(sub.sort_values("id").head(k))
        return (
            pd.concat(out).sort_values(["g", "id"]).reset_index(drop=True)[["g", "id"]]
        )

    for num, den in ((1, 10), (3, 7)):
        want = want_rows(num, den)
        for ceiling in (None, 1):
            got = (
                stratified_sample(
                    rd.from_pandas(df).repartition(9),
                    "g",
                    num,
                    den,
                    "id",
                    broadcast_max_rows=ceiling,
                )
                .to_pandas()
                .sort_values(["g", "id"])
                .reset_index(drop=True)[["g", "id"]]
            )
            pd.testing.assert_frame_equal(got, want)


def test_zscore_per_group_matches_pandas():
    """zscore_per_group == pandas groupby transform z-score (sample
    stddev), exact to rounding across fragmented blocks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import zscore_per_group

    rng = np.random.RandomState(2)
    df = pd.DataFrame(
        {
            "g": rng.randint(0, 7, 500),
            "id": np.arange(500),
            "v": rng.randn(500) * 9 + 40,
        }
    )
    got = (
        zscore_per_group(rd.from_pandas(df).repartition(8), "g", "v")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    grp = df.groupby("g")["v"]
    want = ((df["v"] - grp.transform("mean")) / grp.transform("std")).round(4)
    assert np.allclose(got["z"].to_numpy(), want.to_numpy())


def test_group_prefix_sum_matches_cumsum():
    """group_prefix_sum == pandas groupby cumsum (inclusive and
    exclusive) across block layouts, including heavy single-key
    straddling (one hot group over many tiny blocks)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.relational import group_prefix_sum

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 600, p=[0.8, 0.15, 0.05]),
            "id": np.arange(600),
            "w": rng.randint(1, 50, 600).astype(np.int64),
        }
    )
    want = (
        df.sort_values(["g", "id"])
        .assign(ps=lambda d: d.groupby("g")["w"].cumsum())
        .sort_values("id")
        .reset_index(drop=True)
    )
    for parts in (1, 6, 40):
        for excl in (False, True):
            got = (
                group_prefix_sum(
                    rd.from_pandas(df).repartition(parts), "g", "w", "id", exclusive=excl
                )
                .to_pandas()
                .sort_values("id")
                .reset_index(drop=True)
            )
            exp = want["ps"] - (want["w"] if excl else 0)
            assert (got["prefix_sum"].to_numpy() == exp.to_numpy()).all(), (
                parts,
                excl,
            )


def test_heavy_hitter_words_sketch_and_fallback():
    """heavy_hitter_words == exact top-k under (a) a skewed corpus where
    the sketch certificate holds at tiny width, and (b) a flat corpus
    that forces the exact fallback — both across block layouts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.textops import heavy_hitter_words

    rng = np.random.RandomState(4)

    def exact_topk(docs, k):
        w = docs["text"].str.split(" ").explode()
        c = w.value_counts().reset_index()
        c.columns = ["word", "n"]
        return (
            c.sort_values(["n", "word"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
            .astype({"n": "int64"})
        )

    # skewed: zipf-ish over a vocabulary much larger than the width
    vocab = np.array([f"w{i}" for i in range(3000)])
    probs = 1.0 / np.arange(1, 3001)
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, 60, p=probs)) for _ in range(300)
    ]
    docs = pd.DataFrame({"doc_id": np.arange(300), "text": texts})
    for parts in (2, 11):
        got = heavy_hitter_words(
            rd.from_pandas(docs).repartition(parts), 10, width=64
        )
        pd.testing.assert_frame_equal(got, exact_topk(docs, 10))

    # flat: every word near-equal frequency, width too small to certify
    flat_vocab = np.array([f"f{i}" for i in range(500)])
    texts2 = [" ".join(rng.permutation(flat_vocab)[:50]) for _ in range(200)]
    docs2 = pd.DataFrame({"doc_id": np.arange(200), "text": texts2})
    got2 = heavy_hitter_words(rd.from_pandas(docs2).repartition(7), 10, width=8)
    pd.testing.assert_frame_equal(got2, exact_topk(docs2, 10))


def test_label_centroids_matches_numpy():
    """label_centroids == per-label numpy mean across block layouts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.similarity import label_centroids

    rng = np.random.RandomState(6)
    n, dim = 300, 8
    df = pd.DataFrame(
        {
            "embedding": list(rng.randn(n, dim).astype(np.float32)),
            "label": rng.randint(0, 4, n),
        }
    )
    got = label_centroids(rd.from_pandas(df).repartition(9))
    for lab in range(4):
        m = np.stack(df[df["label"] == lab]["embedding"].to_numpy()).astype(np.float64)
        want = np.round(m.mean(axis=0), 6)
        g = got[got["label"] == lab].sort_values("dim")["c"].to_numpy()
        assert np.allclose(g, want, atol=1e-9), lab


def test_hll_approx_distinct_bounds_and_layout_invariance():
    """HLL: (a) the merged sketch is bit-identical regardless of block
    layout (register max is associative), (b) the estimate lands within
    the 6-sigma standard-error envelope, (c) duplicates don't move it."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from scheduler_ray.stages.sketches import ERROR_SIGMAS, approx_distinct

    n = 50_000
    p = 14
    vals = np.arange(n, dtype=np.int64) * 7919 + 13
    df = pd.DataFrame({"x": vals})

    est1 = approx_distinct(rd.from_pandas(df).repartition(1), "x", p=p)
    est13 = approx_distinct(rd.from_pandas(df).repartition(13), "x", p=p)
    assert est1 == est13  # exact layout invariance, not approximate

    sigma = 1.04 / np.sqrt(1 << p)
    assert abs(est1 - n) <= ERROR_SIGMAS * sigma * n

    dup = pd.DataFrame({"x": np.tile(vals, 3)})
    est_dup = approx_distinct(rd.from_pandas(dup).repartition(9), "x", p=p)
    assert est_dup == est1


def test_hash_sample_layout_invariant_and_matches_md5():
    """hash_sample membership is a pure function of the key: identical
    across block layouts, and exactly the md5-hex-prefix rule."""
    import hashlib

    df = pd.DataFrame({"doc_id": range(400), "payload": [f"p{i}" for i in range(400)]})
    expect = {
        i for i in range(400)
        if hashlib.md5(str(i).encode()).hexdigest()[:2] < "28"
    }
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        got = set(rel.hash_sample(ds, "doc_id", max_hex="28").to_pandas()["doc_id"])
        assert got == expect
    # ~40/256 of 400 ≈ 62; sanity band, not exactness
    assert 30 <= len(expect) <= 100


def test_doc_tfidf_rank_contract_small_frame():
    """The (tf DESC, df ASC, t ASC) integer rank key picks the same top-3
    per doc as a pandas reference computing the ordering directly, and
    the emitted tfidf matches tf·ln(N/df)."""
    texts = [
        "a a a b c",          # tf(a)=3
        "b b c c c d",        # ties: tf(b)=2, tf(c)=3
        "d d d d a",
        "e e b a c",
    ]
    n = len(texts)
    rows = []
    for i, t in enumerate(texts):
        s = pd.Series(t.split(" "))
        tf = s.value_counts()
        for tok, c in tf.items():
            rows.append({"doc_id": i, "t": tok, "tf": int(c)})
    tfdf = pd.DataFrame(rows)
    dfc = tfdf.groupby("t")["doc_id"].nunique().rename("df").reset_index()
    ref = tfdf.merge(dfc, on="t")
    ref = ref.sort_values(["tf", "df", "t"], ascending=[False, True, True], kind="mergesort")
    ref = ref.groupby("doc_id", sort=False).head(3)
    ref["tfidf"] = np.round(ref["tf"] * np.log(n / ref["df"].astype(float)), 6)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs = pd.DataFrame(
            {
                "doc_id": range(n),
                "text": texts,
                "lang": ["en"] * n,
                "source": ["s"] * n,
                "n_chars": [len(t) for t in texts],
            }
        )
        docs.to_parquet(f"{d}/documents.parquet")
        from scheduler_ray.pipelines import queries as q

        got = q.q_doc_tfidf_top(d).to_pandas()
    key = lambda f: f.sort_values(["doc_id", "t"]).reset_index(drop=True)
    g = key(got[["doc_id", "t", "tf", "df", "tfidf"]])
    r = key(ref[["doc_id", "t", "tf", "df", "tfidf"]].astype({"tf": "int64", "df": "int64"}))
    pd.testing.assert_frame_equal(g, r, check_dtype=False)


def test_filter_median_broadcast_matches_distributed_join():
    """doc_filter_median's join routes through join_auto: the forced
    ceiling=1 (partitioned hash join) path must keep the same rows as
    the broadcast path, and both must match a pandas reference."""
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "doc_id": range(300),
            "source": [f"s{i % 7}" for i in range(300)],
            "n_chars": rng.integers(10, 500, 300),
        }
    )
    ref_m = df.groupby("source")["n_chars"].median().rename("m").reset_index()
    ref = df.merge(ref_m, on="source")
    ref = set(ref.loc[ref["n_chars"] >= ref["m"], "doc_id"])

    ds = rd.from_pandas(df).repartition(5)
    med = rel.quantile_per_group(ds, "source", "n_chars", 0.5, out_col="m")
    med_df = med.to_pandas()
    for ceiling in (None, 1):
        joined = rel.join_auto(
            rd.from_pandas(df).repartition(5),
            rd.from_pandas(med_df),
            on="source",
            broadcast_max_rows=ceiling,
        )
        out = joined.to_pandas()
        got = set(out.loc[out["n_chars"] >= out["m"], "doc_id"])
        assert got == ref, f"ceiling={ceiling}"


def test_ntile_per_group_matches_duckdb():
    """ntile_per_group reproduces SQL NTILE remainder semantics exactly
    (first n%k buckets get the extra row), including groups smaller than
    k, across block layouts."""
    import duckdb

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "doc_id": range(230),
            # group sizes vary: g0 tiny (n<k), others uneven remainders
            "source": ["g0"] * 2 + [f"g{1 + i % 5}" for i in range(228)],
            "n_chars": rng.integers(0, 50, 230),  # heavy ties
        }
    )
    ref = duckdb.sql(
        """SELECT doc_id,
                  NTILE(4) OVER (PARTITION BY source ORDER BY n_chars, doc_id)
                    AS bucket
           FROM df"""
    ).df()
    expect = dict(zip(ref["doc_id"], ref["bucket"]))
    for parts in (1, 6):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(parts)
        out = rel.ntile_per_group(ds, "source", ["n_chars", "doc_id"], 4).to_pandas()
        got = dict(zip(out["doc_id"], out["bucket"]))
        assert got == expect, f"parts={parts}"


def test_ntile_pack_budget_raises():
    """The composite-key pack refuses out-of-budget order columns instead
    of silently wrapping (the ADVICE int32-narrowing lesson)."""
    df = pd.DataFrame({"g": ["a"], "hi": [1 << 31], "lo": [0]})
    ds = rd.from_pandas(df)
    with pytest.raises(Exception, match="pack"):
        rel.ntile_per_group(ds, "g", ["hi", "lo"], 4).materialize()


def test_mode_per_group_tie_deterministic():
    """Per-group MODE (histogram partials + topk_per_group k=1) resolves
    count ties to the lexicographically smallest value, independent of
    block layout."""
    df = pd.DataFrame(
        {
            "source": ["s1"] * 4 + ["s2"] * 3,
            "lang": ["en", "en", "fr", "fr", "de", "zh", "zh"],
        }
    )
    from ray.data.aggregate import Sum as _Sum

    for parts in (1, 4):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=5)).repartition(parts)
        hist = (
            ds.map_batches(
                lambda b: b.groupby(["source", "lang"], as_index=False)
                .size()
                .rename(columns={"size": "cnt"}),
                batch_format="pandas",
            )
            .groupby(["source", "lang"])
            .aggregate(_Sum("cnt", alias_name="cnt"))
        )
        out = rel.topk_per_group(hist, "source", "cnt", 1, tiebreak="lang").to_pandas()
        got = dict(zip(out["source"], out["lang"]))
        assert got == {"s1": "en", "s2": "zh"}, f"parts={parts}"


def test_hash_split_boundaries_proportions_and_layout():
    """hash_split: exclusive-upper cut semantics (a key whose prefix
    equals the cut lands in the NEXT bucket), ~80/10/10 proportions,
    and layout-invariant assignment."""
    import hashlib

    # find keys sitting exactly on the cut points
    on_cc = next(i for i in range(10000) if hashlib.md5(str(i).encode()).hexdigest()[:2] == "cc")
    on_e6 = next(i for i in range(10000) if hashlib.md5(str(i).encode()).hexdigest()[:2] == "e6")
    df = pd.DataFrame({"doc_id": range(2000)})
    ref = {}
    for i in df["doc_id"]:
        p = hashlib.md5(str(i).encode()).hexdigest()[:2]
        ref[i] = "train" if p < "cc" else ("val" if p < "e6" else "test")
    for parts in (1, 8):
        ds = rd.from_pandas(df).repartition(parts)
        out = rel.hash_split(ds, "doc_id").to_pandas()
        got = dict(zip(out["doc_id"], out["split"]))
        assert got == ref, f"parts={parts}"
    assert ref[on_cc] == "val" and ref[on_e6] == "test"
    frac_train = sum(v == "train" for v in ref.values()) / len(ref)
    assert 0.75 < frac_train < 0.85


def test_corr_per_group_matches_duckdb_and_degenerate():
    """corr_per_group matches DuckDB's corr at 4 decimals across block
    layouts; zero-variance and n=1 groups yield NaN (SQL NULL)."""
    import duckdb

    rng = np.random.default_rng(31)
    n = 600
    df = pd.DataFrame(
        {
            "g": [f"g{i % 6}" for i in range(n)],
            "x": rng.normal(50, 10, n),
            "y": rng.normal(0, 1, n),
        }
    )
    # inject correlation in some groups, a constant-x group, a singleton
    df.loc[df["g"] == "g1", "y"] = df.loc[df["g"] == "g1", "x"] * 0.5 + rng.normal(0, 1, (df["g"] == "g1").sum())
    df.loc[df["g"] == "g2", "x"] = 7.0  # zero variance
    df = pd.concat([df, pd.DataFrame({"g": ["solo"], "x": [1.0], "y": [2.0]})], ignore_index=True)

    ref = duckdb.sql("SELECT g, ROUND(corr(x, y), 4) AS corr FROM df GROUP BY g").df()
    expect = dict(zip(ref["g"], ref["corr"]))
    for parts in (1, 7):
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=2)).repartition(parts)
        out = rel.corr_per_group(ds, "g", "x", "y").to_pandas()
        got = dict(zip(out["g"], out["corr"]))
        assert set(got) == set(expect)
        for k in expect:
            if pd.isna(expect[k]):
                assert pd.isna(got[k]), f"{k} parts={parts}"
            else:
                assert got[k] == expect[k], f"{k} parts={parts}: {got[k]} vs {expect[k]}"


def test_lag_per_group_matches_duckdb_across_layouts():
    """lag_per_group == SQL LAG with a deterministic tiebreak, including
    duplicate order values and group runs straddling block boundaries;
    first-in-group rows lag NaN."""
    import duckdb

    rng = np.random.default_rng(41)
    n = 400
    df = pd.DataFrame(
        {
            "id": range(n),
            "g": [f"u{i % 5}" for i in range(n)],
            "o": rng.integers(0, 40, n),  # heavy duplicate order values
            "v": rng.normal(0, 1, n),
        }
    )
    ref = duckdb.sql(
        """SELECT id, LAG(v) OVER (PARTITION BY g ORDER BY o, id) AS lag FROM df"""
    ).df()
    expect = dict(zip(ref["id"], ref["lag"]))
    for parts in (1, 13):  # 13 blocks force many straddling group runs
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=9)).repartition(parts)
        out = rel.lag_per_group(ds, "g", ["o", "id"], "v").to_pandas()
        got = dict(zip(out["id"], out["lag"]))
        assert set(got) == set(expect)
        for k in expect:
            if pd.isna(expect[k]):
                assert pd.isna(got[k]), f"id={k} parts={parts}"
            else:
                assert got[k] == expect[k], f"id={k} parts={parts}"


def test_langs_concat_ordered_and_layout_invariant():
    """Ordered list aggregation: sorted, deduplicated, comma-joined per
    group — identical across block layouts."""
    import tempfile

    df = pd.DataFrame(
        {
            "doc_id": range(60),
            "text": ["x"] * 60,
            "lang": ["zh", "en", "en", "de"] * 15,
            "source": [f"s{i % 3}" for i in range(60)],
            "n_chars": [1] * 60,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(f"{d}/documents.parquet")
        from scheduler_ray.pipelines import queries as q

        out = q.q_doc_langs_concat(d).to_pandas().sort_values("source")
        # s0 sees zh,en (positions 0,1 mod 4 → doc 0:zh,1:en,... across 3 sources)
        got = dict(zip(out["source"], out["langs"]))
        import duckdb

        ref = duckdb.sql(
            "SELECT source, string_agg(lang, ',' ORDER BY lang) AS langs "
            "FROM (SELECT DISTINCT source, lang FROM df) GROUP BY source"
        ).df()
        assert got == dict(zip(ref["source"], ref["langs"]))
