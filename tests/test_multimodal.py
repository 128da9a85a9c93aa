"""Multimodal binary-column plumbing: schema, Arrow batch shape, row
expansion, the real PGM/WAV/AVI container round-trips, and determinism
of the fallback fake-decode path for unparseable foreign blobs."""

import os

import pytest
from pyspark.sql import functions as F

from postgraph_spark.operators import multimodal as MM
from postgraph_spark.sources.relational import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def media(spark):
    return MM.documents_as_media(load_table(spark, "documents", SF_DIR)).cache()


def test_media_schema_and_modalities(spark, media):
    assert [f.name for f in media.schema.fields] == ["media_id", "modality", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    mods = {r.modality for r in media.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}
    # meta typing: images carry width/height, audio sample_rate, video n_frames
    img = media.filter(F.col("modality") == "image").select("meta.*").first()
    assert img.width is not None and img.sample_rate is None
    vid = media.filter(F.col("modality") == "video").select("meta.*").first()
    assert vid.n_frames is not None and vid.width is None


def test_payload_never_decoded_for_stats(spark, media):
    """media_stats must be pure JVM expressions: no Python UDF / Arrow
    stage in the plan (blob stats at 100 TB cannot cross into Python)."""
    plan = MM.media_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    row = MM.media_stats(media).filter(F.col("modality") == "image").first()
    assert row.n_items > 0 and row.total_bytes > 0


def test_decode_deterministic_and_complete(spark, media):
    out1 = MM.decode_media(media, n_features=8)
    assert out1.columns == ["media_id", "modality", "features", "decode_ok"]
    rows = {r.media_id: r for r in out1.collect()}
    assert len(rows) == media.count()  # 1 row out per row in
    # raw (un-containered) payloads parse as nothing -> honest fallback
    assert all(not r.decode_ok for r in rows.values())
    assert all(len(r.features) == 8 for r in rows.values())
    # deterministic across runs (fake decode is a pure function of bytes)
    rows2 = {r.media_id: r for r in MM.decode_media(media, n_features=8).collect()}
    assert all(rows[k].features == rows2[k].features for k in rows)


def test_frame_sample_expansion(spark, media):
    frames = MM.sample_frames(media, max_frames=4)
    per = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    n_videos = media.filter(F.col("modality") == "video").count()
    assert len(per) == n_videos
    assert all(1 <= r.n <= 4 for r in per)
    # frame bytes are slices of the payload
    one = frames.join(media.select("media_id", "payload"), "media_id").first()
    assert bytes(one.frame_payload) in bytes(one.payload)


def test_resize_stub_contract(spark, media):
    out = MM.resize_images(media, width=64, height=48)
    rows = out.collect()
    assert len(rows) == media.filter(F.col("modality") == "image").count()
    assert all(r.width == 64 and r.height == 48 and not r.resized for r in rows)


# -------------------------------------- real PGM / WAV / AVI containers


def test_pgm_roundtrip_bytes():
    for raw in [b"", b"x", b"hello world" * 10, bytes(range(256))]:
        assert MM.pgm_decode(MM.pgm_encode(raw)) == raw


def test_pgm_parses_foreign_writer():
    # a 2x2 grayscale PGM written by hand, with a comment line
    data = b"P5\n# made elsewhere\n2 2\n255\n\x00\x7f\xff\x10"
    assert MM.pgm_decode(data) == b"\x00\x7f\xff\x10"
    assert MM.pgm_decode(b"P6\n1 1\n255\nxxx") is None  # not P5
    assert MM.pgm_decode(b"P5\n4 4\n255\nshort") is None  # truncated


def test_wav_roundtrip_bytes():
    for raw in [b"", b"a", b"pcm samples" * 33]:
        enc = MM.wav_encode(raw)
        assert enc[:4] == b"RIFF" and enc[8:12] == b"WAVE"
        assert len(enc) == 44 + len(raw)
        assert MM.wav_decode(enc) == raw


def test_wav_decode_skips_extra_chunks():
    import struct

    raw = b"\x01\x02\x03"
    enc = MM.wav_encode(raw)
    # splice a LIST chunk between fmt and data (word-aligned odd size)
    head, data_chunk = enc[:36], enc[36:]
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    assert MM.wav_decode(head + extra + data_chunk) == raw
    assert MM.wav_decode(b"RIFX" + enc[4:]) is None


def test_avi_roundtrip_bytes():
    for raw, n in [(b"", 3), (b"x", 1), (b"frame bytes " * 40, 24),
                   (bytes(range(256)), 7)]:
        enc = MM.avi_encode(raw, n)
        assert enc[:4] == b"RIFF" and enc[8:12] == b"AVI "
        assert MM.avi_decode(enc) == raw


def test_avi_decode_walks_foreign_chunks():
    import struct

    enc = MM.avi_encode(b"payload", 2)
    junk = b"JUNK" + struct.pack("<I", 5) + b"zzzzz" + b"\x00"  # word-aligned
    spliced = enc[:12] + junk + enc[12:]
    assert MM.avi_decode(spliced) == b"payload"
    assert MM.avi_decode(b"RIFF\x04\x00\x00\x00WAVE") is None  # not AVI
    # truncated movi chunk -> refuse, don't mis-decode
    cut = enc[: len(enc) - 3]
    assert MM.avi_decode(cut) is None


def test_encode_containers_and_real_decode(spark, media):
    enc = MM.encode_containers(media)
    out = {r.media_id: r for r in MM.decode_media(enc, n_features=8).collect()}
    raw = {r.media_id: r for r in MM.decode_media(media, n_features=8).collect()}
    assert set(out) == set(raw)
    for mid, r in out.items():
        # every modality's container really decodes, and the features
        # computed from the decoded bytes == those from the original
        # payload bytes (the containers round-trip exactly)
        assert r.decode_ok, mid
        assert r.features == raw[mid].features, mid


def test_frame_sample_oracle_byte_exact_non_ascii(spark, tmp_path):
    """Round-10 review finding: the old oracle sliced CHARACTERS while
    the demuxer slices BYTES, diverging on any multi-byte utf-8 video
    text. Both sides are byte-based now — pin with a corpus where char
    and byte lengths differ and frame boundaries split multi-byte
    characters."""
    import duckdb

    from postgraph_spark.queries import ORACLES, QUERIES

    rows = [
        (2, "café naïve 中文文本 " * 9, "fr", "s", 1),
        (5, "ümläut ß straße " * 11, "de", "s", 1),
        (8, "plain ascii text here " * 7, "en", "s", 1),
        (11, "", "en", "s", 0),  # empty video: demuxer emits nothing
        (1, "not a video row éé", "fr", "s", 1),
        (3, "an image row with ümläuts", "de", "s", 1),
        (9, "another image row 中文", "zh", "s", 1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    try:
        for name in ("multimodal_frame_sample", "multimodal_resize"):
            srows = sorted(map(tuple, QUERIES[name](spark, sf).collect()))
            orows = sorted(map(tuple, con.execute(ORACLES[name]).fetchall()))
            assert srows == orows, (name, srows[:3], orows[:3])
            assert srows, name  # non-vacuous
    finally:
        con.close()
