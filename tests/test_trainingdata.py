"""Training-data operators: multimodal binary plumbing, frame sampling,
payload dedup keys, and the new query/oracle entries' invariants that the
DuckDB comparison can't see (schema details, broadcast plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fast_duplicate_finder_spark.functions.multimodal import (
    decode_stub,
    extract_media_meta,
    frame_sample_indices,
    payload_dedup_keys,
)


def _media_df(spark):
    rows = [
        (1, b"\x00\x01\x02hello-binary-payload", "image"),
        (2, b"", "audio"),
        (3, None, "video"),
        (4, bytes(range(256)) * 3, "image"),
    ]
    return spark.createDataFrame(
        rows, "id bigint, payload binary, media_type string"
    )


def test_extract_media_meta_roundtrip(spark):
    df = _media_df(spark)
    meta = {r["id"]: r.asDict() for r in extract_media_meta(df).collect()}
    assert set(meta) == {1, 2, 3, 4}
    raw = {1: b"\x00\x01\x02hello-binary-payload", 2: b"", 3: b"",
           4: bytes(range(256)) * 3}
    for i, payload in raw.items():
        expected = decode_stub(payload)
        for k, v in expected.items():
            assert meta[i][k] == v, (i, k)
    # empty/null payloads produce the degenerate-but-typed row, not an error
    assert meta[2]["n_bytes"] == 0 and meta[3]["n_bytes"] == 0


def test_extract_media_meta_is_narrow(spark):
    """The metadata kernel must not shuffle: payload bytes stay put."""
    plan = extract_media_meta(_media_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_frame_sample_indices(spark):
    meta = extract_media_meta(_media_df(spark))
    frames = frame_sample_indices(meta, every_nth=4)
    got = (
        frames.groupBy("id").agg(F.count("*").alias("n")).collect()
    )
    n_frames = {r["id"]: r["n_frames"] for r in meta.collect()}
    for r in got:
        expected = (n_frames[r["id"]] + 3) // 4
        assert r["n"] == expected


def test_payload_dedup_keys_find_binary_copies(spark):
    rows = [
        (1, b"same-bytes"), (2, b"same-bytes"), (3, b"other-bytes"),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    keys = payload_dedup_keys(df)
    groups = (
        keys.groupBy("payload_hash", "n_bytes")
        .agg(F.count("*").alias("n"), F.min("id").alias("first"))
        .filter(F.col("n") >= 2)
        .collect()
    )
    assert len(groups) == 1
    assert groups[0]["n"] == 2 and groups[0]["first"] == 1


def test_lang_id_profile_join_is_broadcast(spark):
    """The 5x20-row profile must broadcast, not shuffle the token table."""
    from fast_duplicate_finder_spark.trainingdata import q_lang_id_confusion

    df = q_lang_id_confusion(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_ivf_assignment_covers_all_vectors(spark):
    from fast_duplicate_finder_spark.trainingdata import q_embedding_ivf_topk

    out = q_embedding_ivf_topk(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    # every query id gets exactly top-3 (cells at sf0.001 hold >3 vectors)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["vec_id"], []).append(r["rank"])
    assert set(by_q) == set(range(20))
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3]


def _png_bytes(w: int, h: int, body: bytes = b"") -> bytes:
    return (
        bytes.fromhex("89504E470D0A1A0A0000000D49484452")
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes.fromhex("080600000000000000")
        + body
    )


def _jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal structurally-valid JPEG prefix: SOI, APP0(JFIF), a COM
    segment (exercises the skip loop), an RST standalone marker (no length
    field), then SOF0 carrying the dimensions."""
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    com = b"\xff\xfe\x00\x07hello"
    sof0 = (
        b"\xff\xc0\x00\x11\x08"
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + com + b"\xff\x01" + sof0 + b"\xff\xd9"


def test_parse_image_headers():
    from fast_duplicate_finder_spark.functions.multimodal import (
        parse_jpeg_header,
        parse_png_header,
    )

    assert parse_png_header(_png_bytes(640, 480, b"xyz")) == (640, 480)
    assert parse_png_header(_png_bytes(70000, 1)) == (70000, 1)  # >2 bytes
    assert parse_jpeg_header(_jpeg_bytes(1920, 1080)) == (1920, 1080)
    assert parse_jpeg_header(_jpeg_bytes(1, 70)) == (1, 70)
    for bad in (
        b"",
        b"\x89PNG",                        # truncated signature
        _png_bytes(0, 10),                 # zero dimension
        b"\x89PNG\r\n\x1a\x0a" + b"\x00" * 20,  # first chunk not IHDR
        b"\xff\xd8\xff\xd9",               # SOI then EOI, no SOF
        b"\xff\xd8\xff\xda\x00\x04ab",     # SOS before any SOF
        b"\xff\xd8ab",                     # marker byte not 0xFF
        _png_bytes(5, 5)[:20],             # truncated IHDR
    ):
        assert parse_png_header(bad) is None
        assert parse_jpeg_header(bad) is None


def test_decode_media_real_dims_and_fallback(spark):
    """The default kernel parses REAL dimensions from PNG/JPEG bytes and
    falls back to the deterministic stub for unknown codecs — both paths
    through the actual mapInPandas kernel, one batch."""
    from fast_duplicate_finder_spark.functions.multimodal import (
        decode_stub,
    )

    raw = b"not-a-container-just-bytes"
    rows = [
        (1, _png_bytes(123, 45, b"body-bytes"), "image"),
        (2, _jpeg_bytes(1920, 1080), "image"),
        (3, raw, "audio"),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, payload binary, media_type string"
    )
    meta = {r["id"]: r.asDict() for r in extract_media_meta(df).collect()}
    assert (meta[1]["width"], meta[1]["height"]) == (123, 45)
    assert (meta[2]["width"], meta[2]["height"]) == (1920, 1080)
    assert meta[1]["n_frames"] == meta[2]["n_frames"] == 1
    assert meta[1]["n_bytes"] == len(rows[0][1])
    assert meta[1]["checksum"] == sum(rows[0][1][:64])
    stub = decode_stub(raw)
    assert {k: meta[3][k] for k in stub} == stub


def test_png_payload_col_roundtrip(spark):
    """The JVM-side PNG synthesis column produces bytes the Python parser
    reads back exactly — the fixture generator and the kernel agree on the
    container layout."""
    from fast_duplicate_finder_spark.functions.multimodal import (
        parse_png_header,
        png_payload_col,
    )

    df = spark.range(5).select(
        "id",
        png_payload_col(
            F.col("id") % 640 + 1, (F.col("id") * 7) % 480 + 1, F.lit(b"tt")
        ).alias("payload"),
    )
    for r in df.collect():
        i = r["id"]
        assert parse_png_header(bytes(r["payload"])) == (
            i % 640 + 1,
            (i * 7) % 480 + 1,
        )
