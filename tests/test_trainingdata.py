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
