from __future__ import annotations

from pyspark.sql import functions as F

from fast_duplicate_finder_spark.config import PipelineConfig
from fast_duplicate_finder_spark.corpus import generate_transcripts
from fast_duplicate_finder_spark.operators.exact_cascade import run_exact_cascade
from fast_duplicate_finder_spark.sources.transcripts import (
    assemble_conversations,
    conv_stats,
)

from tests.oracle import assemble_locally, exact_clusters_oracle

CFG = PipelineConfig()


def _rows(spark, n=200):
    df = generate_transcripts(spark, n_convs=n, seed=42)
    return df, df.collect()


def test_assembly_matches_local_oracle_and_is_order_stable(spark):
    df, rows = _rows(spark, 100)
    local = assemble_locally([tuple(r) for r in rows])
    assembled = {
        r["conv_id"]: r["doc"] for r in assemble_conversations(df).collect()
    }
    assert assembled == local
    # physical-order scramble invariance: corpus already shuffles rows, but
    # force a different order and repartitioning too
    df2 = df.orderBy(F.desc("text")).repartition(7)
    assembled2 = {
        r["conv_id"]: r["doc"] for r in assemble_conversations(df2).collect()
    }
    assert assembled2 == local


def test_conv_stats_size_equals_doc_length(spark):
    df, _ = _rows(spark, 60)
    stats = {r["conv_id"]: (r["size"], r["n_turns"]) for r in conv_stats(df).collect()}
    docs = {r["conv_id"]: r["doc"] for r in assemble_conversations(df).collect()}
    for cid, doc in docs.items():
        assert stats[cid][0] == len(doc)


def test_exact_clusters_match_bruteforce(spark):
    df, rows = _rows(spark, 200)
    local_docs = assemble_locally([tuple(r) for r in rows])
    expected = exact_clusters_oracle(local_docs)
    out = run_exact_cascade(df, CFG)["clusters"].collect()
    got = {r["conv_id"]: r["cluster_id"] for r in out}
    assert got == expected
    # planted blocks contain pairs and triples (near-dup copies with zero
    # realized edits may enlarge a cluster, so sizes are >= planted)
    sizes = {r["cluster_id"]: r["cluster_size"] for r in out}
    assert min(sizes.values()) >= 2
    assert 2 in sizes.values() and 3 in sizes.values()


def test_cascade_stages_only_shrink(spark):
    df, _ = _rows(spark, 200)
    res = run_exact_cascade(df, CFG)
    n1 = res["p1"].count()
    n2 = res["p2"].count()
    n3 = res["p3"].count()
    assert n1 >= n2 >= n3 > 0


def test_empty_and_singleton(spark):
    from fast_duplicate_finder_spark.corpus import TRANSCRIPT_SCHEMA
    import datetime as dt

    ts = dt.datetime(2020, 1, 1)
    rows = [
        ("a", 0, "user", "", "", ts),          # empty text, singleton conv
        ("b", 0, "user", "hello", "", ts),     # singleton
        ("c", 0, "user", "same text", "", ts),
        ("d", 0, "user", "same text", "", ts),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    out = run_exact_cascade(df, CFG)["clusters"].collect()
    got = {r["conv_id"]: r["cluster_id"] for r in out}
    assert got == {"c": "c", "d": "c"}
