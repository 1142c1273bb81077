"""Differential parity: the readable HOF formulations in
functions/shingles.py are the executable SPEC for the codegen'd
window-function formulations that actually run in the pipeline
(operators/neardup.shingle_features / winnow_fingerprint_rows — the HOFs
are interpreted per-element and were the measured non-scaling hot spot).
Any divergence between spec and production formulation fails here."""

from __future__ import annotations

from pyspark.sql import functions as F

from fast_duplicate_finder_spark.config import PipelineConfig
from fast_duplicate_finder_spark.corpus import generate_transcripts
from fast_duplicate_finder_spark.functions.shingles import (
    kgram_hash_sequence,
    shingle_hashes,
    winnow_fingerprints,
)
from fast_duplicate_finder_spark.operators.neardup import (
    shingle_features,
    winnow_fingerprint_rows,
)
from fast_duplicate_finder_spark.sources.transcripts import (
    assemble_conversations,
)

CFG = PipelineConfig()


def _docs(spark):
    t = generate_transcripts(spark, n_convs=120, seed=5)
    docs = assemble_conversations(t)
    edge = spark.createDataFrame(
        [("e_empty", ""), ("e_one", "solo"), ("e_two", "two words"),
         ("e_exact_k", "a b c"), ("e_rep", "a a a a a a")],
        "conv_id string, doc string",
    )
    return docs.select("conv_id", "doc").unionByName(edge)


def test_shingle_features_match_hof_spec(spark):
    docs = _docs(spark)
    k = CFG.shingle_k
    spec = docs.select(
        "conv_id",
        F.array_sort(F.array_distinct(shingle_hashes(F.col("doc"), k))).alias(
            "shset_spec"
        ),
        kgram_hash_sequence(F.col("doc"), k).alias("grams_spec"),
    )
    prod = shingle_features(docs, CFG)
    joined = prod.join(spec, "conv_id").collect()
    assert len(joined) == docs.count()
    for r in joined:
        assert r["grams"] == r["grams_spec"], r["conv_id"]
        assert sorted(r["shset"]) == list(r["shset_spec"]), r["conv_id"]


def test_winnow_rows_match_hof_spec(spark):
    docs = _docs(spark)
    k = CFG.shingle_k
    window = max(CFG.span_min_tokens - k + 1, 1)
    spec_rows = docs.select(
        "conv_id",
        F.explode(
            winnow_fingerprints(kgram_hash_sequence(F.col("doc"), k), window)
        ).alias("fp"),
    )
    spec = {
        (r["conv_id"], r["fp"]) for r in spec_rows.collect()
    }
    prod = {
        (r["conv_id"], r["fp"])
        for r in winnow_fingerprint_rows(
            shingle_features(docs, CFG), window
        ).collect()
    }
    assert prod == spec
