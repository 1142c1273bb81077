"""LSH banding + skew-aware candidate pair generation.

MinHash signatures are split into ``lsh_bands`` bands of ``lsh_rows`` rows;
each band is hashed to one 64-bit key; two conversations are candidates iff
they collide in at least one band (P[collide] = 1-(1-s^r)^b).

Scale design (north_rule: hot bands at 10^12 turns must not kill the job):
* bucket sizes are measured FIRST (one agg); buckets over
  ``cfg.max_band_bucket`` are excluded from pair generation and COUNTED —
  never silently dropped (metrics row per overflow);
* pair generation is an equi self-join on (band_id, band_hash) —
  AQE skew-join splits stragglers; the cap bounds the quadratic blowup
  (a bucket of 10^6 identical-boilerplate convs would otherwise emit
  10^12 pairs from one band);
* pairs are deduped across bands with ``distinct`` before expensive
  verification (the same true pair collides in many bands).

Capped buckets are not lost candidates in the exact-dup sense: verbatim
boilerplate groups are already found by the exact cascade; the cap only
bounds *near*-dup pair enumeration per band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fast_duplicate_finder_spark.config import PipelineConfig


def lsh_band_rows(sigs: DataFrame, cfg: PipelineConfig,
                  sig_col: str = "minhash") -> DataFrame:
    """Explode signatures to (conv_id, band_id, band_hash)."""
    r = cfg.lsh_rows
    bands = F.array(
        *[
            F.xxhash64(F.lit(b), F.slice(F.col(sig_col), b * r + 1, r))
            for b in range(cfg.lsh_bands)
        ]
    )
    return sigs.select(
        "conv_id", F.posexplode(bands).alias("band_id", "band_hash")
    )


def candidate_pairs(
    band_rows: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """-> (pairs, overflow_metrics).

    pairs: (conv_id_a, conv_id_b) distinct, a < b.
    overflow_metrics: (band_id, band_hash, bucket_n) for capped buckets.
    """
    w = Window.partitionBy("band_id", "band_hash")
    sized = band_rows.withColumn("bucket_n", F.count("*").over(w)).filter(
        F.col("bucket_n") >= 2
    )
    overflow = (
        sized.filter(F.col("bucket_n") > cfg.max_band_bucket)
        .groupBy("band_id", "band_hash")
        .agg(F.first("bucket_n").alias("bucket_n"))
    )
    ok = sized.filter(F.col("bucket_n") <= cfg.max_band_bucket).select(
        "conv_id", "band_id", "band_hash"
    )
    a = ok.alias("a")
    b = ok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.conv_id") < F.col("b.conv_id")),
        )
        .select(
            F.col("a.conv_id").alias("conv_id_a"),
            F.col("b.conv_id").alias("conv_id_b"),
        )
        .distinct()
    )
    return pairs, overflow


def fingerprint_candidate_pairs(
    fp_rows: DataFrame, cfg: PipelineConfig, key: str = "fp"
) -> tuple[DataFrame, DataFrame]:
    """Same capped self-join pattern over winnowing fingerprints
    (shared-span pass): fp_rows = (conv_id, fp)."""
    w = Window.partitionBy(key)
    sized = fp_rows.withColumn("bucket_n", F.count("*").over(w)).filter(
        F.col("bucket_n") >= 2
    )
    overflow = (
        sized.filter(F.col("bucket_n") > cfg.max_band_bucket)
        .groupBy(key)
        .agg(F.first("bucket_n").alias("bucket_n"))
    )
    ok = sized.filter(F.col("bucket_n") <= cfg.max_band_bucket)
    a = ok.alias("a")
    b = ok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.{key}") == F.col(f"b.{key}"))
            & (F.col("a.conv_id") < F.col("b.conv_id")),
        )
        .select(
            F.col("a.conv_id").alias("conv_id_a"),
            F.col("b.conv_id").alias("conv_id_b"),
        )
        .distinct()
    )
    return pairs, overflow
