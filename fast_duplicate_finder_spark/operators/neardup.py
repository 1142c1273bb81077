"""Near-duplicate cascade: MinHash/LSH + SimHash + shared-span -> verified
pairs -> connected components -> clusters.

This is the generalization layer BASELINE.json's north_star adds on top of
the reference's exact cascade. All legs share the JVM-computed shingle-hash
sets; Python appears only in the two Arrow kernels (MinHash perms, SimHash
votes) and the per-pair span matcher.

Pair kinds (expected_near_pairs fixture): exact | minhash | simhash | span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fast_duplicate_finder_spark.config import PipelineConfig
from fast_duplicate_finder_spark.functions.minhash import make_minhash_udf
from fast_duplicate_finder_spark.functions.shingles import (
    kgram_hash_sequence,
    shingle_hashes,
    winnow_fingerprints,
)
from fast_duplicate_finder_spark.functions.simhash import (
    simhash_candidate_pairs,
    simhash_udf,
)
from fast_duplicate_finder_spark.operators.connected_components import (
    connected_components,
)
from fast_duplicate_finder_spark.operators.lsh import (
    candidate_pairs,
    fingerprint_candidate_pairs,
    lsh_band_rows,
)
from fast_duplicate_finder_spark.operators.verify import (
    attach_pair_payload,
    verify_jaccard,
    verify_shared_span,
)


def shingle_features(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(conv_id, shset, grams) — one pass over documents; reused by every
    near-dup leg. Checkpoint this in the pipeline: documents are never
    re-read afterwards."""
    return docs.select(
        "conv_id",
        shingle_hashes(F.col("doc"), cfg.shingle_k).alias("shset"),
        kgram_hash_sequence(F.col("doc"), cfg.shingle_k).alias("grams"),
    )


def minhash_pairs(
    features: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """MinHash/LSH candidates verified by exact Jaccard >= tau."""
    mh = make_minhash_udf(cfg.lsh_perms_used, cfg.minhash_seed)
    sigs = features.select("conv_id", mh("shset").alias("minhash"))
    bands = lsh_band_rows(sigs, cfg)
    cands, overflow = candidate_pairs(bands, cfg)
    verified = verify_jaccard(
        cands, features.select("conv_id", "shset"), cfg.jaccard_tau
    )
    return verified, overflow


def simhash_pairs(features: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """SimHash fuzz pass: Hamming <= h (exact by construction)."""
    sims = features.select("conv_id", simhash_udf("shset").alias("simhash"))
    # empty docs share simhash 0; drop them (an empty doc is not a fuzz
    # match of another empty doc in any useful sense; exact cascade owns it)
    sims = sims.join(
        features.filter(F.size("shset") > 0).select("conv_id"), "conv_id"
    )
    return simhash_candidate_pairs(sims, cfg.simhash_hamming)


def span_pairs(
    features: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """Shared-span pass: winnowing fingerprints -> candidates -> exact
    longest-common-run verification. Deterministic recall for spans >=
    winnow window + k - 1 == span_min_tokens."""
    window = max(cfg.span_min_tokens - cfg.shingle_k + 1, 1)
    fps = features.select(
        "conv_id",
        F.explode(winnow_fingerprints(F.col("grams"), window)).alias("fp"),
    )
    cands, overflow = fingerprint_candidate_pairs(fps, cfg)
    with_grams = attach_pair_payload(
        cands, features.select("conv_id", "grams"), "grams"
    )
    verified = verify_shared_span(with_grams, cfg)
    return verified, overflow


def exact_pairs_from_clusters(exact_clusters: DataFrame) -> DataFrame:
    """Star edges (member -> cluster_id) are enough for CC; no quadratic
    within-cluster pair expansion."""
    return (
        exact_clusters.filter(F.col("conv_id") != F.col("cluster_id"))
        .select(
            F.col("cluster_id").alias("conv_id_a"),
            F.col("conv_id").alias("conv_id_b"),
        )
        .distinct()
    )


def run_near_dup(
    docs: DataFrame, exact_clusters: DataFrame | None, cfg: PipelineConfig
) -> dict[str, DataFrame]:
    features = shingle_features(docs, cfg).localCheckpoint(eager=False)
    mh_pairs, mh_overflow = minhash_pairs(features, cfg)
    sh_pairs = simhash_pairs(features, cfg)
    sp_pairs, sp_overflow = span_pairs(features, cfg)

    tagged = (
        mh_pairs.select("conv_id_a", "conv_id_b", F.lit("minhash").alias("kind"))
        .union(
            sh_pairs.select(
                "conv_id_a", "conv_id_b", F.lit("simhash").alias("kind")
            )
        )
        .union(
            sp_pairs.select(
                "conv_id_a", "conv_id_b", F.lit("span").alias("kind")
            )
        )
    )
    if exact_clusters is not None:
        tagged = tagged.union(
            exact_pairs_from_clusters(exact_clusters).select(
                "conv_id_a", "conv_id_b", F.lit("exact").alias("kind")
            )
        )
    # cluster membership ignores kind; keep kinds for the pair report
    cluster_edges = tagged.select("conv_id_a", "conv_id_b").distinct()
    clusters = connected_components(cluster_edges)
    return {
        "pairs": tagged,
        "clusters": clusters,
        "lsh_overflow": mh_overflow,
        "span_overflow": sp_overflow,
    }
