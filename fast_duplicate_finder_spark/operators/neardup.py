"""Near-duplicate cascade: MinHash/LSH + SimHash + shared-span -> verified
pairs -> connected components -> clusters.

This is the generalization layer BASELINE.json's north_star adds on top of
the reference's exact cascade. All legs share the JVM-computed shingle-hash
sets; Python appears only in the two Arrow kernels (MinHash perms, SimHash
votes) and the per-pair span matcher.

Pair kinds (expected_near_pairs fixture): exact | minhash | simhash | span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fast_duplicate_finder_spark.config import PipelineConfig
from fast_duplicate_finder_spark.functions.minhash import make_minhash_udf
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
from fast_duplicate_finder_spark.operators.verify import verify_jaccard


def _repartition_even(df: DataFrame, even: bool = True) -> DataFrame:
    """conv_id hash exchange with an EXPLICIT partition count (the session's
    shuffle.partitions — the same number the bare form starts from).

    ``repartition("conv_id")`` without a count lets AQE re-coalesce the
    exchange toward advisoryPartitionSizeInBytes — balancing BYTES. The
    stages fed by this exchange (posexplode + lead-window + collect_list,
    then the Arrow signature kernels) cost ~20x CPU per input byte, so a
    byte-targeted merge breaks WAVE balance: measured on the 5.2M-turn
    ladder corpus at local-cluster[8,1,10240], AQE merged 16 even buckets
    into 14 (two double-width), making the stage's max task ~2x its median
    (38-58 s vs 17-28 s) — a ~25 s one-straggler tail with 7 of 8 cores
    idle, HALF the phase's scaling loss (BENCH/ladder_r4_subknee.json,
    scripts/p6_probe.py). An explicit count is never AQE-coalesced, so the
    16 hash buckets stay even (1.01 max/avg byte ratio) and the waves stay
    full. Skew handling is unaffected: AQE skew-join operates on join
    exchanges, not this one.

    ``even=False`` keeps the bare form: the wave-balance argument only
    holds for corpus-sized inputs. A streaming micro-batch is tiny, and
    pinning shuffle.partitions near-empty tasks onto every checkpointed
    frame of every trigger is pure scheduling overhead — there AQE's
    coalesce-to-few is exactly right."""
    if not even:
        return df.repartition("conv_id")
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, "conv_id")


def shingle_features(
    docs: DataFrame, cfg: PipelineConfig, even_exchange: bool = True
) -> DataFrame:
    """(conv_id, shset, grams) — one pass over documents; reused by every
    near-dup leg. Checkpoint this in the pipeline: documents are never
    re-read afterwards.

    Computed via posexplode + lead-window + groupBy instead of the nested
    higher-order functions in functions/shingles.py: HOF ``transform(
    sequence, i -> xxhash64(array_join(slice(...))))`` is interpreted
    per-element with an array allocation per position and was the
    non-scaling hot spot of the whole pipeline (p6 ~flat from 8 to 32
    cores); the row formulation is whole-stage-codegen'd end to end.
    Semantics are identical except shset's (irrelevant) element order:
    * shset — distinct k-shingle hashes, sorted; 0 < n_words < k degrades
      to one whole-doc shingle (functions/shingles.word_shingles parity);
    * grams — positional (non-distinct) k-gram hashes in token order.
    """
    from fast_duplicate_finder_spark.functions.shingles import words

    k = cfg.shingle_k
    w = words(F.col("doc"))
    # ONE doc-granularity exchange up front: hash-partitioning the doc rows
    # by conv_id makes the exploded token rows inherit that partitioning
    # (Generate preserves child partitioning), so the lead-window, the
    # collect_list aggregation AND the final rejoin are all exchange-free —
    # round 1 instead shuffled TOKEN rows (~3-5x corpus bytes of row
    # overhead) for the window and again for the agg, the plan's dominant
    # exchange at 10^12 turns.
    base = _repartition_even(
        docs.select(
            "conv_id",
            F.size(w).alias("n_words"),
            F.xxhash64(F.array_join(w, " ")).alias("whole_hash"),
            F.col("doc"),
        ),
        even=even_exchange,
    )
    toks = base.select(
        "conv_id", "n_words", F.posexplode(words(F.col("doc"))).alias("pos", "tok")
    )
    w_ord = Window.partitionBy("conv_id").orderBy("pos")
    leads = [F.lead("tok", i).over(w_ord) for i in range(1, k)]
    valid = leads[-1].isNotNull() if k > 1 else F.lit(True)
    g = toks.withColumn(
        "gh",
        F.when(valid, F.xxhash64(F.concat_ws(" ", F.col("tok"), *leads))),
    )
    agg = g.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("gh").isNotNull(), F.struct("pos", "gh"))
                )
            ),
            lambda s: s.getField("gh"),
        ).alias("grams"),
        F.array_sort(F.collect_set("gh")).alias("shset0"),
    )
    out = base.join(agg, "conv_id", "left").select(
        "conv_id",
        F.when(
            F.col("n_words") >= k, F.coalesce("shset0", F.array().cast("array<bigint>"))
        )
        .when(F.col("n_words") > 0, F.array(F.col("whole_hash")))
        .otherwise(F.array().cast("array<bigint>"))
        .alias("shset"),
        F.coalesce("grams", F.array().cast("array<bigint>")).alias("grams"),
    )
    return out


def near_dup_features(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """(conv_id, shset, minhash, simhash, sgs) — EVERY near-dup leg's
    features in the ONE conv_id-partitioned pass.

    Round 2 checkpointed (conv_id, shset, grams) and let each p7 leg
    derive its own structures: the span leg re-shuffled the positional
    gram arrays (the dominant table — ~70% of checkpoint bytes) through a
    fresh ``repartition(conv_id)`` + window, and the minhash/simhash legs
    re-ran their Arrow kernels and re-materialized signatures per leg.
    Profiled at 5.2M turns / 8 executors, re-serializing the gram arrays
    through that exchange was the single largest stage of the span leg
    (~27 s/task x 35 tasks map-side).

    Here the token-granularity data is consumed WHERE IT ALREADY LIVES:
    everything is ONE projection over shingle_features' output (still
    hash-partitioned by conv_id for the bucketed checkpoint write) —
    supershingles via a per-doc higher-order transform and both Arrow
    signature kernels, so ``grams`` never leaves this operator and no
    row of it is exploded, sorted or joined back. (The round-3a form
    posexploded ~10 gram rows per turn through a ``window``-wide
    collect_list frame — materializing window x |grams| array elements —
    then re-joined per doc; the HOF form measured 1.4x faster on the
    isolated leg and removes the join entirely.) The p7 legs then
    shuffle only signatures and band keys — bytes per doc, not bytes
    per token. (Reference analogue: the cascade hands PHASE SUMMARIES
    between phases, never re-derives file contents — phase_2.go:15-40.)
    """
    mh = make_minhash_udf(cfg.lsh_perms_used, cfg.minhash_seed)
    window = max(cfg.span_min_tokens - cfg.shingle_k + 1, 1)
    feats = shingle_features(docs, cfg)
    # Measured dead end (5.2M turns, local[8]): fusing all three
    # signatures into ONE struct-returning Arrow kernel (rolling-hash
    # supershingles in numpy, shset+grams serialized once) changed
    # nothing (84.1 s vs 84.7 s for the phase) — the sgs HOF runs
    # JVM-side CONCURRENTLY with the Python kernel evaluation, so the
    # phase is max(JVM, Python), not their sum, and shipping the wide
    # grams column across Arrow ate exactly what the cheaper rolling
    # hash saved. Expression-level isolation (26.8 s HOF vs ~10 s
    # kernel) is NOT phase-level wall when the engine overlaps them.
    return feats.select(
        "conv_id",
        "shset",
        mh("shset").alias("minhash"),
        simhash_udf("shset").alias("simhash"),
        _supershingle_set(F.col("grams"), window).alias("sgs"),
    )


def minhash_pairs(
    features: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """MinHash/LSH candidates verified by exact Jaccard >= tau.

    ``features`` with a precomputed ``minhash`` column (near_dup_features
    checkpoint) skips signing entirely; otherwise signatures are computed
    here from ``shset`` (the standalone-query path)."""
    # empty shingle sets are dropped BEFORE banding (like the simhash leg):
    # every empty doc gets the identical all-zero signature, so they would
    # all collide in every band and then "verify" at jaccard 1.0 through
    # the expensive path — the exact cascade owns verbatim-empty dups.
    if "minhash" in features.columns:
        # recompute = re-read of the checkpoint table: no eager copy needed
        sigs = features.filter(F.size("shset") > 0).select(
            "conv_id", "minhash"
        )
    else:
        mh = make_minhash_udf(cfg.lsh_perms_used, cfg.minhash_seed)
        # eager: the band self-join + bucket-size window would otherwise
        # re-evaluate the Arrow kernel once per probe side
        sigs = (
            features.filter(F.size("shset") > 0)
            .select("conv_id", mh("shset").alias("minhash"))
            .localCheckpoint(eager=True)
        )
    bands = lsh_band_rows(sigs, cfg)
    cands, overflow = candidate_pairs(bands, cfg)
    verified = verify_jaccard(
        cands, features.select("conv_id", "shset"), cfg.jaccard_tau
    )
    return verified, overflow


def simhash_pairs(
    features: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """SimHash fuzz pass: Hamming <= h (exact by construction). Returns
    (pairs, overflow) — capped hot chunk buckets are counted like the LSH
    band buckets, never silently dropped. A precomputed ``simhash`` column
    (near_dup_features checkpoint) skips the Arrow kernel."""
    # empty docs share simhash 0; drop them (an empty doc is not a fuzz
    # match of another empty doc in any useful sense; exact cascade owns it).
    if "simhash" in features.columns:
        sims = features.filter(F.size("shset") > 0).select(
            "conv_id", "simhash"
        )
    else:
        # eager: the pigeonhole self-join would re-run the kernel per side.
        sims = (
            features.filter(F.size("shset") > 0)
            .select("conv_id", simhash_udf("shset").alias("simhash"))
            .localCheckpoint(eager=True)
        )
    return simhash_candidate_pairs(
        sims,
        cfg.simhash_hamming,
        max_bucket=cfg.max_band_bucket,
        n_salt=cfg.band_salt_buckets,
    )


def winnow_fingerprint_rows(features: DataFrame, window: int) -> DataFrame:
    """(conv_id, fp) distinct winnowing fingerprints via window functions.

    Same fingerprint set as functions/shingles.winnow_fingerprints (the
    readable HOF spec, kept as the differential-parity oracle in
    tests/test_shingle_parity.py) but codegen'd O(n) instead of an
    interpreted O(n*window) HOF — sliding-window min over posexploded gram
    hashes. Eager-checkpointed by the caller when it feeds a self-join.

    The gram-array rows are repartitioned by conv_id BEFORE posexplode so
    the per-doc windows and the distinct run without a gram-granularity
    exchange (same one-exchange-up-front shape as shingle_features)."""
    g = _repartition_even(features.select("conv_id", "grams")).select(
        "conv_id", F.posexplode("grams").alias("pos", "gh")
    )
    w_frame = (
        Window.partitionBy("conv_id").orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    w_doc = Window.partitionBy("conv_id")
    return (
        g.withColumn("wmin", F.min("gh").over(w_frame))
        .withColumn("ng", F.count("*").over(w_doc))
        .withColumn("full_min", F.min("gh").over(w_doc))
        .withColumn(
            "fp",
            F.when(F.col("ng") >= window, F.col("wmin")).otherwise(
                F.col("full_min")
            ),
        )
        .filter(
            (F.col("pos") <= F.col("ng") - window) | (F.col("ng") < window)
        )
        .select("conv_id", "fp")
        .distinct()
    )


def _supershingle_set(grams, window: int):
    """Column expression: per-doc DISTINCT anchored supershingles —
    xxhash64 over every consecutive run of ``window`` k-gram hashes (== a
    span of window + k - 1 tokens) — computed with per-doc higher-order
    functions: no explode, no window sort, no re-join. Guarded for short
    docs: ``sequence(0, size - window)`` DESCENDS when size < window, so
    they must yield an empty array, not inverted indices."""
    sgs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(grams) - window),
            lambda i: F.xxhash64(F.slice(grams, i + 1, window)),
        )
    )
    return F.when(F.size(grams) >= window, sgs).otherwise(
        F.array().cast("array<bigint>")
    )


def supershingle_rows(features: DataFrame, window: int) -> DataFrame:
    """(conv_id, sg) distinct anchored supershingle rows.

    Two documents share a token span of >= window + k - 1 tokens IFF they
    share at least one supershingle (modulo 64-bit hash collision) — the
    span membership test becomes an exact equi-join, no per-pair
    verification at all. Per-doc distinctness comes from array_distinct
    inside ``_supershingle_set``; explode of the empty array drops
    too-short docs (shorter docs cannot contain the span).
    """
    return features.select(
        "conv_id",
        F.explode(
            _supershingle_set(F.col("grams"), window)
        ).alias("sg"),
    )


def span_pairs(
    features: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame]:
    """Shared-span pass: anchored supershingle equi-join — EXACT span
    membership (pair qualifies iff a >= span_min_tokens contiguous token
    span is shared), entirely JVM-side.

    Round 1 generated candidates from winnowing fingerprints and verified
    each with a difflib Arrow kernel; at 5M turns the 200-word synthetic
    vocabulary made fingerprints collide so heavily that 30M candidate
    pairs reached Python (~12,000 core-seconds — 70% of pipeline wall,
    zero scaling). The supershingle join needs no verify step: candidates
    ARE verified pairs. ``span_tokens`` = shared DISTINCT supershingles +
    window + k - 2 — equal to difflib's longest-common-run length for a
    single shared span of non-repeating windows, above it (total shared
    content) when a pair shares several disjoint spans, and BELOW it when
    a shared span internally repeats identical windows (a run of repeated
    tokens collapses to one distinct supershingle): a span-length
    estimate, exact in the common case. When the exact longest run
    matters, queries.q_span_longest_run keeps supershingle POSITIONS and
    takes the max consecutive run per (pair, diagonal), which equals
    difflib's longest matching block in all three cases (pinned by
    tests/test_span_exact.py::test_longest_run_matches_difflib_planted).
    Pair MEMBERSHIP is exact always
    (>= 1 shared supershingle iff a >= span_min_tokens span is shared,
    modulo 64-bit collisions). The winnowing operators remain as the
    candidate-generation path for sub-span similarity (and the
    winnow_span_candidates oracle query); the difflib kernel remains as
    the differential-parity oracle (tests/test_span_exact.py).

    Returns (pairs, overflow): hot supershingle buckets (corpus
    boilerplate >= cfg.max_band_bucket docs) are capped and counted like
    every other candidate join. A precomputed ``sgs`` array column
    (near_dup_features checkpoint) skips the gram re-shuffle + window
    entirely — the round-2 plan re-serialized the full positional gram
    arrays through a fresh exchange per run, the span leg's largest stage.
    """
    from fast_duplicate_finder_spark.operators.lsh import capped_pairs

    window = max(cfg.span_min_tokens - cfg.shingle_k + 1, 1)
    if "sgs" in features.columns:
        # recompute = checkpoint re-read + explode: cheap on both probe sides
        sgs = features.select("conv_id", F.explode("sgs").alias("sg"))
    else:
        sgs = supershingle_rows(features, window).localCheckpoint(
            eager=True
        )  # feeds the bucket-size window plus both sides of the self-join
    # the shared capped + salted generator (one row per shared
    # supershingle, dedupe=False — each occurrence emitted exactly once,
    # so the count IS the shared-sg count); previously a plain self-join
    # put a hot-yet-under-cap sg bucket on a single reducer
    matches, overflow = capped_pairs(
        sgs,
        ["sg"],
        cfg.max_band_bucket,
        cfg.band_salt_buckets,
        dedupe=False,
    )
    verified = matches.groupBy("conv_id_a", "conv_id_b").agg(
        (F.count("*") + window + cfg.shingle_k - 2)
        .cast("int")
        .alias("span_tokens")
    )
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
    features = near_dup_features(docs, cfg).localCheckpoint(eager=True)
    mh_pairs, mh_overflow = minhash_pairs(features, cfg)
    sh_pairs, sh_overflow = simhash_pairs(features, cfg)
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
        "simhash_overflow": sh_overflow,
        "span_overflow": sp_overflow,
    }
