"""ANN recall gates (round-5 item #4) — multi-table RHP-LSH and IVF-nprobe
against the planted-cosine-band embedding corpus.

The catalog's ANN queries are exact-verified against DuckDB oracles but
their *recall* (fraction of true near pairs surfaced) was only implicitly
1.0 on planted exact copies. These tests gate measured recall at small
scale with documented settings; scripts/ann_recall_probe.py measures the
same quantities at >=100k vectors (BENCH/ann_recall_r5.json).

Everything here is deterministic: the corpus is a pure function of
(seed, n), the hyperplanes are a pure function of the seed, so the recall
numbers are FIXED values being pinned, not flaky samples.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fast_duplicate_finder_spark.corpus import (
    EMB_BANDS,
    generate_embeddings_distributed,
    planted_neighbors,
)
from fast_duplicate_finder_spark.functions.vectors import cosine
from fast_duplicate_finder_spark.operators.ann import (
    rhp_ann_pairs,
    rhp_bucket_rows,
    rhp_planes,
)
from fast_duplicate_finder_spark.operators.kmeans import ivf_topk, kmeans_fit

N_BASE = 2000


@pytest.fixture(scope="module")
def emb(spark):
    return generate_embeddings_distributed(spark, N_BASE).localCheckpoint(
        eager=True
    )


@pytest.fixture(scope="module")
def planted(spark):
    return planted_neighbors(spark, N_BASE).localCheckpoint(eager=True)


def _lsh_recall_by_band(spark, emb, planted, n_tables, n_planes):
    pairs, _ = rhp_ann_pairs(
        emb,
        n_tables=n_tables,
        n_planes=n_planes,
        min_cos=min(EMB_BANDS) - 0.01,
        n_salt=2,
    )
    hit = pairs.select("vec_id_a", "vec_id_b").withColumn(
        "hit", F.lit(True)
    )
    rows = (
        planted.join(hit, ["vec_id_a", "vec_id_b"], "left")
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("hit").isNotNull().cast("long")).alias("n_hit"),
        )
        .collect()
    )
    return {round(r["band"], 3): r["n_hit"] / r["n"] for r in rows}


def test_generator_bands_are_exact(spark, emb, planted):
    """Realized cosine equals the planted band (orthogonalized noise mix);
    ids unique; all vectors unit-norm."""
    ea = emb.select(F.col("vec_id").alias("vec_id_a"),
                    F.col("embedding").alias("va"))
    eb = emb.select(F.col("vec_id").alias("vec_id_b"),
                    F.col("embedding").alias("vb"))
    err = (
        planted.join(ea, "vec_id_a").join(eb, "vec_id_b")
        .select(F.max(F.abs(cosine("va", "vb") - F.col("band"))).alias("e"))
        .first()["e"]
    )
    assert err < 1e-6
    assert emb.count() == emb.select("vec_id").distinct().count()
    norm_err = emb.select(
        F.max(
            F.abs(
                F.sqrt(
                    F.aggregate(
                        F.transform(
                            "embedding",
                            lambda x: x.cast("double") * x.cast("double"),
                        ),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    )
                )
                - 1.0
            )
        ).alias("e")
    ).first()["e"]
    assert norm_err < 1e-5


def test_multitable_lsh_recall_gate(spark, emb, planted):
    """DOCUMENTED SETTING: 8 tables x 8 planes recalls >= 0.95 of planted
    pairs at cosine >= 0.95 (theory: 1-(1-(1-acos(c)/pi)^8)^8 = 0.988 at
    c=0.95), and every emitted pair is cosine-verified (precision 1.0 by
    construction)."""
    recall = _lsh_recall_by_band(spark, emb, planted, n_tables=8, n_planes=8)
    for band in (0.999, 0.97, 0.95):
        assert recall[band] >= 0.95, (band, recall)
    # the 0.85 band is BELOW the documented operating point — the same
    # setting must degrade there (if it didn't, the test corpus would not
    # be exercising the recall trade at all)
    assert recall[0.85] < 0.95, recall


def test_single_table_recall_is_the_motivation(spark, emb, planted):
    """One 16-plane table (the catalog's q_embedding_ann_lsh shape) is only
    exact for IDENTICAL vectors: already at cosine 0.999 it drops ~20% of
    pairs (theory (1-acos(.999)/pi)^16 = 0.795; measured 0.845 on this
    corpus) and loses ~90% of cosine-0.9 neighbors — the measured gap that
    motivates the multi-table operator."""
    recall = _lsh_recall_by_band(spark, emb, planted, n_tables=1, n_planes=16)
    assert 0.75 <= recall[0.999] < 0.95, recall
    assert recall[0.9] < 0.5, recall


def test_bucket_cap_counts_overflow(spark):
    """A degenerate corpus (many identical vectors -> one hot bucket per
    table) trips the cap: overflow rows are COUNTED and capped buckets emit
    no pairs, same contract as the text LSH."""
    n = 64
    vec = F.array(*[F.lit(1.0 if j == 0 else 0.0) for j in range(8)])
    same = spark.range(n).select(F.col("id").alias("vec_id"),
                                 vec.alias("embedding"))
    pairs, overflow = rhp_ann_pairs(
        same, n_tables=2, n_planes=4, min_cos=0.5, dim=8, max_bucket=10,
        n_salt=2,
    )
    ov = overflow.collect()
    assert ov and all(r["bucket_n"] == n for r in ov)
    assert pairs.count() == 0


def test_salted_path_equals_plain(spark, emb, planted):
    """Two-level salting changes placement, never membership: the pair set
    at n_salt=8 equals n_salt=1."""
    kw = dict(n_tables=2, n_planes=8, min_cos=0.9)
    a, _ = rhp_ann_pairs(emb, n_salt=1, **kw)
    b, _ = rhp_ann_pairs(emb, n_salt=8, **kw)
    ra = {(r["vec_id_a"], r["vec_id_b"]) for r in a.collect()}
    rb = {(r["vec_id_a"], r["vec_id_b"]) for r in b.collect()}
    assert ra == rb and ra


def test_ivf_nprobe_recall_gate(spark, emb, planted):
    """DOCUMENTED SETTING: trained 16-cell IVF at nprobe=4 surfaces >= 0.95
    of planted partners at cosine >= 0.95 in the query's top-5 (measured
    1.0 on this corpus: 120/120); nprobe=1 must be strictly worse on the
    same pool (the Voronoi-boundary loss nprobe exists to recover —
    measured 0.958). Brute-force-top-k recall over the uniform random
    tail (cos ~0.45 'neighbors') is reported by scripts/ann_recall_probe.py
    as a curve, not gated: IVF prunes poorly on structureless data by
    design, and that tail is noise, not near-duplication."""
    centroids = kmeans_fit(emb, k=16, n_iter=3)
    pool = planted.filter(
        (F.col("vec_id_a") < 400) & (F.col("band") >= 0.95)
    )
    queries = emb.join(
        pool.select(F.col("vec_id_a").alias("vec_id")), "vec_id", "left_semi"
    )

    def recall(nprobe):
        got = ivf_topk(emb, queries, centroids, topk=5, nprobe=nprobe).select(
            F.col("vec_id").alias("vec_id_a"),
            F.col("neighbor_id").alias("vec_id_b"),
        )
        return pool.join(
            got, ["vec_id_a", "vec_id_b"], "left_semi"
        ).count() / pool.count()

    r1, r4 = recall(1), recall(4)
    assert r4 >= 0.95, (r1, r4)
    assert r4 > r1, (r1, r4)


def test_bucket_rows_shape(spark, emb):
    """(conv_id, t, bucket): one row per (vector, table), bucket within
    [0, 2^planes)."""
    planes = rhp_planes(3, 5, 64, seed=99)
    rows = rhp_bucket_rows(emb.limit(50), planes)
    got = rows.groupBy("t").agg(
        F.count("*").alias("n"),
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
    ).collect()
    assert len(got) == 3
    for r in got:
        assert r["n"] == 50 and 0 <= r["lo"] and r["hi"] < 32
