"""Lloyd's k-means over an embedding column — pure DataFrame iteration.

The codebook trainer behind a real IVF index (trainingdata.q_embedding_ivf_topk
uses fixed seed centroids so its DuckDB oracle stays exact; this operator is
the production path that replaces them with trained ones). Same iterative
shape as operators/connected_components.py: driver loop, one shuffle per
iteration, localCheckpoint to truncate lineage.

Design for scale:
* centroids live in a k x dim broadcast (k ~ sqrt(N) for IVF — thousands,
  not millions); the assignment join is a broadcast nested loop over k
  rows, never a shuffle of the vectors;
* the update step is one groupBy(cluster).avg — a single map-side-combined
  shuffle of k x dim doubles;
* deterministic: seed centroids are the first k vec_ids, iteration count is
  fixed, ties broken by centroid id — same input -> same codebook.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cells(vectors: DataFrame, centroids: DataFrame,
                 vec_col: str = "embedding", nprobe: int = 1) -> DataFrame:
    """(vec_id, <vec_col>, cell) — the ``nprobe`` nearest centroids by
    squared L2 (one output row each; ties to the lowest centroid_id).
    ``nprobe=1`` is the storage assignment (a vector lives in exactly one
    cell); ``nprobe>1`` is the QUERY-side recall knob — probing the k
    nearest cells recovers true neighbors that fell just across a Voronoi
    boundary. centroids: (centroid_id, centroid)."""
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "_d", _sq_dist(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("centroid_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= nprobe)
        .select("vec_id", vec_col, F.col("centroid_id").alias("cell"))
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train a k-centroid codebook; returns (centroid_id, centroid).

    Seeds = the k lowest ids (deterministic). Empty clusters keep their
    previous centroid (standard Lloyd's fallback).
    """
    v = vectors.select(F.col(id_col).alias("vec_id"), vec_col)
    seeds = (
        v.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias(
                "centroid_id"
            ),
            F.col(vec_col).alias("centroid"),
        )
        .localCheckpoint(eager=True)
    )
    if not seeds.take(1):
        raise ValueError("kmeans_fit: empty input")
    centroids = seeds
    for _ in range(n_iter):
        assigned = assign_cells(v, centroids, vec_col)
        means = assigned.select(
            "cell", F.posexplode(vec_col).alias("i", "x")
        ).groupBy("cell", "i").agg(F.avg("x").alias("m"))
        new_centroids = (
            means.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))),
                    lambda s: s.getField("m").cast("float"),
                ).alias("centroid")
            )
            .select(F.col("cell").alias("centroid_id"), "centroid")
        )
        # empty clusters: fall back to the previous centroid
        centroids = (
            centroids.alias("old")
            .join(new_centroids.alias("new"), "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new.centroid"), F.col("old.centroid")).alias(
                    "centroid"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return centroids


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    topk: int = 5,
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF search with a trained codebook: assign both sides to cells,
    search within the query's ``nprobe`` nearest cells. Returns (vec_id,
    rank, neighbor_id, cos). The 100 TB layout writes
    `assign_cells(vectors)` partitioned by cell once (always nprobe=1 —
    each candidate lives in exactly one cell, so probing q-side cells
    never double-counts a candidate), then each query touches
    ~nprobe*N/k candidates. scripts/ann_recall_probe.py measures the
    recall@k-vs-cost curve per nprobe."""
    cand = assign_cells(vectors, centroids, vec_col).select(
        F.col("vec_id").alias("nid"), F.col(vec_col).alias("nemb"), "cell"
    )
    q = assign_cells(queries, centroids, vec_col, nprobe=nprobe).select(
        F.col("vec_id").alias("qid"), F.col(vec_col).alias("qemb"), "cell"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        q.join(cand, "cell")
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("cos", cosine(F.col("qemb"), F.col("nemb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("nid").alias("neighbor_id"),
            F.round("cos", 6).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# Integer-exact Lloyd's — the oracle-checkable sibling of kmeans_fit
# ---------------------------------------------------------------------------
#
# Float Lloyd's is deterministic only up to summation order: Spark's partial
# aggregation adds doubles in partition order, so the trained centroids (and
# occasionally an assignment on a near-tie) differ in the last ulp between
# engines AND between partitionings of the same data. The exact variant
# quantizes vectors to integers and keeps every distance / update in BIGINT
# fixed point — associative, order-independent, bit-identical on any engine
# (the DuckDB oracle replicates it verbatim in SQL):
#
# * qv_i  = round(x_i * Q_SCALE)                exact per-row, no aggregation
# * dist  = sum((M_SCALE*qv_i - m_i)^2)         BIGINT (fits: |1024*q|<=6e7,
#                                               squared * 64 dims < 2^63)
# * m_i   = floor(M_SCALE*sum(qv_i)/n + 0.5)    one exact-int double division
#
# Quantization error (1e-4 relative) is irrelevant for codebook training;
# tie-breaks (dist, then centroid_id) are exact-integer comparisons.

Q_SCALE = 10_000
M_SCALE = 1024


def quantize_vectors(
    vectors: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, qv) — BIGINT-quantized copies of the vectors."""
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * Q_SCALE).cast("long"),
        ).alias("qv"),
    )


def _int_dist(qv, m):
    scale = F.lit(M_SCALE).cast("long")
    return F.aggregate(
        F.zip_with(qv, m, lambda x, y: (scale * x - y) * (scale * x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def assign_cells_exact(qvecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, qv, cell) — nearest centroid by exact integer squared L2,
    ties to the lowest centroid_id. centroids: (centroid_id, m) in M-scale."""
    scored = qvecs.crossJoin(F.broadcast(centroids)).withColumn(
        "_d", _int_dist(F.col("qv"), F.col("m"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("centroid_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("vec_id", "qv", F.col("centroid_id").alias("cell"))
    )


def kmeans_fit_exact(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Integer-exact Lloyd's codebook; returns (centroid_id, m) with m in
    M_SCALE fixed point. Seeds = the k lowest ids; empty cells keep their
    previous centroid. Same broadcast-assign + single k x dim shuffle shape
    as kmeans_fit."""
    v = quantize_vectors(vectors, vec_col, id_col)
    scale = F.lit(M_SCALE).cast("long")
    seeds = (
        v.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias(
                "centroid_id"
            ),
            F.transform(F.col("qv"), lambda x: scale * x).alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    if not seeds.take(1):
        raise ValueError("kmeans_fit_exact: empty input")
    centroids = seeds
    for _ in range(n_iter):
        assigned = assign_cells_exact(v, centroids)
        sums = (
            assigned.select("cell", F.posexplode("qv").alias("j", "x"))
            .groupBy("cell", "j")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        )
        upd = (
            sums.withColumn(
                "mj",
                F.floor(
                    F.col("s").cast("double") * float(M_SCALE) / F.col("n")
                    + 0.5
                ).cast("long"),
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "mj"))),
                    lambda st: st.getField("mj"),
                ).alias("m_new")
            )
            .select(F.col("cell").alias("centroid_id"), "m_new")
        )
        centroids = (
            centroids.alias("old")
            .join(upd.alias("new"), "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new.m_new"), F.col("old.m")).alias("m"),
            )
            .localCheckpoint(eager=True)
        )
    return centroids
