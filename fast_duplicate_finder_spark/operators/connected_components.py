"""Connected components on a pair DataFrame — iterative min-label propagation.

Needed to turn verified near-duplicate *pairs* into duplicate *clusters*
(the reference never needs this: exact hashing partitions transitively for
free; near-dup similarity does not). No GraphFrames dependency — pure
DataFrame ops (hash-to-min label propagation; cf. BTS, ICDE 2024 in
PAPERS.md, and the classic large-star/small-star family).

Scale notes:
* each iteration = neighbor-min (join + agg) plus one pointer-jumping
  self-join (label -> label(label)); compression halves label chains so
  convergence is O(log diameter) iterations — and non-convergence at
  max_iter RAISES instead of silently splitting a component;
* ``localCheckpoint`` truncates lineage per iteration, otherwise the plan
  grows exponentially and the driver OOMs long before the data does;
* labels are the *min conv_id string* so the final cluster id convention
  matches the exact cascade (deterministic, report-sortable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "conv_id_a",
    dst: str = "conv_id_b",
    max_iter: int = 50,
) -> DataFrame:
    """``pairs`` -> ``(conv_id, component)`` for every node in any pair.

    ``component`` = lexicographic min conv_id reachable via pair edges.
    """
    edges = pairs.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).filter(F.col("a") != F.col("b"))
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    # Iteration shuffle sizing is left to AQE partition coalescing (enabled
    # in session.py): each label-propagation round is join+agg over |E|
    # rows, and AQE collapses the tiny post-shuffle partitions of small
    # graphs at runtime. (Round 1 temporarily shrank the session-global
    # spark.sql.shuffle.partitions instead — unsafe under concurrent
    # queries on the shared session, and the finally-restore could clobber
    # a value a concurrent caller had changed meanwhile.)
    labels = (
        sym.select(F.col("a").alias("conv_id"))
        .distinct()
        .withColumn("label", F.col("conv_id"))
        .localCheckpoint(eager=True)
    )

    n_changed = -1
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym.b == labels.conv_id, "inner")
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(nbr, labels.conv_id == nbr.a, "left").select(
            "conv_id",
            F.least(
                F.col("label"), F.coalesce("nbr_min", F.col("label"))
            ).alias("label"),
            (F.col("nbr_min") < F.col("label")).alias("changed"),
        )
        # pointer jumping: follow label -> label(label) once per round
        # (every label IS a node id, so the self-join always matches).
        # Neighbor-min alone moves a component's minimum ONE hop per
        # round — O(diameter) rounds, and a >max_iter-diameter chain
        # (sliding boilerplate at corpus scale) would silently split.
        # Compression makes label chains halve: O(log diameter) rounds.
        parent = stepped.select(
            F.col("conv_id").alias("p"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(parent, stepped.label == parent.p, "inner")
            .select(
                "conv_id",
                F.least("label", "plabel").alias("label"),
                (F.col("changed") | (F.col("plabel") < F.col("label"))).alias(
                    "changed"
                ),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    if n_changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({n_changed} labels still changing) — returning "
            "would silently report one component as several; raise "
            "max_iter"
        )

    return labels.select("conv_id", F.col("label").alias("component"))
