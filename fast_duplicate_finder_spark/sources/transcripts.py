"""Transcript source + conversation assembly.

The reference's unit of dedup is a file (FileInfo{Path,Size},
backend/pkg/fastdupefinder/types/file_info.go:4-7). Ours is a
*conversation*: all rows of a transcripts table sharing ``conv_id``,
assembled by concatenating ``text`` in stable ``turn_idx`` order — the
per-row invariant from BASELINE.json input_hint (per-turn text equality
under stable turn ordering). Physical row order never matters
(turn_order_scramble fixture).

Scale design: phase 1 needs only (size, n_turns) per conversation — computed
with a partially-aggregable sum/count (map-side combine, one shuffle), never
materializing the document. Full documents are assembled only for phase-1
survivors (the cheap->expensive cascade of run_finder.go:39-76 re-expressed
as Spark jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "\n"  # inter-turn separator in the assembled document


TRANSCRIPT_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def load_transcripts(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a transcripts table.

    ``fmt``: ``parquet`` (dir or file), ``iceberg`` (``path`` is a table
    name; requires the Iceberg runtime jar + catalog conf — the sandbox has
    neither, so this path is exercised on a real cluster), or ``json``
    (JSONL with the input_hint schema applied, no inference scan).
    """
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    if fmt == "json":
        return spark.read.schema(TRANSCRIPT_SCHEMA_DDL).json(path)
    return spark.read.parquet(path)


def conv_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation cheap stats: ``(conv_id, size, n_turns)``.

    ``size`` = chars of the assembled doc = sum(length(text)) + (n_turns-1)
    separators — the file-size analogue (file_info.go:6). Partial+final
    hash aggregation comes free from Catalyst; no document is materialized.
    """
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias("text_chars"),
            F.count("*").alias("n_turns"),
        )
        .select(
            "conv_id",
            (F.col("text_chars") + F.col("n_turns") - 1).alias("size"),
            F.col("n_turns").cast("int").alias("n_turns"),
        )
    )


def assemble_conversations(
    transcripts: DataFrame, only_convs: DataFrame | None = None
) -> DataFrame:
    """Window-ordered concat -> ``(conv_id, doc, size, n_turns)``.

    ``array_sort(collect_list(struct(turn_idx, text)))`` sorts by the struct's
    first field (turn_idx), giving stable assembly regardless of physical row
    order. ``only_convs`` (a DataFrame with a ``conv_id`` column) restricts
    assembly to cascade survivors via a semi join — at 10^12 turns this is
    the difference between shuffling every byte and shuffling ~the duplicate
    candidates only.
    """
    t = transcripts
    if only_convs is not None:
        t = t.join(only_convs.select("conv_id").distinct(), "conv_id", "left_semi")
    return (
        t.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("turn_idx"),
                                F.coalesce("text", F.lit("")).alias("text"),
                            )
                        )
                    ),
                    lambda s: s.getField("text"),
                ),
                SEP,
            ).alias("doc"),
            F.count("*").cast("int").alias("n_turns"),
        )
        .withColumn("size", F.length("doc"))
    )
