"""JVM-side vector expressions for embedding columns (array<float>).

One shared cosine keeps the brute-force oracle queries, the IVF
assign/search legs and the LSH-ANN verify numerically identical — the
fold order and double-casting here are oracle-load-bearing (DuckDB's
list_cosine_similarity is replayed against this exact accumulation), so
a precision change must happen in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def cosine(a, b):
    """Cosine similarity of two array<float|double> columns — a
    whole-stage-codegen-free but JVM-side higher-order fold (no Python,
    no UDF, element count is embedding dim ~64)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm(a) * norm(b))
