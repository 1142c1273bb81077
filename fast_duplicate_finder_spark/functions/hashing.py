"""Hashing column expressions (all JVM-side, whole-stage-codegen'd).

Behavioral parity targets:
* full hash — xxhash64 of the whole document
  (reference helpers/calculate_hash.go:111-114; the reference uses
  github.com/cespare/xxhash, Spark's built-in ``F.xxhash64`` is the same
  public algorithm family; we standardize on int64 and hex only at edges,
  reference prints hex at calculate_hash.go:117)
* size-adaptive partial hash — calculate_hash.go:13-19,43-109:
  PartialHashSize=4096; size < 1MiB -> first window only;
  1-10MiB -> first+last; >=10MiB -> first+middle+last.
  We slice *characters* of the assembled conversation (documented char
  semantics — the unicode fixture pins this down; the reference slices bytes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fast_duplicate_finder_spark.config import PipelineConfig


def full_hash(doc: Column) -> Column:
    return F.xxhash64(doc)


def _slice(doc: Column, start: Column, length: int) -> Column:
    # Column.substr is 1-based; callers guarantee start >= 1.
    return doc.substr(start, F.lit(length))


def partial_hash(doc: Column, size: Column, cfg: PipelineConfig) -> Column:
    """Size-adaptive partial hash over prefix / suffix / middle slices.

    For docs shorter than the window the prefix slice is the whole doc, so
    the partial hash equals a full-content hash — same degenerate behavior
    as hashing a sub-4KiB file's entire contents in the reference.
    """
    p = cfg.partial_hash_size
    prefix = _slice(doc, F.lit(1), p)
    suffix = _slice(doc, F.greatest(F.lit(1), size - F.lit(p - 1)), p)
    mid_start = F.greatest(F.lit(1), (size / 2).cast("long") - F.lit(p // 2 - 1))
    middle = _slice(doc, mid_start, p)
    return (
        F.when(size < F.lit(cfg.small_threshold), F.xxhash64(prefix))
        .when(size < F.lit(cfg.large_threshold), F.xxhash64(prefix, suffix))
        .otherwise(F.xxhash64(prefix, middle, suffix))
    )


def hash_hex(h: Column, width: int = 12) -> Column:
    """Report-edge display form (generate_report.go:63-67 truncates to 12)."""
    return F.lower(F.substring(F.hex(h), 1, width))
