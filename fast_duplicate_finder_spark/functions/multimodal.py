"""Multimodal (binary-payload) column plumbing.

Training-data pipelines carry images/audio/video as opaque ``binary``
columns with typed metadata. The reference engine has no multimodal
capability (files are hashed as byte streams, backend/pkg/fastdupefinder/
helpers/calculate_hash.go); this module supplies the Spark-side plumbing a
100 TB multimodal corpus needs:

* schema convention: ``(id, payload binary, media_type string)`` plus a
  typed metadata struct produced here;
* Arrow-batched ``mapInPandas`` kernels (binary columns cross the Arrow
  boundary as ``bytes``) — never per-row Python UDFs;
* the actual codec step is STUBBED (``decode_stub``): the sandbox has no
  image/audio libraries, so decoding derives deterministic fake dimensions
  from the byte content. Swap ``decode_stub`` for a real decoder (PIL /
  torchaudio / pyav) in production — the batch shape, schema, and
  partitioning contract stay identical.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "id bigint, media_type string, n_bytes bigint, width int, height int, "
    "n_frames int, checksum bigint"
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode. A real decoder returns the same fields
    from the container header; tests pin these exact arithmetic values so
    the DuckDB oracle can replicate them from octet_length + byte sums.

    Raises nothing here; a production decoder should raise and let the
    kernel route the row to the bad-records side output.
    """
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0  # header checksum analogue
    return {
        "n_bytes": n,
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "n_frames": n % 16 + 1,
        "checksum": checksum,
    }


def extract_media_meta(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    decoder: Callable[[bytes], dict] = decode_stub,
) -> DataFrame:
    """``mapInPandas`` metadata extraction over binary payloads.

    Input partitioning is preserved (narrow transformation — no shuffle);
    at 100 TB the payload bytes never move between executors.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                decoder(p if p is not None else b"") for p in pdf[payload_col]
            ]
            out = pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "media_type": pdf[media_type_col],
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "checksum": [m["checksum"] for m in metas],
                }
            )
            yield out

    return df.mapInPandas(kernel, META_SCHEMA)


def frame_sample_indices(
    meta: DataFrame, every_nth: int = 4
) -> DataFrame:
    """Frame-sampling plan: one row per (id, frame_idx) to decode — the
    shuffle-free JVM-side explode that precedes a real frame extractor."""
    return meta.select(
        "id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_nth)
            )
        ).alias("frame_idx"),
    )


def payload_dedup_keys(
    df: DataFrame, id_col: str = "id", payload_col: str = "payload"
) -> DataFrame:
    """Exact binary dedup keys: (id, n_bytes, xxhash64(payload)) — the
    multimodal analogue of the reference's size->hash cascade, entirely
    JVM-side (no Python sees the bytes)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.xxhash64(F.col(payload_col)).alias("payload_hash"),
    )
