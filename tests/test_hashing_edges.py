"""Partial-hash slice/boundary semantics (FIXTURES.md families
``size_class_edges`` and ``unicode``) + hypothesis property tests for
assembly stability.

The reference's size classes (calculate_hash.go:13-19): below small ->
prefix slice only; small..large -> prefix+suffix; >= large ->
prefix+middle+suffix, window = partial_hash_size. We run a shrunken config
(window 8, thresholds 100/200) so every branch is cheap to pin, and verify
against an independent Python oracle over the same character semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fast_duplicate_finder_spark.config import PipelineConfig
from fast_duplicate_finder_spark.functions.hashing import partial_hash

CFG = PipelineConfig(partial_hash_size=8, small_threshold=100,
                     large_threshold=200)


def _oracle_slices(doc: str, cfg: PipelineConfig) -> tuple[str, ...]:
    """Which character slices feed the partial hash (python reference)."""
    p = cfg.partial_hash_size
    n = len(doc)
    prefix = doc[:p]
    suffix = doc[max(0, n - p):][:p]
    mid_start = max(0, n // 2 - p // 2)
    middle = doc[mid_start:mid_start + p]
    if n < cfg.small_threshold:
        return (prefix,)
    if n < cfg.large_threshold:
        return (prefix, suffix)
    return (prefix, middle, suffix)


def _spark_partial_hashes(spark, docs: list[str]):
    df = spark.createDataFrame(
        [(i, d, len(d)) for i, d in enumerate(docs)],
        "id long, doc string, size long",
    )
    return {
        r["id"]: r["ph"]
        for r in df.withColumn(
            "ph", partial_hash(F.col("doc"), F.col("size"), CFG)
        ).collect()
    }


def test_size_class_boundaries_pick_the_right_slices(spark):
    """Docs at threshold-1 / threshold must land in different classes:
    equality of partial hashes tracks equality of the oracle slices."""
    base = "abcdefghij" * 40  # 400 chars
    cases = []
    for n in (8, 99, 100, 101, 199, 200, 201, 399):
        cases.append(base[:n])
    # same prefix+suffix, different middle: identical in the middle class
    # only when middle windows also agree
    a = base[:250]
    b = base[:121] + "X" * 8 + base[129:250]  # differs inside the middle
    cases += [a, b]
    hashes = _spark_partial_hashes(spark, cases)
    slices = {i: _oracle_slices(d, CFG) for i, d in enumerate(cases)}
    for i in range(len(cases)):
        for j in range(i + 1, len(cases)):
            same_slices = slices[i] == slices[j]
            same_hash = hashes[i] == hashes[j]
            assert same_slices == same_hash, (i, j, slices[i], slices[j])


def test_prefix_collision_dies_at_full_hash(spark):
    """prefix_collision family: same prefix/suffix windows (>= large
    class), different middle -> same partial hash iff middle windows match;
    full hash always differs."""
    head, tail = "H" * 90, "T" * 90
    mid1, mid2 = "m" * 120, "m" * 58 + "DIFF" + "m" * 58
    d1, d2 = head + mid1 + tail, head + mid2 + tail
    assert len(d1) == len(d2) >= CFG.large_threshold
    hashes = _spark_partial_hashes(spark, [d1, d2])
    same_middle = (
        _oracle_slices(d1, CFG) == _oracle_slices(d2, CFG)
    )
    assert (hashes[0] == hashes[1]) == same_middle
    df = spark.createDataFrame([(d1,), (d2,)], "doc string")
    fh = [r["h"] for r in df.select(F.xxhash64("doc").alias("h")).collect()]
    assert fh[0] != fh[1]


def test_unicode_slices_are_character_based(spark):
    """Multibyte chars crossing the window boundary: two docs equal in the
    first `partial_hash_size` CHARACTERS hash equal even though their byte
    prefixes differ (documented char semantics, FIXTURES.md unicode row)."""
    emoji_head = "\U0001F600你好é" * 2  # 8 chars, many bytes
    d1 = emoji_head + "afterZZZ"
    d2 = emoji_head + "differs!"
    assert len(d1) < CFG.small_threshold  # prefix-only class
    hashes = _spark_partial_hashes(spark, [d1, d2])
    assert hashes[0] == hashes[1]  # same first 8 chars
    d3 = "\U0001F601" + emoji_head[1:] + "afterZZZ"  # first char differs
    hashes2 = _spark_partial_hashes(spark, [d1, d3])
    assert hashes2[0] != hashes2[1]


@pytest.mark.filterwarnings("ignore::pytest.PytestUnraisableExceptionWarning")
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF),
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_assembly_invariant_under_row_shuffle(spark, texts, seed):
    """Property: assembled doc equals '\n'.join(texts in turn order) no
    matter the physical row order (input_hint per-row invariant)."""
    import random

    from fast_duplicate_finder_spark.sources.transcripts import (
        assemble_conversations,
    )

    rows = [("c0", i, "user", t, "", None) for i, t in enumerate(texts)]
    random.Random(seed).shuffle(rows)
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    ).repartition(3)
    out = assemble_conversations(df).collect()
    assert len(out) == 1
    assert out[0]["doc"] == "\n".join(texts)


# --- Arrow kernel batch-flattening invariance (hypothesis) -----------------


@settings(deadline=None, max_examples=60,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_minhash_batch_equals_per_row(hash_lists):
    """The flat-concat + reduceat batch kernel must be row-order- and
    batch-boundary-invariant: signing each row ALONE gives identical
    signatures (pins the starts/cumsum bookkeeping and the empty/None
    sentinel handling)."""
    import numpy as np
    import pandas as pd

    from fast_duplicate_finder_spark.functions.minhash import (
        minhash_batch,
        perm_seeds,
    )

    seeds = perm_seeds(16, 42)
    with np.errstate(over="ignore"):
        whole = minhash_batch(pd.Series(hash_lists), seeds)
        solo = [
            minhash_batch(pd.Series([h]), seeds)[0] for h in hash_lists
        ]
    for w, s in zip(whole, solo):
        assert list(w) == list(s)


@settings(deadline=None, max_examples=60,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_simhash_batch_equals_per_row(hash_lists):
    """Same invariance for the bit-vote kernel (pins the _ROW_CHUNK
    splitting and reduceat segment bookkeeping)."""
    import numpy as np
    import pandas as pd

    from fast_duplicate_finder_spark.functions.simhash import simhash_batch

    with np.errstate(over="ignore"):
        whole = simhash_batch(pd.Series(hash_lists))
        solo = [simhash_batch(pd.Series([h]))[0] for h in hash_lists]
    assert list(whole) == list(solo)
