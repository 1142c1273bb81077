"""Differential parity for the supershingle span pass: the round-1
winnow-candidates + difflib-verify path is the executable oracle for the
round-2 anchored supershingle equi-join (operators/neardup.span_pairs).
Winnowing guarantees recall for spans >= span_min_tokens and difflib is an
exact longest-common-run check, so on an uncapped corpus the two pair SETS
must be identical; span_tokens must agree for single-span pairs and the
supershingle count may only exceed difflib (total shared content vs longest
single run) when a pair shares several disjoint spans."""

from __future__ import annotations

from fast_duplicate_finder_spark.config import PipelineConfig
from fast_duplicate_finder_spark.corpus import generate_transcripts
from fast_duplicate_finder_spark.operators.lsh import (
    fingerprint_candidate_pairs,
)
from fast_duplicate_finder_spark.operators.neardup import (
    shingle_features,
    span_pairs,
    winnow_fingerprint_rows,
)
from fast_duplicate_finder_spark.operators.verify import (
    attach_pair_payload,
    verify_shared_span,
)
from fast_duplicate_finder_spark.sources.transcripts import (
    assemble_conversations,
)

CFG = PipelineConfig()


def _difflib_span_pairs(features):
    window = max(CFG.span_min_tokens - CFG.shingle_k + 1, 1)
    fps = winnow_fingerprint_rows(features, window).localCheckpoint(
        eager=True
    )
    cands, _ = fingerprint_candidate_pairs(fps, CFG)
    with_grams = attach_pair_payload(
        cands, features.select("conv_id", "grams"), "grams"
    )
    return verify_shared_span(with_grams, CFG)


def test_supershingle_span_matches_difflib_oracle(spark):
    t = generate_transcripts(spark, n_convs=300, seed=42)
    features = shingle_features(
        assemble_conversations(t), CFG
    ).localCheckpoint(eager=True)

    new_pairs, overflow = span_pairs(features, CFG)
    new = {
        (r["conv_id_a"], r["conv_id_b"]): r["span_tokens"]
        for r in new_pairs.collect()
    }
    old = {
        (r["conv_id_a"], r["conv_id_b"]): r["span_tokens"]
        for r in _difflib_span_pairs(features).collect()
    }
    assert overflow.count() == 0  # no capped buckets: sets must be equal
    assert set(new) == set(old), (
        sorted(set(new) - set(old))[:5],
        sorted(set(old) - set(new))[:5],
    )
    assert len(new) > 0
    for pair, st in new.items():
        # equal for single shared spans; supershingle counts total shared
        # content, so on THIS corpus it can only exceed difflib's longest
        # single run. (Not an invariant in general: a span that internally
        # repeats identical windows collapses to fewer DISTINCT
        # supershingles and would undercount — the 200-word random
        # vocabulary cannot produce a repeated 38-gram window, so the
        # lower-bound case is unreachable here. See span_pairs docstring.)
        assert st >= old[pair], (pair, st, old[pair])
    # exact-duplicate families share their whole document: single span
    exact = [p for p in new if new[p] == old[p]]
    assert len(exact) >= len(new) // 2
