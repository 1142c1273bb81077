from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from fast_duplicate_finder_spark.config import PipelineConfig
from fast_duplicate_finder_spark.corpus import generate_transcripts
from fast_duplicate_finder_spark.functions.minhash import (
    estimate_jaccard,
    minhash_batch,
    perm_seeds,
)
from fast_duplicate_finder_spark.functions.shingles import word_shingles
from fast_duplicate_finder_spark.operators.connected_components import (
    connected_components,
)
from fast_duplicate_finder_spark.operators.exact_cascade import run_exact_cascade
from fast_duplicate_finder_spark.operators.neardup import run_near_dup
from fast_duplicate_finder_spark.sources.transcripts import assemble_conversations

from tests.oracle import assemble_locally, jaccard, near_pairs_oracle, shingles

CFG = PipelineConfig()


def test_word_shingles_match_oracle(spark):
    docs = [
        "a b c d e",
        "single",
        "",
        "x  y\nz w",  # multi-whitespace + newline separators
        "a a a a",
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "i int, doc string")
    got = df.select("i", word_shingles(F.col("doc"), 3).alias("sh")).collect()
    for r in got:
        assert set(r["sh"]) == shingles(docs[r["i"]], 3), docs[r["i"]]


def test_minhash_estimates_jaccard():
    rng = np.random.RandomState(7)
    seeds = perm_seeds(256, 42)
    base = set(rng.randint(0, 2**62, size=400).tolist())
    drop = set(list(base)[:100])
    other = (base - drop) | set(rng.randint(0, 2**62, size=100).tolist())
    true_j = len(base & other) / len(base | other)
    with np.errstate(over="ignore"):
        sigs = minhash_batch(pd.Series([list(base), list(other)]), seeds)
    est = estimate_jaccard(sigs[0], sigs[1])
    assert abs(est - true_j) < 0.08
    # identical sets -> identical signatures
    with np.errstate(over="ignore"):
        s2 = minhash_batch(pd.Series([list(base), list(base)]), seeds)
    assert list(s2[0]) == list(s2[1])


def test_connected_components_basic(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("x", "c")],
        "conv_id_a string, conv_id_b string",
    )
    got = {
        r["conv_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "a", "d": "d", "e": "d"}


def test_near_dup_recall_and_precision_vs_bruteforce(spark):
    df = generate_transcripts(spark, n_convs=300, seed=42)
    rows = df.collect()
    local_docs = assemble_locally([tuple(r) for r in rows])
    oracle = near_pairs_oracle(local_docs, CFG.jaccard_tau, CFG.shingle_k)

    docs = assemble_conversations(df)
    exact = run_exact_cascade(df, CFG)["clusters"]
    res = run_near_dup(docs, exact, CFG)
    mh = {
        (r["conv_id_a"], r["conv_id_b"])
        for r in res["pairs"].filter("kind = 'minhash'").collect()
    }
    # precision is 1.0 by construction (exact Jaccard verify)
    for a, b in mh:
        assert jaccard(shingles(local_docs[a], CFG.shingle_k),
                       shingles(local_docs[b], CFG.shingle_k)) >= CFG.jaccard_tau
    # recall >= 0.99 (BASELINE.md gate) — here exact, tiny corpus
    missed = oracle - mh
    recall = 1 - len(missed) / max(len(oracle), 1)
    assert recall >= 0.99, f"missed {sorted(missed)[:5]} of {len(oracle)}"

    # clusters: every oracle pair ends up in the same component
    comp = {r["conv_id"]: r["component"] for r in res["clusters"].collect()}
    for a, b in oracle:
        assert comp.get(a) is not None and comp[a] == comp.get(b)


def test_simhash_catches_tiny_perturbations(spark):
    base = " ".join(f"tok{i}" for i in range(300))
    fuzz = base.replace("tok150", "tok150x")  # one-token change
    far = " ".join(f"other{i}" for i in range(300))
    df = spark.createDataFrame(
        [("p1", base), ("p2", fuzz), ("q1", far)], "conv_id string, doc string"
    )
    res = run_near_dup(df, None, CFG)
    sh = {
        tuple(sorted((r["conv_id_a"], r["conv_id_b"])))
        for r in res["pairs"].filter("kind = 'simhash'").collect()
    }
    assert ("p1", "p2") in sh
    assert ("p1", "q1") not in sh and ("p2", "q1") not in sh


def test_span_pass_detects_long_shared_span(spark):
    span = " ".join(f"shared{i}" for i in range(60))  # 60 >= span_min_tokens
    a = "intro words here " + span + " " + " ".join(f"a{i}" for i in range(200))
    b = " ".join(f"b{i}" for i in range(200)) + " " + span + " tail"
    short_span = " ".join(f"s{i}" for i in range(10))
    c = "c start " + short_span + " " + " ".join(f"c{i}" for i in range(200))
    d = "d start " + short_span + " " + " ".join(f"d{i}" for i in range(200))
    df = spark.createDataFrame(
        [("a", a), ("b", b), ("c", c), ("d", d)], "conv_id string, doc string"
    )
    res = run_near_dup(df, None, CFG)
    sp = {
        tuple(sorted((r["conv_id_a"], r["conv_id_b"])))
        for r in res["pairs"].filter("kind = 'span'").collect()
    }
    assert ("a", "b") in sp
    assert ("c", "d") not in sp


def test_supershingle_set_short_docs_empty(spark):
    """sequence(0, size - window) DESCENDS when size < window — the guard
    must yield an empty set, not inverted-index supershingles."""
    from pyspark.sql import functions as F

    from fast_duplicate_finder_spark.operators.neardup import (
        _supershingle_set,
    )

    df = spark.createDataFrame(
        [(1, list(range(5))), (2, list(range(8))), (3, []), (4, list(range(9)))],
        "conv_id int, grams array<bigint>",
    )
    out = {
        r["conv_id"]: r["n"]
        for r in df.select(
            "conv_id", F.size(_supershingle_set(F.col("grams"), 8)).alias("n")
        ).collect()
    }
    # size < window -> 0; size == window -> 1; size == window+1 -> 2
    assert out == {1: 0, 2: 1, 3: 0, 4: 2}



def test_connected_components_deep_chain_converges(spark):
    """Pointer jumping is what makes a LONG PATH converge: pure
    neighbor-min propagation moves the minimum one hop per round, so a
    300-node path would blow the max_iter=50 cap and RAISE; label
    compression halves chains per round (O(log diameter)). A shuffled
    node order keeps the min in the middle of the chain."""
    import random

    rng = random.Random(3)
    ids = [f"n{i:04d}" for i in range(300)]
    rng.shuffle(ids)  # path order != label order
    pairs = spark.createDataFrame(
        list(zip(ids, ids[1:])), "conv_id_a string, conv_id_b string"
    )
    got = {
        r["conv_id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert len(got) == 300
    assert set(got.values()) == {min(ids)}
