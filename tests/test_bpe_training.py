"""Unit tests for distributed BPE merge training (datapipe/bpe.py):
greedy overlap handling, hierarchical merges, tie-breaking, early stop."""

import pytest

from moonshot_spark.datapipe.bpe import MERGE_MARK, bpe_train


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_greedy_overlap_matches_classic_bpe(spark):
    """'a a a' holds two overlapping (a,a) pairs; the count sees both
    but the merge is greedy-left: only the first merges, leaving
    [a<M>a, a] — so round 2's top pair is (a<M>a, a)."""
    docs = _df(spark, ["a a a"] * 3)
    rules = bpe_train(docs, n_merges=2)
    assert rules[0] == (1, "a", "a", 6)          # 2 overlapping pairs x 3
    assert rules[1] == (2, f"a{MERGE_MARK}a", "a", 3)


def test_hierarchical_merges(spark):
    """Merged symbols participate in later rounds: 'x y z' merges
    (x,y) first (tie broken lexicographically against (y,z)), then the
    merged symbol pairs with z."""
    docs = _df(spark, ["x y z"] * 4)
    rules = bpe_train(docs, n_merges=2)
    assert rules[0] == (1, "x", "y", 4)
    assert rules[1] == (2, f"x{MERGE_MARK}y", "z", 4)


def test_tiebreak_is_lexicographic(spark):
    """(b,c) and (a,b)... both appear twice; (a,b) < (b,c) binary."""
    docs = _df(spark, ["a b", "a b", "b c", "b c"])
    rules = bpe_train(docs, n_merges=1)
    assert rules[0] == (1, "a", "b", 2)


def test_early_stop_when_no_pairs(spark):
    """Single-token docs yield no pairs: training stops early."""
    docs = _df(spark, ["one", "two", "three"])
    assert bpe_train(docs, n_merges=3) == []


def test_merge_count_reflects_post_merge_state(spark):
    """After merging the top pair, its occurrences are gone: the next
    round counts the NEW adjacency, not the old one."""
    docs = _df(spark, ["p q r p q"] * 2)
    rules = bpe_train(docs, n_merges=3)
    assert rules[0] == (1, "p", "q", 4)
    pq = f"p{MERGE_MARK}q"
    # state now 'pq r pq' x2: pairs (pq,r) x2 and (r,pq) x2; tie ->
    # binary order: 'p\x01q' < 'r'
    assert rules[1] == (2, pq, "r", 2)
    assert rules[2] == (3, f"{pq}{MERGE_MARK}r", pq, 2)
