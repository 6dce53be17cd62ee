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


def test_hypothesis_bpe_matches_reference_trainer(spark):
    """Random small-alphabet corpora: the distributed trainer must match
    a pure-Python BPE reference (overlapping pair counts, argmax with
    (count desc, left, right) ties, greedy-left non-overlapping merge)
    rule-for-rule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def ref_bpe(corpus, n_merges):
        docs = [list(d) for d in corpus]
        rules = []
        for rnd in range(1, n_merges + 1):
            cnt = {}
            for toks in docs:
                for i in range(len(toks) - 1):
                    cnt[(toks[i], toks[i + 1])] = \
                        cnt.get((toks[i], toks[i + 1]), 0) + 1
            if not cnt:
                break
            (l, r), c = min(cnt.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            rules.append((rnd, l, r, c))
            merged_docs = []
            for toks in docs:
                out, i = [], 0
                while i < len(toks):
                    if (i + 1 < len(toks)
                            and toks[i] == l and toks[i + 1] == r):
                        out.append(l + MERGE_MARK + r)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                merged_docs.append(out)
            docs = merged_docs
        return rules

    doc_strat = st.lists(st.sampled_from(["a", "b", "c"]),
                         min_size=1, max_size=10)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc_strat, min_size=1, max_size=4))
    def check(tok_docs):
        sdf = _df(spark, [" ".join(toks) for toks in tok_docs])
        assert bpe_train(sdf, n_merges=3) == ref_bpe(tok_docs, 3)

    check()


def test_bpe_apply_matches_manual_encode(spark):
    """bpe_apply's symbol counts equal a hand-applied merge sequence."""
    from moonshot_spark.datapipe.bpe import bpe_apply, bpe_train

    docs = spark.createDataFrame(
        [("g1", "a b a b c"), ("g2", "a b"), ("g3", "c c c")],
        "grp string, text string")
    rules = bpe_train(docs.select("text"), n_merges=2)
    out = {r["grp"]: r for r in
           bpe_apply(docs, rules, carry_cols=("grp",)).collect()}
    # rule 1 merges the most frequent pair ('a','b'): 3 occurrences
    assert (rules[0][1], rules[0][2]) == ("a", "b")
    assert out["g1"]["n_symbols"] == 5
    # "a b a b c" -> "ab ab c" (2 merges applied) = 3 symbols
    assert out["g1"]["n_encoded"] <= 4
    assert out["g2"]["n_symbols"] == 2 and out["g2"]["n_encoded"] == 1
    # no rule touches g3's lone 'c c' pair unless it won a round
    assert out["g3"]["n_encoded"] >= 1


def test_bpe_apply_empty_rules_is_identity(spark):
    from moonshot_spark.datapipe.bpe import bpe_apply

    docs = spark.createDataFrame([("x", "p q r")], "grp string, text string")
    r = bpe_apply(docs, [], carry_cols=("grp",)).collect()[0]
    assert r["n_symbols"] == r["n_encoded"] == 3


def test_encode_report_oracle_survives_exhausted_rounds(spark, tmp_path):
    """A corpus whose merges exhaust before round 4 must still produce
    the per-lang report on BOTH engines: the oracle's per-round state
    CTE passes through unchanged on an empty rule round (LEFT JOIN),
    matching bpe_train's early stop."""
    import os
    import duckdb

    from moonshot_spark.queries import QUERIES, ORACLES

    docs = spark.createDataFrame(
        [(1, "a b", "en"), (2, "a b", "en"), (3, "c", "fr")],
        "doc_id long, text string, lang string")
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))

    spark_rows = sorted(
        (r["lang"], r["n_docs"], r["total_symbols"], r["total_encoded"])
        for r in QUERIES["bpe_encode_report"](spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet/*.parquet')")
    duck_rows = sorted(
        (r[0], r[1], r[2], r[3])
        for r in con.execute(ORACLES["bpe_encode_report"]).fetchall())
    assert spark_rows == duck_rows
    assert len(spark_rows) == 2          # en + fr, not an empty wipe
    # 'a b' merges to one symbol; 'c' is untouched
    assert dict((l, (ts, te)) for l, _, ts, te in spark_rows) == {
        "en": (4, 2), "fr": (1, 1)}


def test_char_grain_matches_reference_subword_bpe(spark):
    """grain='char' is classic Sennrich subword BPE: merges learned over
    per-word character sequences, never crossing word boundaries —
    rule-for-rule vs a pure-Python reference trainer."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from moonshot_spark.datapipe.bpe import bpe_train

    def ref_char_bpe(corpus, n_merges):
        # word-level training rows, char symbols (the paper's
        # word-frequency dict, expanded)
        docs = [list(w) for text in corpus for w in text.split(" ") if w]
        rules = []
        for rnd in range(1, n_merges + 1):
            cnt = {}
            for toks in docs:
                for i in range(len(toks) - 1):
                    cnt[(toks[i], toks[i + 1])] = \
                        cnt.get((toks[i], toks[i + 1]), 0) + 1
            if not cnt:
                break
            (l, r), c = min(cnt.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            rules.append((rnd, l, r, c))
            merged = []
            for toks in docs:
                out, i = [], 0
                while i < len(toks):
                    if (i + 1 < len(toks)
                            and toks[i] == l and toks[i + 1] == r):
                        out.append(l + MERGE_MARK + r)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                merged.append(out)
            docs = merged
        return rules

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    doc_strat = st.lists(word, min_size=1, max_size=4).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(st.lists(doc_strat, min_size=1, max_size=3))
    def check(texts):
        sdf = _df(spark, texts)
        assert bpe_train(sdf, n_merges=3, grain="char") \
            == ref_char_bpe(texts, 3)

    check()


def test_char_grain_never_merges_across_words(spark):
    """'ab ba' char-grain: (a,b) occurs once (inside 'ab'), (b,a) once —
    the cross-word adjacency b|b must NOT be counted."""
    from moonshot_spark.datapipe.bpe import bpe_train

    rules = bpe_train(_df(spark, ["ab ba"] * 3), n_merges=1, grain="char")
    assert rules[0][1:3] == ("a", "b") and rules[0][3] == 3


def test_char_grain_apply_matches_train_state(spark):
    """bpe_apply(grain='char') reproduces the trainer's encoding:
    n_symbols = char count, n_encoded reflects within-word merges."""
    from moonshot_spark.datapipe.bpe import bpe_apply, bpe_train

    docs = spark.createDataFrame(
        [("d1", "aa aa b"), ("d2", "aa")], "grp string, text string")
    rules = bpe_train(docs.select("text"), n_merges=1, grain="char")
    assert rules[0][1:3] == ("a", "a")
    out = {r["grp"]: r for r in
           bpe_apply(docs, rules, carry_cols=("grp",),
                     grain="char").collect()}
    assert out["d1"]["n_symbols"] == 5      # a a a a b
    assert out["d1"]["n_encoded"] == 3      # aa aa b
    assert out["d2"]["n_symbols"] == 2 and out["d2"]["n_encoded"] == 1


def test_rules_save_load_roundtrip(spark, tmp_path):
    """Learned rules survive a parquet round-trip exactly, and the
    reloaded table encodes identically (the cross-session artifact
    contract)."""
    from moonshot_spark.datapipe.bpe import (bpe_apply, bpe_load_rules,
                                             bpe_save_rules, bpe_train)

    docs = spark.createDataFrame(
        [("g", "a b a b c d a b")], "grp string, text string")
    rules = bpe_train(docs.select("text"), n_merges=3)
    path = str(tmp_path / "rules.parquet")
    bpe_save_rules(spark, rules, path)
    loaded = bpe_load_rules(spark, path)
    assert loaded == rules
    a = bpe_apply(docs, rules, carry_cols=("grp",)).collect()
    b = bpe_apply(docs, loaded, carry_cols=("grp",)).collect()
    assert a == b
    # empty table round-trips too (early-stopped training)
    empty_path = str(tmp_path / "empty.parquet")
    bpe_save_rules(spark, [], empty_path)
    assert bpe_load_rules(spark, empty_path) == []
