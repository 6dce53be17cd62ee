"""Unit tests for wave-7 datapipe operators: exact-substring duplicate
spans, hard-negative mining, product-quantization encoding."""

import pytest
from pyspark.sql import functions as F

from moonshot_spark.datapipe.similarity import mine_hard_negatives, pq_encode
from moonshot_spark.datapipe.spans import duplicate_spans, window_hashes


def _doc(words):
    return " ".join(words)


@pytest.fixture(scope="module")
def span_docs(spark):
    # doc 0: w0..w19; doc 1 repeats w4..w13 (10 tokens) verbatim inside
    # otherwise-unique text; doc 2 is all-unique
    w = [f"w{i}" for i in range(20)]
    u = [f"u{i}" for i in range(8)]
    v = [f"v{i}" for i in range(8)]
    rows = [
        (0, _doc(w)),
        (1, _doc(u + w[4:14] + v)),
        (2, _doc([f"z{i}" for i in range(15)])),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_boundaries(span_docs):
    """The shared 10-token run w4..w13 yields 3 duplicated 8-windows
    (positions p, p+1, p+2) merging to one span of exactly 10 tokens in
    each doc; the all-unique doc emits nothing."""
    spans = {r["doc_id"]: r for r in duplicate_spans(span_docs, k=8).collect()}
    assert set(spans) == {0, 1}
    # doc 0: run starts at token 4 -> windows 4,5,6 -> span [4, 13]
    assert (spans[0]["span_start"], spans[0]["span_end"],
            spans[0]["span_len"], spans[0]["n_windows"]) == (4, 13, 10, 3)
    # doc 1: run starts at token 8 (after the 8 u-tokens) -> span [8, 17]
    assert (spans[1]["span_start"], spans[1]["span_end"],
            spans[1]["span_len"], spans[1]["n_windows"]) == (8, 17, 10, 3)


def test_duplicate_spans_split_islands(spark):
    """Two shared runs separated by a gap wider than k stay two spans."""
    a = [f"a{i}" for i in range(8)]
    b = [f"b{i}" for i in range(8)]
    mid = [f"m{i}" for i in range(12)]  # unique 12-token gap > k=8
    rows = [(0, _doc(a + mid + b)),
            (1, _doc(a + [f"x{i}" for i in range(12)] + b))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = sorted(
        ((r["doc_id"], r["span_start"], r["span_end"]) for r in
         duplicate_spans(docs, k=8).collect()))
    assert spans == [(0, 0, 7), (0, 20, 27), (1, 0, 7), (1, 20, 27)]


def test_duplicate_spans_within_doc_repeat(spark):
    """A window repeated inside ONE doc counts as duplicated (the paper's
    any-other-occurrence rule)."""
    a = [f"a{i}" for i in range(8)]
    rows = [(0, _doc(a + [f"g{i}" for i in range(10)] + a))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = sorted((r["span_start"], r["span_end"])
                   for r in duplicate_spans(docs, k=8).collect())
    assert spans == [(0, 7), (18, 25)]


def test_window_hashes_short_docs_emit_nothing(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    assert window_hashes(docs, k=8).count() == 0


@pytest.fixture(scope="module")
def tiny_emb(spark):
    # 2-dim embeddings, two labels; cosine structure is obvious by hand
    rows = [
        (0, [1.0, 0.0], 0),       # anchor
        (1, [1.0, 0.1], 0),       # nearest same-label -> positive
        (2, [0.0, 1.0], 0),       # far same-label
        (3, [1.0, 0.2], 1),       # nearest other-label -> hard negative 1
        (4, [1.0, 0.5], 1),       # hard negative 2
        (5, [-1.0, 0.0], 1),      # hard negative 3 (worst)
        (6, [0.5, 0.9], 2),       # another label
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_hard_negative_mining_roles(tiny_emb):
    anchors = (tiny_emb.where(F.col("vec_id") == 0)
               .select(F.col("vec_id").alias("anchor_id"),
                       "embedding", "label"))
    out = mine_hard_negatives(tiny_emb, anchors, n_neg=3).collect()
    pos = [r for r in out if r["role"] == "positive"]
    neg = sorted((r for r in out if r["role"] == "negative"),
                 key=lambda r: r["rank"])
    assert [r["vec_id"] for r in pos] == [1]          # anchor excluded
    assert [r["vec_id"] for r in neg] == [3, 4, 6]    # by cosine desc
    assert all(r["anchor_id"] == 0 for r in out)
    assert neg[0]["cosine"] > neg[1]["cosine"] > neg[2]["cosine"]


def test_pq_encode_exact_and_tiebreak(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 5.0, 5.0]),
         (1, [0.0, 1.0, 5.0, 5.0]),
         (2, [0.5, 0.5, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    # 2 subspaces x 2 dims; subspace 0 books: equidistant from vec 2
    books = [[[1.0, 0.0], [0.0, 1.0]],
             [[5.0, 5.0], [0.0, 0.0]]]
    enc = {(r["vec_id"], r["subspace"]): (r["code"], r["ssd"])
           for r in pq_encode(emb, books, n_sub=2, sub_dim=2).collect()}
    assert enc[(0, 0)] == (0, 0.0)        # exact codeword match
    assert enc[(1, 0)] == (1, 0.0)
    assert enc[(0, 1)] == (0, 0.0)
    assert enc[(2, 1)] == (1, 0.0)
    code, ssd = enc[(2, 0)]               # equidistant -> lowest code wins
    assert code == 0 and ssd == pytest.approx(0.5)


def test_scrub_spans_cuts_exact_intervals(span_docs):
    """Scrubbing removes exactly the spanned tokens and leaves the rest
    in order; span-free docs pass through byte-identical."""
    from moonshot_spark.datapipe.spans import duplicate_spans, scrub_spans

    spans = duplicate_spans(span_docs, k=8)
    out = {r["doc_id"]: r for r in
           scrub_spans(span_docs, spans).collect()}
    w = [f"w{i}" for i in range(20)]
    u = [f"u{i}" for i in range(8)]
    v = [f"v{i}" for i in range(8)]
    # doc 0: span [4, 13] cut -> w0..w3 + w14..w19
    assert out[0]["scrubbed_text"] == _doc(w[:4] + w[14:])
    assert (out[0]["n_tok"], out[0]["kept_tok"]) == (20, 10)
    # doc 1: span [8, 17] cut -> the 8 u tokens + the 8 v tokens
    assert out[1]["scrubbed_text"] == _doc(u + v)
    # doc 2: no spans -> unchanged
    assert out[2]["scrubbed_text"] == out[2]["text"]
    assert out[2]["kept_tok"] == out[2]["n_tok"] == 15


def test_hypothesis_spans_and_scrub_match_bruteforce(spark):
    """Random small-alphabet corpora (dense natural duplicates): the
    distributed span detection + scrub must match a pure-Python
    suffix-scan reference exactly — positions, merges, and the
    reconstructed text."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from moonshot_spark.datapipe.spans import duplicate_spans, scrub_spans

    K = 3

    def ref(docs):
        cnt = Counter()
        for _, toks in docs:
            for p in range(len(toks) - K + 1):
                cnt[tuple(toks[p:p + K])] += 1
        spans, scrubbed = {}, {}
        for did, toks in docs:
            dup = [p for p in range(len(toks) - K + 1)
                   if cnt[tuple(toks[p:p + K])] >= 2]
            islands = []
            for p in dup:
                if islands and p - islands[-1][-1] <= K:
                    islands[-1].append(p)
                else:
                    islands.append([p])
            sp = [(i[0], i[-1] + K - 1) for i in islands]
            if sp:
                spans[did] = sorted(sp)
            cut = {t for s, e in sp for t in range(s, e + 1)}
            scrubbed[did] = " ".join(
                t for i, t in enumerate(toks) if i not in cut)
        return spans, scrubbed

    doc_strat = st.lists(st.sampled_from(["a", "b", "c"]),
                         min_size=0, max_size=14)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc_strat, min_size=1, max_size=4))
    def check(tok_docs):
        docs = [(i, toks) for i, toks in enumerate(tok_docs)]
        sdf = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in docs],
            "doc_id long, text string")
        exp_spans, exp_scrub = ref(docs)
        spans = duplicate_spans(sdf, k=K)
        got = {}
        for r in spans.collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"]))
        assert {d: sorted(v) for d, v in got.items()} == exp_spans
        out = {r["doc_id"]: r["scrubbed_text"]
               for r in scrub_spans(sdf, spans).collect()}
        assert out == exp_scrub

    check()
