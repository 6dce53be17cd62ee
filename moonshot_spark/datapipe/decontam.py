"""Benchmark decontamination: remove training docs that share word n-grams
with an evaluation/benchmark set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM-style
13-gram overlap): any training document containing an n-gram that also
appears in the eval set is "contaminated" and dropped (or flagged for
audit).

Scale design (100 TB training corpus, ~10k-1M eval docs):

- The eval side is tiny relative to the corpus — its distinct n-gram set
  is built once and **broadcast**, so the corpus-side probe is a map-side
  hash join: no shuffle of the training corpus at all.
- The corpus side explodes its per-doc distinct shingle set (a flatMap in
  the same stage as the scan) and probes the broadcast table; only the
  matching (doc, ngram) rows survive into the one real shuffle — the
  groupBy(doc_id) that counts overlaps.  Contamination is rare by
  construction, so that shuffle carries a sliver of the corpus.
- If the eval n-gram set outgrows broadcast range (>~1 GB), swap the
  broadcast join for a sort-merge join on ``ngram`` — the code is
  unchanged except dropping the hint, and AQE picks the strategy.

No UDFs anywhere; shingling is the same array-HOF expression the MinHash
family uses (``dedup.shingles_expr``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moonshot_spark.datapipe.dedup import shingles_expr


def eval_ngrams(eval_docs: DataFrame, text_col: str = "text",
                n: int = 3) -> DataFrame:
    """Distinct n-gram set of the eval/benchmark corpus: one ``ngram``
    column, deduplicated — the broadcast probe table."""
    return (eval_docs
            .select(F.explode(shingles_expr(text_col, n)).alias("ngram"))
            .distinct())


def ngram_overlap(train_docs: DataFrame, eval_docs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, min_overlap: int = 1) -> DataFrame:
    """Per-contaminated-doc overlap counts: (id, n_shared_ngrams) for every
    training doc sharing >= ``min_overlap`` distinct n-grams with the eval
    set.  ``shingles_expr`` emits *distinct* shingles per doc and the eval
    table is distinct, so each (doc, ngram) match appears exactly once and
    a plain count(*) is the distinct-overlap count.
    """
    ev = eval_ngrams(eval_docs, text_col, n)
    exploded = train_docs.select(
        F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("ngram"))
    return (exploded.join(F.broadcast(ev), "ngram")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_shared_ngrams"))
            .where(F.col("n_shared_ngrams") >= min_overlap))


def decontaminate(train_docs: DataFrame, eval_docs: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3, min_overlap: int = 1) -> DataFrame:
    """The clean training corpus: training docs with fewer than
    ``min_overlap`` shared n-grams (left-anti join on the contaminated
    id set — streams, never materializes the survivor list)."""
    contaminated = ngram_overlap(train_docs, eval_docs, text_col, id_col,
                                 n, min_overlap).select(id_col)
    return train_docs.join(contaminated, id_col, "left_anti")
