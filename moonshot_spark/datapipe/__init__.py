"""Large-scale training-data pipeline operators (SURVEY.md §7.1 step 9).

Beyond-reference components for 100 TB corpus processing: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language ID, quality
scoring, token counting, fingerprinting), and multimodal column plumbing.

Design rules: everything is built from JVM-side ``pyspark.sql.functions``
(array/lambda higher-order functions for shingles and hashing) so the hot
path stays in whole-stage codegen; Pandas UDFs only where genuinely needed
(binary decode stubs, numpy-heavy similarity).
"""

from moonshot_spark.datapipe.text import (
    tokens_expr, token_count_expr, quality_exprs, lang_scores_expr,
    fingerprint_expr, winnowing_fingerprint_expr, repetition_struct_expr,
)
from moonshot_spark.datapipe.dedup import (
    exact_duplicates, exact_duplicate_mapping, minhash_signatures,
    minhash_signatures_from_shingles, shingle_frame,
    lsh_candidate_pairs, simhash_expr,
)
from moonshot_spark.datapipe.decontam import (
    eval_ngrams, ngram_overlap, decontaminate,
)
from moonshot_spark.datapipe.pii import (
    pii_count_exprs, pii_redact_expr, scrub_pii,
)
from moonshot_spark.datapipe.sampling import (
    hash_bucket_expr, split_expr, train_test_split, stratified_sample,
)
from moonshot_spark.datapipe.similarity import (
    cosine_expr, brute_force_topk, lsh_bucketed_topk,
    train_ivf_centroids, ivf_assign_col, ivf_probe_col, ivf_topk,
)

__all__ = [
    "tokens_expr", "token_count_expr", "quality_exprs", "lang_scores_expr",
    "fingerprint_expr", "winnowing_fingerprint_expr", "repetition_struct_expr",
    "exact_duplicates", "exact_duplicate_mapping", "minhash_signatures",
    "minhash_signatures_from_shingles", "shingle_frame",
    "lsh_candidate_pairs", "simhash_expr",
    "eval_ngrams", "ngram_overlap", "decontaminate",
    "pii_count_exprs", "pii_redact_expr", "scrub_pii",
    "hash_bucket_expr", "split_expr", "train_test_split", "stratified_sample",
    "cosine_expr", "brute_force_topk", "lsh_bucketed_topk",
    "train_ivf_centroids", "ivf_assign_col", "ivf_probe_col", "ivf_topk",
]
