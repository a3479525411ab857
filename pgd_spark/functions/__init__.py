from pgd_spark.functions.textstats import (
    fingerprint,
    langid,
    quality_score,
    token_count,
)
from pgd_spark.functions.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from pgd_spark.functions.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_assign,
    ivf_cosine_topk,
    lsh_cosine_topk,
)

__all__ = [
    "token_count",
    "quality_score",
    "langid",
    "fingerprint",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_dedup",
    "simhash_dedup",
    "dup_clusters",
    "cosine_topk",
    "lsh_cosine_topk",
    "embedding_neardup_pairs",
    "ivf_cosine_topk",
    "ivf_assign",
]
