"""DataFrame-level functions: flatten, text analysis, dedup, similarity,
skew mitigation, deterministic sampling/splitting/packing."""

from astro_sdk_spark.functions.cleaning import (
    decontaminate,
    redact_pii,
    repetition_stats,
)
from astro_sdk_spark.functions.dedup import (
    dedup_corpus,
    embedding_near_dup,
    exact_dedup,
    incremental_near_dup,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_near_dup,
    minhash_signatures,
    near_dup_clusters,
    simhash_near_dup,
    simhash_signatures,
)
from astro_sdk_spark.functions.flatten import flatten
from astro_sdk_spark.functions.similarity import (
    ann_recall,
    banded_signatures,
    cosine_similarity_col,
    cosine_topk,
    ivf_topk,
    lsh_bucket_join,
    train_centroids,
)
from astro_sdk_spark.functions.pq import pq_encode, pq_topk, train_pq
from astro_sdk_spark.functions.sampling import (
    concat_chunk_pack,
    deterministic_split,
    hash_bucket,
    pack_greedy,
    stratified_sample,
)
from astro_sdk_spark.functions.skew import salted_agg, salted_join
from astro_sdk_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_stats,
)

__all__ = [
    "flatten",
    "exact_dedup",
    "dedup_corpus",
    "decontaminate",
    "redact_pii",
    "repetition_stats",
    "near_dup_clusters",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_near_dup",
    "incremental_near_dup",
    "jaccard_pairs",
    "simhash_signatures",
    "simhash_near_dup",
    "embedding_near_dup",
    "cosine_similarity_col",
    "cosine_topk",
    "banded_signatures",
    "lsh_bucket_join",
    "ivf_topk",
    "ann_recall",
    "train_centroids",
    "train_pq",
    "pq_encode",
    "pq_topk",
    "token_stats",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "bpe_ish_token_count",
    "salted_join",
    "salted_agg",
    "hash_bucket",
    "deterministic_split",
    "stratified_sample",
    "concat_chunk_pack",
    "pack_greedy",
]
