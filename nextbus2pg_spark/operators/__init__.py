"""Operator library (SURVEY.md §2.2-2.8 reference parity + §2.12
training-data extensions + scale primitives). Public API surface."""

from nextbus2pg_spark.operators.asof import (
    asof_join,
    asof_join_bucketed,
    asof_join_by_id,
)
from nextbus2pg_spark.operators.components import (
    connected_components,
    dedup_corpus,
)
from nextbus2pg_spark.operators.dedup import (
    dedup_groups,
    exact_dedup,
    jaccard_pairs,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
    word_shingles,
)
from nextbus2pg_spark.operators.joins import (
    broadcast_lookup,
    first_per_group,
    top1_per_group,
    two_level_fallback,
)
from nextbus2pg_spark.operators.layout import (
    morton_interleave,
    quantize,
    zorder_layout,
)
from nextbus2pg_spark.operators.keyed_write import (
    append_dedup,
    insert_if_absent,
    upsert_batch,
)
from nextbus2pg_spark.operators.multimodal import (
    extract_features,
    fake_media_from_documents,
    frame_sample,
    perceptual_hash,
    phash_pairs,
)
from nextbus2pg_spark.operators.curation import (
    cap_per_group,
    chunk_documents,
    bloom_decontaminate,
    decontaminate,
    deterministic_sample,
    hash_bucket,
    language_balance,
    line_dedup,
    pack_sequences,
    stratified_sample,
    train_test_split,
    winsorize,
)
from nextbus2pg_spark.operators.metrics import observe_stream, observed
from nextbus2pg_spark.operators.quality import (
    enforce,
    fk_violations,
    profile,
    quarantine_split,
    run_checks,
)
from nextbus2pg_spark.operators.sketch import kmv_distinct, kmv_hash
from nextbus2pg_spark.operators.scale import (
    count_exchanges,
    ensure_min_parallelism,
    key_skew_profile,
    salted_agg,
    salted_join,
    write_bucketed,
    write_partitioned,
)
from nextbus2pg_spark.operators.textstats import (
    build_vocab,
    ngram_counts,
    tfidf,
    top_terms_per_doc,
)
from nextbus2pg_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_vectorized,
    ivf_topk,
    ivfpq_topk,
    lsh_topk,
    pq_encode,
    pq_topk,
    pq_train,
)
from nextbus2pg_spark.operators.scd2 import (
    scd2_as_of,
    scd2_bootstrap,
    scd2_merge,
)
from nextbus2pg_spark.operators.spatial import (
    grid_nearest_join,
    within_radius_join,
)
from nextbus2pg_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_features,
    repetition_features,
    scrub_pii,
    token_count,
)

__all__ = [
    "asof_join",
    "asof_join_bucketed",
    "asof_join_by_id",
    "connected_components",
    "dedup_corpus",
    "dedup_groups",
    "exact_dedup",
    "jaccard_pairs",
    "lsh_bands",
    "lsh_candidate_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "simhash",
    "word_shingles",
    "broadcast_lookup",
    "first_per_group",
    "top1_per_group",
    "two_level_fallback",
    "append_dedup",
    "insert_if_absent",
    "upsert_batch",
    "morton_interleave",
    "quantize",
    "zorder_layout",
    "extract_features",
    "fake_media_from_documents",
    "frame_sample",
    "perceptual_hash",
    "phash_pairs",
    "grid_nearest_join",
    "within_radius_join",
    "scd2_as_of",
    "scd2_bootstrap",
    "scd2_merge",
    "kmv_distinct",
    "kmv_hash",
    "build_vocab",
    "count_exchanges",
    "ensure_min_parallelism",
    "key_skew_profile",
    "salted_agg",
    "salted_join",
    "write_bucketed",
    "write_partitioned",
    "cap_per_group",
    "chunk_documents",
    "bloom_decontaminate",
    "decontaminate",
    "deterministic_sample",
    "hash_bucket",
    "language_balance",
    "line_dedup",
    "pack_sequences",
    "stratified_sample",
    "train_test_split",
    "winsorize",
    "observed",
    "observe_stream",
    "enforce",
    "fk_violations",
    "profile",
    "quarantine_split",
    "run_checks",
    "ngram_counts",
    "tfidf",
    "top_terms_per_doc",
    "cosine_topk",
    "cosine_topk_vectorized",
    "ivfpq_topk",
    "pq_encode",
    "pq_topk",
    "pq_train",
    "ivf_topk",
    "lsh_topk",
    "fingerprint",
    "lang_id",
    "quality_features",
    "repetition_features",
    "scrub_pii",
    "token_count",
]
