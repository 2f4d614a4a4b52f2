"""LLM-training-data pipeline operators: dedup, text analysis,
similarity search, multimodal columns.

These go beyond the reference's own surface (BASELINE.json north-star):
every operator is designed for the 100 TB path — built-in JVM
expressions wherever possible, Arrow-batched Pandas UDFs only where
semantics demand Python, and LSH-style candidate generation instead of
all-pairs scans.
"""

from .bpe import apply_bpe, train_bpe_merges, word_frequencies
from .web import (
    html_to_text,
    parse_warc_records,
    read_warc,
    read_warc_stream,
    url_features,
    url_filter,
    warc_to_documents,
)
from .graph import extract_links, host_edges, pagerank
from .multimodal import image_dhash, media_near_dedup
from .dsir import dsir_resample, dsir_weights, train_dsir_model
from .jsonl import read_jsonl, write_jsonl
from .report import corpus_report, dup_rate, format_dataset_card
from .webdataset import read_tar_shards, samples_from_members, write_tar_shards
from .classify import (
    nb_classify,
    nb_predict,
    nb_train,
    quality_classifier_score,
    train_quality_classifier,
)
from .clean import (
    c4_clean,
    gopher_quality_flags,
    gopher_repetition_flags,
    normalize_text,
)
from .curate import curate_corpus
from .drift import psi_report
from .embed import pca_project, pca_project_expr, pca_train
from .lm import (
    perplexity_buckets,
    perplexity_score,
    train_bigram_lm,
    train_trigram_lm,
    trigram_perplexity_score,
)
from .decontaminate import corpus_overlap, decontaminate, ngram_overlap, semantic_overlap
from .dedup import (
    connected_components,
    hamming_near_dup_pairs,
    dedup_by_clusters,
    duplicate_spans,
    remove_duplicate_spans,
    similarity_join,
    exact_dedup,
    incremental_dedup,
    release_cached,
    line_dedup,
    write_dedup_index,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    read_dedup_index,
    simhash,
)
from .sample import (
    cap_per_group,
    plan_mixture,
    split_corpus,
    deterministic_sample,
    importance_sample,
    stratified_sample,
    temperature_mixture_rates,
    temperature_sample,
)
from .search import bm25_batch, bm25_scores, bm25_topk, build_term_index
from .pii import pii_counts, pseudonymize, redact_pii, scrub_pii
from .shard import assign_shards, shard_lane, write_sharded
from .similarity import (
    assign_ivf_cells,
    brute_force_cosine_topk,
    ivf_ann,
    ivf_lloyd_step,
    ivf_pq_search,
    lsh_bucket_ann,
    mine_hard_negatives,
    pq_encode,
    kmeans_parallel_init,
    pq_pack_codes,
    pq_search,
    pq_train_codebooks,
    semantic_dedup,
    semantic_dedup_survivors,
    train_ivf_codebook,
)
from .text import (
    chunk_documents,
    document_fingerprint,
    language_id,
    pack_chunks,
    quality_score,
    token_count,
)

__all__ = [
    "exact_dedup",
    "hamming_near_dup_pairs",
    "image_dhash",
    "media_near_dedup",
    "line_dedup",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash",
    "ngram_jaccard_pairs",
    "connected_components",
    "dedup_by_clusters",
    "brute_force_cosine_topk",
    "lsh_bucket_ann",
    "ivf_ann",
    "mine_hard_negatives",
    "ivf_lloyd_step",
    "assign_ivf_cells",
    "train_ivf_codebook",
    "token_count",
    "quality_score",
    "language_id",
    "document_fingerprint",
    "chunk_documents",
    "pack_chunks",
    "ngram_overlap",
    "decontaminate",
    "corpus_overlap",
    "semantic_overlap",
    "curate_corpus",
    "pii_counts",
    "redact_pii",
    "scrub_pii",
    "shard_lane",
    "assign_shards",
    "write_sharded",
    "semantic_dedup",
    "semantic_dedup_survivors",
    "bm25_scores",
    "bm25_topk",
    "nb_train",
    "nb_predict",
    "nb_classify",
    "read_warc",
    "parse_warc_records",
    "html_to_text",
    "warc_to_documents",
    "read_warc_stream",
    "url_features",
    "url_filter",
    "extract_links",
    "host_edges",
    "pagerank",
    "train_dsir_model",
    "dsir_weights",
    "dsir_resample",
    "read_jsonl",
    "write_jsonl",
    "corpus_report",
    "dup_rate",
    "format_dataset_card",
    "write_tar_shards",
    "read_tar_shards",
    "samples_from_members",
    "train_quality_classifier",
    "quality_classifier_score",
    "duplicate_spans",
    "remove_duplicate_spans",
    "similarity_join",
    "pq_train_codebooks",
    "pq_encode",
    "kmeans_parallel_init",
    "pq_pack_codes",
    "pq_search",
    "deterministic_sample",
    "importance_sample",
    "stratified_sample",
    "temperature_mixture_rates",
    "temperature_sample",
    "plan_mixture",
    "cap_per_group",
    "split_corpus",
    "incremental_dedup",
    "release_cached",
    "write_dedup_index",
    "build_term_index",
    "bm25_batch",
    "ivf_pq_search",
    "train_bpe_merges",
    "apply_bpe",
    "word_frequencies",
    "pseudonymize",
    "psi_report",
    "gopher_quality_flags",
    "gopher_repetition_flags",
    "c4_clean",
    "normalize_text",
    "train_bigram_lm",
    "perplexity_score",
    "perplexity_buckets",
    "train_trigram_lm",
    "trigram_perplexity_score",
    "pca_train",
    "pca_project",
    "pca_project_expr",
    "read_dedup_index",
]
