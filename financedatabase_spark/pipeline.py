"""One-stop surface for the training-data pipeline operators.

The finance/reference API lives in ``financedatabase_spark.api``; this
module collects the corpus-curation side — everything a 100 TB
pretraining-data pipeline runs between raw scrape and data loader:

    quality/text   doc_stats, lang_id, quality_score, pii_redact
    dedup          exact_dedup, minhash_lsh_dedup, simhash_near_dups,
                   jaccard_pairs, connected components (dedup_clusters)
    similarity     cosine_topk, ivf_topk, ivf_multiprobe_topk,
                   kmeans_refine (codebook training), scalar_quantize_int8,
                   hard_negative_mining (contrastive corpus prep)
    decontam       contamination_pairs (train-vs-benchmark n-gram overlap)
    sampling       deterministic_sample, stratified_sample,
                   fixed_size_sample, dataset_split, token_shard_packing
    multimodal     attach_media_meta, decode_features (+ default_decode)

Every operator is DataFrame-in/DataFrame-out and composes lazily into a
single Catalyst plan; each is driver-verified bit-exact against a DuckDB
oracle (see plans/queries_documents.py for the registered twins).
"""

from __future__ import annotations

from financedatabase_spark.operators.dedup_docs import (
    connected_components,
    contamination_pairs,
    exact_dedup,
    grouped_components,
    jaccard_pairs,
    minhash_lsh_dedup,
    shingle_table,
    simhash_near_dups,
)
from financedatabase_spark.operators.multimodal import (
    attach_media_meta,
    decode_features,
    default_decode,
    dispatch_decode,
    fake_decode,
    frame_sample_plan,
    synth_wav,
    wav_decode,
)
from financedatabase_spark.operators.retrieval import bm25_topk, rrf_fuse
from financedatabase_spark.operators.sampling import (
    dataset_split,
    deterministic_sample,
    deterministic_shuffle,
    fixed_size_sample,
    stratified_sample,
    token_shard_packing,
)
from financedatabase_spark.operators.similarity import (
    cell_centroids,
    cosine_topk,
    dequantize_int8,
    embedding_near_dups,
    hard_negative_mining,
    ivf_multiprobe_topk,
    ivf_topk,
    kmeans_refine,
    scalar_quantize_int8,
)
from financedatabase_spark.operators.text import (
    bpe_token_count,
    doc_hash,
    doc_stats,
    lang_id,
    pii_counts,
    pii_redact,
    quality_score,
    winnow_overlap_pairs,
    with_document_chunks,
    with_fingerprint,
    with_ngram_repetition,
    with_winnow_fingerprints,
    with_word_ngrams,
    word_shingles,
    ws_token_count,
)

__all__ = [
    # text / quality
    "doc_stats", "lang_id", "quality_score", "ws_token_count",
    "bpe_token_count", "doc_hash", "word_shingles", "pii_redact",
    "pii_counts", "with_word_ngrams", "with_winnow_fingerprints",
    "with_ngram_repetition", "with_fingerprint", "winnow_overlap_pairs",
    "with_document_chunks",
    # dedup
    "exact_dedup", "minhash_lsh_dedup", "simhash_near_dups",
    "jaccard_pairs", "shingle_table", "connected_components",
    "grouped_components", "contamination_pairs",
    # retrieval
    "bm25_topk", "rrf_fuse",
    # similarity / embeddings
    "cosine_topk", "ivf_topk", "ivf_multiprobe_topk", "cell_centroids",
    "kmeans_refine", "embedding_near_dups", "hard_negative_mining",
    "scalar_quantize_int8", "dequantize_int8",
    # sampling / layout
    "deterministic_sample", "stratified_sample", "fixed_size_sample",
    "dataset_split", "token_shard_packing", "deterministic_shuffle",
    # multimodal
    "attach_media_meta", "decode_features", "default_decode",
    "dispatch_decode", "synth_wav", "wav_decode",
    "fake_decode", "frame_sample_plan",
]
