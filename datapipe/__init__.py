"""datapipe — large-scale training-data pipeline operators on Spark.

Companion package to sparkfts: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + LSH/IVF-bucketed ANN), text analysis (language-ID,
quality scoring, token counting, fingerprinting), corpus curation
(13-gram benchmark decontamination, PII redaction, deterministic
hash/stratified sampling), training-sequence packing (GPT-style
concat-and-cut) + Gopher repetition signals, and multimodal binary
plumbing with REAL pure-numpy PPM/PNG/baseline-JPEG codecs. Everything
is DataFrame-first; hash primitives are md5-hex so an ANSI-SQL oracle
can reproduce them bit-for-bit.
"""
from .curate import (clean_corpus, contamination, decontaminate,
                     hash_sample, redact_pii, stratified_hash_sample)
from .dedup import (dedup_corpus, dup_groups, duplicated_spans,
                    embedding_dup_pairs, exact_dedup, jaccard_pairs,
                    minhash_lsh_pairs, minhash_signatures, simhash,
                    strip_duplicate_spans)
from .bpe import (bpe_encode, bpe_encode_ids, bpe_vocab, learn_merges,
                  load_merges, save_merges, train_bpe, word_histogram)
from .packing import pack_sequences
from .similarity import (AnnIndex, build_ann, build_ann_append,
                         cosine_topk, ivf_topk, lsh_topk,
                         sample_centroid_ids, train_centroids)
from .textstats import (bpe_token_estimate, fingerprint, lang_id,
                        quality_score, repetition_stats, token_count,
                        winnow_fingerprints)

__all__ = [
    "clean_corpus", "contamination", "decontaminate", "hash_sample", "redact_pii",
    "stratified_hash_sample",
    "dedup_corpus", "dup_groups", "embedding_dup_pairs", "exact_dedup",
    "jaccard_pairs", "minhash_lsh_pairs", "minhash_signatures", "simhash",
    "duplicated_spans", "strip_duplicate_spans",
    "AnnIndex", "build_ann", "build_ann_append",
    "cosine_topk", "ivf_topk", "lsh_topk", "sample_centroid_ids",
    "train_centroids",
    "bpe_token_estimate", "fingerprint", "lang_id", "quality_score",
    "repetition_stats", "token_count", "winnow_fingerprints",
    "pack_sequences",
    "bpe_encode", "bpe_encode_ids", "bpe_vocab", "learn_merges",
    "load_merges", "save_merges", "train_bpe", "word_histogram",
]
