"""datapipe — large-scale training-data pipeline operators on Spark.

Companion package to sparkfts: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + LSH/IVF-bucketed ANN), text analysis (language-ID,
quality scoring, token counting, fingerprinting), corpus curation
(13-gram benchmark decontamination, PII redaction, deterministic
hash/stratified sampling), and multimodal binary plumbing. Everything
is DataFrame-first; hash primitives are md5-hex so an ANSI-SQL oracle
can reproduce them bit-for-bit.
"""
