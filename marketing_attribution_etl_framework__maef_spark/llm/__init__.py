"""LLM-training-data pipeline operators (the north-star extension
layer, BASELINE.json): deduplication, similarity search, text
analysis, and multimodal-column plumbing over the driver's
``documents`` / ``embeddings`` tables.

Everything except the multimodal decode stubs is pure
``pyspark.sql.functions`` column algebra — no Python UDFs anywhere in
a hot path, so the whole layer runs inside whole-stage codegen and is
DuckDB-oracle-checkable. Hashing is md5-based so both engines compute
bit-identical signatures.

Modules:
- ``text``: normalization, tokenization, shingling, text statistics,
  quality scoring, language-ID heuristic, winnowing fingerprints.
- ``dedup``: exact (normalized-hash), MinHash-LSH (banded candidate
  generation — never all-pairs), SimHash (byte-banded), and blocked
  exact n-gram-Jaccard as the small-scale baseline.
- ``similarity``: cosine top-k (brute-force baseline; IVF with fixed
  or spherical-k-means centroids; single- and multiprobe sign-LSH),
  embedding near-duplicate pairs.
- ``multimodal``: binary-column plumbing with Arrow-batched feature
  extraction (decode stubbed — codec libs are not in this container).
"""
