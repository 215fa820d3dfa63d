"""LLM-training-data pipeline operators (beyond-reference, SURVEY §7.1 M6).

- :mod:`textstats`   — tokenization, quality scoring, language ID,
  document fingerprinting
- :mod:`dedup`       — exact, n-gram Jaccard, MinHash+LSH, SimHash,
  embedding-cosine near-dup
- :mod:`similarity`  — cosine top-k (brute force + LSH-bucketed)
- :mod:`multimodal`  — opaque binary columns with typed metadata and
  stubbed decode/feature UDF plumbing
"""
