"""LLM-training-data pipeline operators: deduplication (exact, MinHash-
LSH, SimHash), text analysis (language ID, quality, tokenization,
fingerprinting), embedding similarity search (brute-force + SRP-bucketed
ANN), and multimodal binary-column plumbing.

These extend the reference's analytical surface with the data-curation
operators a 100 TB training-data pipeline needs; every operator is
bucketed/bounded (LSH band joins, hash groups) — never all-pairs.
"""
