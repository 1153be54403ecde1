"""Custom operators the engine adds on top of built-in DataFrame ops:
as-of join, dedup family (exact/minhash/simhash/ngram/embedding),
similarity search, text analysis, multimodal column plumbing."""
