"""LLM-training-data pipeline operators over `documents` / `embeddings`.

Populated incrementally: dedup (exact / minhash-LSH / simhash / n-gram
Jaccard), similarity search (brute-force + LSH-bucketed cosine top-k),
text analysis (lang-id, quality, token counts, fingerprints).
"""

from __future__ import annotations
