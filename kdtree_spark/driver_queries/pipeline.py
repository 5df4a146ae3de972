"""Training-data pipeline queries over documents/embeddings (filled in
incrementally): dedup, similarity search, text analysis, multimodal."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
