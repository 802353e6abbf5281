"""LLM training-data pipeline operators: dedup, similarity search,
text analysis, retrieval, curation, batch layout, multimodal
columns."""

from . import clean, dedup, multimodal, pack, search, similarity, text

__all__ = [
    "clean",
    "dedup",
    "multimodal",
    "pack",
    "search",
    "similarity",
    "text",
]
