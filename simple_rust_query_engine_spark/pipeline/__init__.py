"""LLM training-data pipeline operators: dedup, similarity search,
text analysis, multimodal columns."""

from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
