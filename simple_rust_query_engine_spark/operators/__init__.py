"""Relational operators (SURVEY.md §2 inventory)."""

from . import relational

__all__ = ["relational"]
