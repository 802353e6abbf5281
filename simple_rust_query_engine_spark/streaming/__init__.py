"""Structured Streaming (beyond reference parity — SURVEY §2.9)."""

from . import events

__all__ = ["events"]
