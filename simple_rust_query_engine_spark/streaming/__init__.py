"""Structured Streaming (beyond reference parity — SURVEY §2.9)."""

from . import events, sink

__all__ = ["events", "sink"]
