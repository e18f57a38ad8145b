"""Structured Streaming surfaces (chunk-stream decode + windowed analytics)."""

from .stream import (  # noqa: F401
    stream_decode,
    stream_events_from_dir,
    windowed_event_counts,
)
