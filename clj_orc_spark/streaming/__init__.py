"""Structured Streaming surfaces (chunk-stream decode + windowed analytics)."""

from .stateful import running_event_totals, stream_running_totals  # noqa: F401
from .stream import (  # noqa: F401
    stream_decode,
    stream_encode,
    stream_events_from_dir,
    windowed_event_counts,
)
