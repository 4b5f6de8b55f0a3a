"""Structured Streaming wrap: checkpointed exactly-once ingest +
watermarked event-time aggregation (see ``pipeline``)."""

from .pipeline import (  # noqa: F401
    run_ingest_stream,
    run_windowed_stream,
    windowed_event_counts,
)
