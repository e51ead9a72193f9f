"""Structured Streaming surface (engine extension).

The reference is strictly batch (SURVEY §2.J); this package adds the
streaming ingestion path a live statement/event feed would use:
file-source ``readStream`` → event-time windows (tumbling / sliding /
session) with watermarked late-data handling.  Every aggregation is
defined once over a plain DataFrame, so the identical code runs in
batch (for oracles/backfill) and streaming (for the live path) — the
batch/stream equivalence is asserted in tests/test_streaming.py.
"""

from .windows import (  # noqa: F401
    event_time,
    events_stream,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
