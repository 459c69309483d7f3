"""Structured Streaming surface (SURVEY §2.9; task brief "Structured
Streaming for streams")."""

from .windowed import (  # noqa: F401
    read_events_stream,
    hourly_counts_stream,
    session_counts_stream,
    dedup_events_stream,
    interval_join_stream,
    stateful_user_counts,
    run_to_memory,
)
from .neardup import (  # noqa: F401
    simhash_banded_stream,
    neardup_flags_stream,
)
