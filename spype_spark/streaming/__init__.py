"""Structured Streaming jobs (SURVEY.md §2.B "Streaming", true variants).

Each job here is the unbounded twin of a batch analog in
:mod:`spype_spark.queries.streaming_batch`: same expressions, built on
``readStream`` with ``Trigger.AvailableNow`` so a finite Parquet input
drains deterministically and the result must equal the batch answer
once the watermark has passed everything (asserted in
tests/test_streaming.py).

Scale notes: all jobs keyed-partition their state (window×type, user),
use watermarks to bound state, and write through ``foreachBatch`` or a
sink — on a cluster the same code runs continuously with checkpointed
exactly-once sinks; AvailableNow is also the production backfill mode.
"""

from spype_spark.streaming.jobs import (
    run_stream_dedup,
    run_stream_stream_left_join,
    run_stream_stateful_tws,
    run_stream_session_window,
    run_stream_sliding,
    run_stream_stateful_running,
    run_stream_static_join,
    run_stream_stream_join,
    run_stream_tumbling,
)

__all__ = [
    "run_stream_tumbling",
    "run_stream_sliding",
    "run_stream_session_window",
    "run_stream_dedup",
    "run_stream_stateful_running",
    "run_stream_static_join",
    "run_stream_stream_join",
    "run_stream_stream_left_join",
    "run_stream_stateful_tws",
]
