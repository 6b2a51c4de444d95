"""Structured Streaming surface (SURVEY.md §2.B rows 62-64).

True ``readStream`` jobs with watermarks, checkpoints, and the
availableNow trigger. These are rows-only checked — their window
semantics are proven by the batch twins in queries/winbatch.py.
"""

from builder_spark.streaming.jobs import (
    run_stream_to_df,
    stream_events,
)

__all__ = ["run_stream_to_df", "stream_events"]
