"""Event sessionization — gap-based session windows.

A training-data pipeline over event logs needs per-session grouping
(dedup of interaction bursts, per-session feature rows). Spark-first:
the built-in ``session_window`` (dynamic gap windows, JVM-side state
merging) — one shuffle on the user key, sessions merge map-side; the
same operator runs under Structured Streaming with a watermark
(tests/test_ops TestSessionize exercises streaming == batch).
Semantics, pinned by test: an event extends its session while it
starts within ``gap`` of the previous event INCLUSIVE (an event
exactly ``gap`` later still merges; break only at diff > gap) — the
SQL lag/cumsum oracle formulation uses the matching strict break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    value_col: str = "value",
    include_end: bool = False,
) -> DataFrame:
    """Per-(user, session) aggregate: session_start, n_events,
    sum_value. Session id is implicit in (user, session_start);
    ``include_end`` adds the session_window end (last event + gap —
    what a streaming watermark must pass to close the session)."""
    agg = (
        events.groupBy(user_col, F.session_window(F.col(ts_col), gap))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
    )
    cols = [user_col, "session_start", "n_events", "sum_value"]
    if include_end:
        agg = agg.withColumn("session_end", F.col("session_window.end"))
        cols.append("session_end")
    return agg.select(*cols)


def streaming_sessionize(
    events_stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    value_col: str = "value",
) -> DataFrame:
    """The same session aggregate under Structured Streaming: sessions
    merge in the state store as events arrive and EMIT exactly once
    (append mode) when the event-time watermark passes session end —
    bounded state, late events within the watermark still merge."""
    events_stream = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return sessionize(
        events_stream.withWatermark(ts_col, watermark),
        user_col, ts_col, gap, value_col, include_end=True,
    )
