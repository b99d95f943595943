"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming (SURVEY §2.12); its `events`-style
append workloads motivate the canonical stateful extension: gap-based
**sessionization** — group events per key into sessions that close after
``gap_seconds`` of inactivity.  Expressed Spark-first:

- per-key state = the one *open* session (start, last-seen, count) —
  O(distinct live keys), stored in the state store, never on the driver;
- sessions that already closed *inside* a micro-batch are emitted
  immediately (append mode);
- the open session closes via an **event-time timeout** once the
  watermark passes ``last_seen + gap`` — late data within the watermark
  still extends the correct session.

At scale this shuffles once per micro-batch on the session key, the
same shape as any streaming aggregation; state is partitioned with the
keys across executors.

``sessionize_batch`` is the identical semantics on a static DataFrame
(lag → cumulative session ids → per-session agg), used as the oracle in
batch/stream parity tests and exposed for backfill jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_OUTPUT_SCHEMA = (
    "key string, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def sessionize_stream(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization of a streaming DataFrame.

    Returns an append-mode stream of closed sessions:
    (key, session_start, session_end, n_events).
    """
    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        def emit(rows):
            return pd.DataFrame(
                {
                    "key": [str(key[0])] * len(rows),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in rows],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in rows],
                    "n_events": [n for _, _, n in rows],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit([(start, last, n)])
            return

        # gather this batch's event times (as epoch micros), sorted
        ts = pd.concat([pdf[ts_col] for pdf in pdfs]).sort_values()
        micros = (ts.astype("int64") // 1000).to_list()
        if not micros:
            return

        open_session = state.get if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for t in micros:
            if open_session is None:
                open_session = (t, t, 1)
            elif t - open_session[1] > gap_us:
                closed.append(open_session)
                open_session = (t, t, 1)
            else:
                open_session = (open_session[0], t, open_session[2] + 1)

        state.update(open_session)
        # close the open session once the watermark passes last + gap
        timeout_ms = open_session[1] // 1000 + gap_seconds * 1000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield emit(closed)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def sessionize_batch(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Same session semantics on a static DataFrame (the parity oracle):
    a window-lag marks session starts, a running sum numbers sessions,
    one aggregation per (key, session) closes them.  Two shuffles (both
    on the key), no state store needed."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    epoch = F.col(ts_col).cast("double")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    sessions = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("_ts"),
        is_new.alias("_new"),
    ).withColumn(
        "_session", F.sum("_new").over(Window.partitionBy("key").orderBy("_ts"))
    )
    return (
        sessions.groupBy("key", "_session")
        .agg(
            F.min("_ts").alias("session_start"),
            F.max("_ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("key", "session_start", "session_end", "n_events")
    )
