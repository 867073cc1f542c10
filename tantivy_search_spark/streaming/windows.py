"""Event-time windowing and stateful streaming operators.

The same window expressions run in BATCH and STREAMING mode — the
batch form is what the driver-contract oracles check (tumbling windows
== date_trunc grouping, session windows == gaps-and-islands in SQL),
and the streaming tests run the identical plans through
``readStream`` + watermark + ``availableNow``.

* windowed_event_counts — tumbling/sliding event-time aggregation
* sessionize            — per-key session windows (gap timeout)
* stream_windowed_counts — readStream wrapper: watermark + window agg
* running_user_state    — applyInPandasWithState custom stateful
                          operator (per-user running count/sum that
                          survives across micro-batches)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling (or sliding) event-time aggregation: one row per
    (window, keys) with count and value sum.  Pure built-in exprs —
    map-side partial aggregation, one shuffle on (window, keys)."""
    w = F.window(F.col(ts_col), window, slide) if slide \
        else F.window(F.col(ts_col), window)
    gb = [w] + [F.col(k) for k in (keys or [])]
    return (
        df.groupBy(*gb)
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(value_col), 6).alias("value_sum"))
        .select(F.col("window.start").alias("window_start"),
                *(keys or []), "n_events", "value_sum")
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "5 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Per-key session windows: events closer than ``gap`` chain into
    one session (F.session_window — native, streaming-capable).
    Output: key, session_start, n_events, value_sum."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap),
                   F.col(key_col))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(value_col), 6).alias("value_sum"))
        .select(F.col(key_col),
                F.col("session_window.start").alias("session_start"),
                "n_events", "value_sum")
    )


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """readStream(parquet dir) -> watermark -> the SAME windowed
    aggregation as the batch form.  The watermark bounds state for
    late data; append output emits a window once the watermark passes
    its end."""
    src = (spark.readStream.schema(schema).parquet(source_dir)
           .withWatermark(ts_col, watermark))
    return windowed_event_counts(src, ts_col, window, None, keys,
                                 value_col)


def running_user_state(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key
    running event count and value sum carried across micro-batches.
    The task's 'custom stateful operators' pattern — state is a
    (count, sum) pair per user; each batch emits the updated totals."""
    from pyspark.sql.streaming.state import GroupState

    import pandas as pd

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "value_sum": [round(s, 6)]})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, value_sum double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=timeout,
    )
