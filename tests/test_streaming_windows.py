"""Event-time windowing: batch == streaming on identical input, session
windows, and the applyInPandasWithState custom stateful operator."""

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark, tmp_path_factory):
    """Deterministic event stream: 60 events over 3 hours, 5 users,
    with gaps that create multiple sessions per user."""
    rows = []
    for i in range(60):
        rows.append({
            "event_id": i,
            "ts": f"2024-01-01 0{i // 25}:{(i * 7) % 60:02d}:00",
            "user_id": i % 5,
            "event_type": ["view", "click", "error"][i % 3],
            "value": round(0.5 * i, 2),
        })
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.to_timestamp("ts"))
    path = str(tmp_path_factory.mktemp("ev") / "events")
    df.repartition(3).write.parquet(path)
    return path, df


SCHEMA = ("event_id long, ts timestamp, user_id long, "
          "event_type string, value double")


class TestWindows:
    def test_batch_windowed_counts(self, spark, events):
        from tantivy_search_spark.streaming.windows import (
            windowed_event_counts)
        _, df = events
        out = windowed_event_counts(df, keys=["event_type"]).collect()
        # cross-check against a plain date_trunc aggregation
        want = {(r["h"], r["event_type"]): (r["n"], round(r["s"], 6))
                for r in df.groupBy(
                    F.date_trunc("hour", "ts").alias("h"), "event_type")
                .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
                .collect()}
        got = {(r["window_start"], r["event_type"]):
               (r["n_events"], r["value_sum"]) for r in out}
        assert got == want

    def test_stream_equals_batch(self, spark, events):
        from tantivy_search_spark.streaming.windows import (
            stream_windowed_counts, windowed_event_counts)
        path, df = events
        sdf = stream_windowed_counts(spark, path, SCHEMA,
                                     keys=["event_type"])
        q = (sdf.writeStream.format("memory").queryName("win_counts")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r["window_start"], r["event_type"]):
               (r["n_events"], r["value_sum"])
               for r in spark.sql("SELECT * FROM win_counts").collect()}
        want = {(r["window_start"], r["event_type"]):
                (r["n_events"], r["value_sum"])
                for r in windowed_event_counts(
                    df, keys=["event_type"]).collect()}
        assert got == want

    def test_sessionize(self, spark, events):
        from tantivy_search_spark.streaming.windows import sessionize
        _, df = events
        out = sessionize(df, gap="10 minutes").collect()
        # gaps-and-islands reference computed driver-side
        rows = sorted(
            ((r["user_id"], r["ts"], r["value"]) for r in df.collect()),
            key=lambda x: (x[0], x[1]))
        sessions = {}
        import datetime
        for uid, ts, v in rows:
            key = uid
            sess = sessions.setdefault(key, [])
            # session_window merges at the boundary (gap inclusive)
            if sess and (ts - sess[-1]["last"]).total_seconds() <= 600:
                cur = sess[-1]
                cur["last"] = ts
                cur["n"] += 1
                cur["s"] += v
            else:
                sess.append({"start": ts, "last": ts, "n": 1, "s": v})
        want = {(uid, s["start"]): (s["n"], round(s["s"], 6))
                for uid, ss in sessions.items() for s in ss}
        got = {(r["user_id"], r["session_start"]):
               (r["n_events"], r["value_sum"]) for r in out}
        assert got == want

    def test_running_user_state(self, spark, events):
        from tantivy_search_spark.streaming.windows import (
            running_user_state)
        path, df = events
        src = spark.readStream.schema(SCHEMA).parquet(path)
        out = running_user_state(src)
        q = (out.writeStream.format("memory").queryName("user_state")
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM user_state").collect()
        # final state per user (last update per user) == batch totals
        final = {}
        for r in rows:
            final[r["user_id"]] = (r["n_events"], r["value_sum"])
        want = {r["user_id"]: (r["n"], round(r["s"], 6)) for r in
                df.groupBy("user_id").agg(
                    F.count("*").alias("n"),
                    F.sum("value").alias("s")).collect()}
        assert final == want
