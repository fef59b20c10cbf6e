"""applyInPandasWithState: state must persist across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.sources.parquet_source import load_table
from airflow_postgres_etl_spark.streaming.stateful import running_user_totals

from .conftest import SF_SMOKE


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    # two separate files → two micro-batches under maxFilesPerTrigger=1
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "stream_src")
    half1.coalesce(1).write.mode("overwrite").parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(half1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # final state per user (last update wins) == batch totals
    result = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n_events DESC
            ) AS rn FROM running_totals
        ) WHERE rn = 1
        """
    )
    got = {r.user_id: (r.n_events, round(r.total_value, 4)) for r in result.collect()}
    exp = {
        r.user_id: (r.n, round(r.s, 4))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == exp
    # state genuinely crossed batches: some user present in both halves
    both = (
        half1.select("user_id").intersect(half2.select("user_id")).count()
    )
    assert both > 0


def test_event_time_timeout_closes_idle_sessions(spark, tmp_path):
    """EventTimeTimeout expiry: when the watermark passes an idle
    session's last event + gap, the session emits closed=True and its
    state is removed — three micro-batches drive the watermark forward
    deterministically (event time, no wall-clock sleeps)."""
    import datetime as dt

    from airflow_postgres_etl_spark.streaming.stateful import (
        user_sessions_with_timeout,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(rows, mode):
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        df.coalesce(1).write.mode(mode).parquet(str(tmp_path / "src"))

    # batch 1: user 1's session (two events, 10 s apart)
    write_batch([(1, t0), (1, t0 + dt.timedelta(seconds=10))], "overwrite")
    # batch 2: user 2, two hours later — advances the watermark past
    # user 1's (last event + 30 min) timeout for batch 3's processing
    write_batch([(2, t0 + dt.timedelta(hours=2))], "append")
    # batch 3: user 3, later still — the batch in which user 1 times out
    write_batch([(3, t0 + dt.timedelta(hours=3))], "append")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    q = (
        user_sessions_with_timeout(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None

    rows = spark.sql("SELECT * FROM sessions").collect()
    closed = {r.user_id: r for r in rows if r.closed}
    # user 1 times out in batch 3; user 2 in the final no-data batch
    # availableNow runs with the end-of-input watermark (t0+3h − 10 min
    # > its t0+2h30m timeout).  User 3's timeout is beyond the final
    # watermark, so it must still be OPEN — its state survived.
    assert set(closed) == {1, 2}
    assert closed[1].n_events == 2
    assert closed[1].session_start == t0
    assert closed[1].session_end == t0 + dt.timedelta(seconds=10)
    # every user emitted at least one open running update
    open_users = {r.user_id for r in rows if not r.closed}
    assert open_users == {1, 2, 3}
