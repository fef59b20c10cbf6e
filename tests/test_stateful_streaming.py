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

def test_streaming_time_weighted_equals_batch(spark, tmp_path):
    """Streamed LOCF integral == the batch q_time_weighted_avg over the
    union, BIT-FOR-BIT on the exact-integer accumulators (span_us, wv,
    n_events) — three time-ordered micro-batches, state crossing all of
    them.  Also pins the ordering contract: a late event raises."""
    import datetime as dt

    from airflow_postgres_etl_spark.plans.extensions import (
        q_time_weighted_avg,
    )
    from airflow_postgres_etl_spark.streaming.stateful import (
        streaming_time_weighted,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    # time-ordered thirds → per-user in-order arrival across batches
    with_us = events.withColumn(
        "t_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    q1, q2 = with_us.approxQuantile("t_us", [0.33, 0.66], 0.0)
    src = str(tmp_path / "src")
    with_us.filter(F.col("t_us") <= q1).drop("t_us").coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    with_us.filter((F.col("t_us") > q1) & (F.col("t_us") <= q2)).drop(
        "t_us"
    ).coalesce(1).write.mode("append").parquet(src)
    with_us.filter(F.col("t_us") > q2).drop("t_us").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_time_weighted(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("twa_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None

    got = {
        r.user_id: (r.n_events, r.span_us, r.wv, r.twa)
        for r in spark.sql(
            """
            SELECT user_id, n_events, span_us, wv, twa FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY n_events DESC
                ) AS rn FROM twa_stream
            ) WHERE rn = 1
            """
        ).collect()
    }
    # exact expected accumulators: the batch query's own window+agg,
    # stopped BEFORE the final division so wv stays an exact BIGINT
    # (reconstructing wv from twa*span is lossy once wv > 2^53)
    from pyspark.sql.window import Window

    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = events.select(
        "user_id",
        t_us.alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
        F.lead(t_us).over(w).alias("nxt_us"),
    )
    dur = F.col("nxt_us") - F.col("t_us")
    acc = {
        r.user_id: (r.n, r.span, r.wv)
        for r in stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dur).alias("span"),
            F.sum(F.col("v_c") * dur).alias("wv"),
        )
        .filter(F.col("span") > 0)
        .collect()
    }
    batch = q_time_weighted_avg(spark, SF_SMOKE)
    exp = {}
    for r in batch.collect():
        n, span, wv = acc[r.user_id]
        assert (n, span) == (r.n_events, r.span_us)
        exp[r.user_id] = (r.n_events, r.span_us, wv, r.twa)
    for uid, (n, span, wv, twa) in exp.items():
        gn, gspan, gwv, gtwa = got[uid]
        assert (gn, gspan, gwv) == (n, span, wv), uid
        assert gtwa == twa, uid
    # single-event users appear in the stream output (no span) but are
    # excluded by the batch query's HAVING — they must carry NULL twa
    singles = set(got) - set(exp)
    for uid in singles:
        assert got[uid][1] == 0 and got[uid][3] is None

    # ordering contract: a batch 2 event OLDER than the user's batch 1
    # frontier is detected, not silently absorbed into the integral
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    late_src = str(tmp_path / "late_src")

    def write(rows, mode):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        ).coalesce(1).write.mode(mode).parquet(late_src)

    write([(1, t0, 7, 1.0)], "overwrite")
    write([(2, t0 - dt.timedelta(minutes=5), 7, 2.0)], "append")
    lq = (
        streaming_time_weighted(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(late_src)
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("twa_late")
        .option("checkpointLocation", str(tmp_path / "late_ck"))
        .trigger(availableNow=True)
        .start()
    )
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="out-of-order"):
        lq.awaitTermination(120)

    # NULL-value contract: NaN would silently float the int64 integral
    null_src = str(tmp_path / "null_src")
    spark.createDataFrame(
        [(1, t0, 9, None)],
        "event_id long, ts timestamp, user_id long, value double",
    ).coalesce(1).write.mode("overwrite").parquet(null_src)
    nq = (
        streaming_time_weighted(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(null_src)
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("twa_null")
        .option("checkpointLocation", str(tmp_path / "null_ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="NULL ts/value"):
        nq.awaitTermination(120)
