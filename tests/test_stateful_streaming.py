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
