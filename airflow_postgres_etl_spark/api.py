"""User-facing engine facade.

A user of the reference drives three surfaces (SURVEY §3): the two ETL
DAGs and interactive SQL on the loaded tables.  :class:`Engine` exposes the
same three in one object:

>>> eng = Engine()                               # or Engine(spark)
>>> eng.ingest("data/extracted", "out/")         # both DAGs, incremental
>>> eng.sql("SELECT count(*) FROM events")       # interactive SQL
>>> eng.query("q3_rank_event_types", sf_dir)     # named query library
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .pipeline import incremental_load
from .plans import ORACLE, QUERIES
from .session import get_spark
from .sources.parquet_source import register_views


class Engine:
    def __init__(self, spark: SparkSession | None = None) -> None:
        self.spark = spark or get_spark()

    # -- ETL surface (reference entry points A+B) ---------------------------
    def ingest(self, csv_dir: str, out_dir: str) -> dict[str, int]:
        """Incremental CSV→tracking/events load into parquet mirrors under
        ``out_dir`` (replace-by-key, high-water-mark incremental)."""
        counts = incremental_load(
            self.spark,
            csv_dir,
            os.path.join(out_dir, "tracking"),
            os.path.join(out_dir, "events"),
        )
        # keep the SQL surface in sync with the freshly loaded tables
        # (read_keyed_table hides the sink's internal bucket column)
        from .sink import read_keyed_table

        for name in ("tracking", "events"):
            path = os.path.join(out_dir, name)
            if os.path.isdir(path):
                read_keyed_table(self.spark, path).createOrReplaceTempView(name)
        return counts

    # -- SQL surface (reference entry point C) ------------------------------
    def sql(self, statement: str) -> DataFrame:
        return self.spark.sql(statement)

    def register_testdata(self, sf_dir: str) -> None:
        register_views(self.spark, sf_dir)

    # -- named query library -------------------------------------------------
    def query(self, name: str, sf_dir: str) -> DataFrame:
        return QUERIES[name](self.spark, sf_dir)

    def queries(self) -> list[str]:
        return sorted(QUERIES)

    def oracle(self, name: str) -> str | None:
        return ORACLE.get(name)

    # -- streaming surface ----------------------------------------------------
    def stream_ingest(self, csv_dir: str, out_dir: str, checkpoint_dir: str):
        """Continuous variant of :meth:`ingest`: file-source checkpoint as
        the high-water mark, replace-by-key merge per micro-batch."""
        from .streaming import stream_ingest

        return stream_ingest(
            self.spark,
            csv_dir,
            os.path.join(out_dir, "tracking"),
            os.path.join(out_dir, "events"),
            checkpoint_dir,
        )

    def stream_dedup_ingest(
        self,
        docs_dir: str,
        out_dir: str,
        checkpoint_dir: str,
        *,
        threshold: float = 0.5,
    ):
        """Continuous corpus acquisition with cross-batch near-dup
        filtering: accepted docs land in ``<out_dir>/corpus``, their LSH
        bands in ``<out_dir>/index`` (the dedup state)."""
        from .streaming import stream_dedup_ingest

        return stream_dedup_ingest(
            self.spark,
            docs_dir,
            os.path.join(out_dir, "index"),
            os.path.join(out_dir, "corpus"),
            checkpoint_dir,
            threshold=threshold,
        )

    def stream_training_ingest(
        self,
        docs_dir: str,
        bench_grams_path: str,
        rates_ppm: dict[str, int],
        out_dir: str,
        checkpoint_dir: str,
    ):
        """Continuous training-corpus acquisition: per micro-batch
        quality gate → 13-gram benchmark decontamination (against the
        grams materialized by ``streaming.build_benchmark_grams``) →
        per-source temperature-mixing keep filter.  Stateless across
        batches — batch-wise equals batch-job-over-the-union."""
        from .streaming import stream_training_ingest

        return stream_training_ingest(
            self.spark,
            docs_dir,
            bench_grams_path,
            rates_ppm,
            out_dir,
            checkpoint_dir,
        )
