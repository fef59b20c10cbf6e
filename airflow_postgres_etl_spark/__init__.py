"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL (``galvsoliveira/airflow-postgres-etl``).

Built from scratch, Spark-first: lazy DataFrame logical plans optimized by
Catalyst, Tungsten columnar execution — not a port of the reference's eager
pandas pipeline.  See SURVEY.md for the operator-by-operator mapping.

Layout
------
``session``     SparkSession factory (UTC, AQE, Arrow).
``schemas``     Pinned input/output schemas (reference §1.1/§1.2 + testdata).
``sources``     CSV dir scan w/ lineage, parquet testdata loader, JDBC helpers.
``operators``   Ingest transform chain (T1–T13), dedup, similarity, text ops.
``functions``   Literal-array parser, vector math helpers.
``plans``       Declared analytical queries (Q1–Q4) + TPC-H-style library.
``streaming``   Structured Streaming variant of the incremental pipeline.
``sink``        Keyed table format: upsert (CoW + MOR), predicate DML,
                MERGE INTO, time travel + RESTORE, CDF, skipping indexes.
``tablesketch`` Per-file sketch sidecar behind Table.sketch/quantiles.
``api``         Engine/Table facades over all of the above.
``pipeline``    Batch incremental driver (high-water mark + ingest + load).
"""

__version__ = "0.1.0"
