"""Cache lifecycle: operator-internal ``.cache()`` calls must be
releasable — a long-lived session running many corpora must not
accumulate cached shingle/signature tables until eviction pressure
(round-2 verdict item 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_etl_spark.caching import (
    cache_scope,
    register_cache,
    release_caches,
)
from airflow_postgres_etl_spark.operators.dedup import (
    lsh_verified_pairs,
    simhash_near_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_dedup_queries_leave_no_cached_tables(spark):
    """After a dedup query's caches are released, the session's cache
    manager is empty — nothing survives to the next corpus."""
    release_caches()
    spark.catalog.clearCache()  # clean slate regardless of test order
    assert _cache_empty(spark)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    with cache_scope():
        lsh_verified_pairs(docs).collect()
        simhash_near_pairs(docs).collect()
        assert not _cache_empty(spark)  # the operators DID cache
    assert _cache_empty(spark)  # ... and the scope released every entry


def test_release_caches_is_idempotent_and_counts(spark):
    spark.catalog.clearCache()
    release_caches()
    df = register_cache(spark.range(10).withColumn("x", F.col("id") * 2))
    df.collect()
    assert not _cache_empty(spark)
    assert release_caches() == 1
    assert _cache_empty(spark)
    assert release_caches() == 0  # nothing left; safe to call again


def test_nested_cache_scopes_release_only_their_own(spark):
    spark.catalog.clearCache()
    release_caches()
    outer = register_cache(spark.range(5))
    outer.collect()
    with cache_scope():
        inner = register_cache(spark.range(7))
        inner.collect()
    # inner gone, outer still cached
    assert not _cache_empty(spark)
    assert release_caches() == 1  # exactly the outer entry remained
    assert _cache_empty(spark)


def test_register_and_release_from_concurrent_threads(spark):
    """The registry survives concurrent query threads (the multi-threaded
    driver case the lock exists for): no lost registrations, no
    corruption, and a full release empties the registry."""
    import threading

    from airflow_postgres_etl_spark import caching

    caching.release_caches()
    errors = []

    def work(i):
        try:
            for j in range(5):
                caching.register_cache(spark.range(i * 100 + j, i * 100 + j + 10))
        except Exception as ex:  # pragma: no cover
            errors.append(ex)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    with caching._LOCK:
        n = len(caching._ACTIVE)
    assert n == 20
    assert caching.release_caches() == 20
    with caching._LOCK:
        assert len(caching._ACTIVE) == 0
