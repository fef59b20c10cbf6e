"""Incrementally-maintained aggregate views over keyed tables.

The warehouse pattern the reference's consumers hand-roll (recompute a
reporting aggregate after every load) has an incremental answer on this
table format, because commits are **immutable-file manifest swaps**: the
difference between two snapshots is exactly the multiset of rows in the
files ADDED minus the rows in the files REMOVED between their manifests.
Rows of a rewritten bucket that didn't change appear in both (+1 in the
new file, -1 in the old) and cancel inside a sum/count aggregate — so
refreshing a grouped count/sum view needs to read ONLY the files the
commits since the last refresh touched, never the whole table.

At 100 TB that is the difference between a refresh costing O(changed
buckets) and a nightly full scan: a merge that touched 3 of 4096 buckets
refreshes the view by reading those 3 buckets' old+new files.

Scope (documented, test-pinned):

- Aggregates: ``count(*)`` and ``sum(col)`` per group (``avg`` derives
  as sum/n downstream).  min/max are NOT incrementally maintainable
  from deltas alone (a removed row may have carried the extremum) —
  refuse rather than approximate.
- The manifest-diff shortcut requires both snapshots to be CLEAN (no
  pending merge-on-read deltas): with deltas pending, a file multiset
  over-counts rows that precedence would shadow.  An unclean endpoint
  falls back to a full recompute through :func:`sink.read_keyed_table`
  (always correct — it resolves precedence); compaction restores the
  incremental path.
- Incremental float sums accumulate in a different order than a full
  recompute — equal to ~1e-9 relative, not bitwise (the standard IVM
  trade; counts are exact).

The view commits like everything else: data lands under a unique
``data/<uuid>`` dir, then a single meta-JSON write flips readers to it
atomically and records the source snapshot version it reflects.
"""

from __future__ import annotations

import os
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import (
    _load_manifest,
    _read_files,
    _version_manifest_path,
    read_keyed_table,
)
from .storage import LOCAL_STORE

MV_META_NAME = "_mv_meta.json"


def _meta_path(mv_path: str) -> str:
    return os.path.join(mv_path, MV_META_NAME)


def _base_files(manifest: dict) -> set[str] | None:
    """The snapshot's file multiset — or None if the snapshot is unclean
    (pending MOR deltas make file-rows != snapshot-rows)."""
    if manifest.get("deltas"):
        return None
    return {f for files in manifest["buckets"].values() for f in files}


def _aggregate(rows: DataFrame, group_cols: list[str], sum_cols: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [F.sum(F.col(c).cast("double")).alias(f"sum_{c}") for c in sum_cols]
    return rows.groupBy(*group_cols).agg(*aggs)


def refresh_aggregate_view(
    spark: SparkSession,
    target: str,
    mv_path: str,
    group_cols: list[str],
    sum_cols: list[str],
    store=LOCAL_STORE,
) -> dict:
    """Create or refresh a grouped count/sum view of ``target``.

    Returns ``{"mode": "noop"|"incremental"|"full", "files_read": int,
    "source_version": int}``.  ``incremental`` means only the files
    added/removed since the view's recorded snapshot were scanned.
    """
    reserved = {"n"} | {f"sum_{c}" for c in sum_cols}
    clash = reserved & set(group_cols)
    if clash:
        raise ValueError(
            f"group column(s) {sorted(clash)} collide with the view's "
            "aggregate output columns (n, sum_<col>)"
        )
    manifest = _load_manifest(target, store)
    if manifest is None:
        raise FileNotFoundError(f"no keyed table committed at {target}")
    cur_v = manifest["version"]
    meta = store.read_json(_meta_path(mv_path))
    if meta is not None and (
        meta.get("group_cols") != list(group_cols)
        or meta.get("sum_cols") != list(sum_cols)
    ):
        raise ValueError(
            "existing view was built with different group/sum columns; "
            "use a new mv_path"
        )
    if meta is not None and meta["source_version"] == cur_v:
        return {"mode": "noop", "files_read": 0, "source_version": cur_v}

    new_files = _base_files(manifest)
    old_manifest = (
        store.read_json(_version_manifest_path(target, meta["source_version"]))
        if meta is not None
        else None
    )
    old_files = _base_files(old_manifest) if old_manifest else None

    if meta is not None and new_files is not None and old_files is not None:
        added = sorted(new_files - old_files)
        removed = sorted(old_files - new_files)
        missing = [
            f for f in removed if not store.exists(os.path.join(target, f))
        ]
        if missing:
            # removed files already vacuumed past retention: the delta
            # source is gone — recompute instead of failing the refresh
            return _full_refresh(
                spark, target, mv_path, group_cols, sum_cols, cur_v, store
            )
        parts = []
        if added:
            parts.append(
                _read_files(spark, target, added).withColumn("__w", F.lit(1))
            )
        if removed:
            parts.append(
                _read_files(spark, target, removed).withColumn("__w", F.lit(-1))
            )
        if not parts:  # version bumped with no base-file change
            _write_view(
                spark, mv_path,
                _read_view_frame(spark, mv_path, store),
                group_cols, sum_cols, cur_v, store,
            )
            return {"mode": "incremental", "files_read": 0, "source_version": cur_v}
        rows = reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )
        aggs = [F.sum("__w").cast("long").alias("__dn")]
        aggs += [
            F.sum(F.col(c).cast("double") * F.col("__w")).alias(f"__ds_{c}")
            for c in sum_cols
        ]
        delta = rows.groupBy(*group_cols).agg(*aggs)

        mv = _read_view_frame(spark, mv_path, store)
        cond = reduce(
            lambda a, b: a & b,
            [mv[c].eqNullSafe(delta[c]) for c in group_cols],
        )
        joined = mv.join(delta, cond, "full_outer")
        merged = joined.select(
            *[F.coalesce(mv[c], delta[c]).alias(c) for c in group_cols],
            (
                F.coalesce(mv["n"], F.lit(0))
                + F.coalesce(delta["__dn"], F.lit(0))
            ).cast("long").alias("n"),
            *[
                (
                    F.coalesce(mv[f"sum_{c}"], F.lit(0.0))
                    + F.coalesce(delta[f"__ds_{c}"], F.lit(0.0))
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
        ).filter(F.col("n") > 0)
        _write_view(spark, mv_path, merged, group_cols, sum_cols, cur_v, store)
        return {
            "mode": "incremental",
            "files_read": len(added) + len(removed),
            "source_version": cur_v,
        }

    return _full_refresh(spark, target, mv_path, group_cols, sum_cols, cur_v, store)


def _full_refresh(spark, target, mv_path, group_cols, sum_cols, cur_v, store) -> dict:
    rows = read_keyed_table(spark, target, store)
    view = _aggregate(rows, list(group_cols), list(sum_cols))
    _write_view(spark, mv_path, view, group_cols, sum_cols, cur_v, store)
    n_files = len(rows.inputFiles())
    return {"mode": "full", "files_read": n_files, "source_version": cur_v}


def _write_view(spark, mv_path, view_df, group_cols, sum_cols, source_version, store):
    prev_meta = store.read_json(_meta_path(mv_path))
    rel = os.path.join("data", uuid.uuid4().hex[:12])
    out = os.path.join(mv_path, rel)
    # the view must be materialized BEFORE the meta flip; the new data
    # dir is unique, so the incremental merge's lazy read of the CURRENT
    # view never races its own output
    view_df.write.mode("overwrite").parquet(out)
    store.write_json(
        _meta_path(mv_path),
        {
            "source_version": source_version,
            "data": rel,
            "group_cols": list(group_cols),
            "sum_cols": list(sum_cols),
        },
    )
    # retire older view snapshots, keeping the immediately-previous one
    # as the reader-grace window (same idea as the sink's retention)
    keep = {rel, prev_meta["data"] if prev_meta else None}
    data_root = os.path.join(mv_path, "data")
    if os.path.isdir(data_root):
        import shutil

        for d in os.listdir(data_root):
            if os.path.join("data", d) not in keep:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)


def _read_view_frame(spark, mv_path, store) -> DataFrame:
    meta = store.read_json(_meta_path(mv_path))
    return spark.read.parquet(os.path.join(mv_path, meta["data"]))


def read_aggregate_view(
    spark: SparkSession, mv_path: str, store=LOCAL_STORE
) -> DataFrame:
    """The view's current contents: ``group_cols..., n, sum_<col>...``."""
    meta = store.read_json(_meta_path(mv_path))
    if meta is None:
        raise FileNotFoundError(f"no aggregate view at {mv_path}")
    return _read_view_frame(spark, mv_path, store)
