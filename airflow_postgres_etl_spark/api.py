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
    def table(self, path: str) -> "Table":
        """Handle over one keyed target: reads, merges (CoW and MOR),
        maintenance, indexes, constraints, and views in one object."""
        return Table(self.spark, path)

    # -- cross-table materialized views ---------------------------------------
    # (single-table view refresh lives on Table; a join/star view spans
    # several tables, so the Engine hosts it)
    def refresh_join_view(
        self, fact: str, dim: str, mv_path: str, on: str,
        group_cols: list[str], sum_cols: list[str],
    ) -> dict:
        """Incrementally-maintained count/sum view over ``fact ⋈ dim``
        (see ``views.refresh_join_view``)."""
        from . import views

        return views.refresh_join_view(
            self.spark, fact, dim, mv_path, on, group_cols, sum_cols
        )

    def refresh_star_view(
        self, fact: str, dims: list[tuple[str, str]], mv_path: str,
        group_cols: list[str], sum_cols: list[str],
    ) -> dict:
        """The k-dim star generalization (``views.refresh_star_view``);
        ``dims = [(path, join_col), ...]``."""
        from . import views

        return views.refresh_star_view(
            self.spark, fact, dims, mv_path, group_cols, sum_cols
        )

    def read_view(self, mv_path: str) -> DataFrame:
        from . import views

        return views.read_aggregate_view(self.spark, mv_path)

    def stream_ingest(self, csv_dir: str, out_dir: str, checkpoint_dir: str, **kw):
        """Continuous variant of :meth:`ingest`: file-source checkpoint as
        the high-water mark, replace-by-key merge per micro-batch.
        ``expectations=[Rule, ...]`` gates every micro-batch through the
        DQ quarantine split."""
        from .streaming import stream_ingest

        return stream_ingest(
            self.spark,
            csv_dir,
            os.path.join(out_dir, "tracking"),
            os.path.join(out_dir, "events"),
            checkpoint_dir,
            **kw,
        )

    def stream_apply_changes(
        self,
        source_dir: str,
        target: str,
        checkpoint_dir: str,
        schema: str,
        seq_col: str,
        **kw,
    ):
        """Continuous CDC apply: JSON change files stream through
        ``sink.apply_changes`` (sequenced, out-of-order tolerant,
        redelivery-idempotent — streaming/cdc_stream.py)."""
        from .streaming.cdc_stream import stream_apply_changes

        return stream_apply_changes(
            self.spark, source_dir, target, checkpoint_dir, schema,
            seq_col, **kw,
        )

    def stream_dedup_ingest(
        self,
        docs_dir: str,
        out_dir: str,
        checkpoint_dir: str,
        *,
        threshold: float = 0.5,
        **kw,
    ):
        """Continuous corpus acquisition with cross-batch near-dup
        filtering: accepted docs land in ``<out_dir>/corpus`` (a KEYED
        table by default — exactly-once; read with
        ``Table``/``sink.read_keyed_table``; pass
        ``delivery="at_most_once"`` for a plain parquet directory),
        their LSH bands in ``<out_dir>/index`` (the dedup state)."""
        from .streaming import stream_dedup_ingest

        return stream_dedup_ingest(
            self.spark,
            docs_dir,
            os.path.join(out_dir, "index"),
            os.path.join(out_dir, "corpus"),
            checkpoint_dir,
            threshold=threshold,
            **kw,
        )

    def stream_semantic_ingest(
        self,
        vecs_dir: str,
        out_dir: str,
        checkpoint_dir: str,
        *,
        threshold: float = 0.95,
        **kw,
    ):
        """Continuous EMBEDDING acquisition with cross-batch semantic
        dedup (cosine ≥ threshold vs anything accepted): survivors land
        in ``<out_dir>/corpus`` (a KEYED table by default —
        exactly-once; pass ``delivery="at_most_once"`` for a plain
        parquet directory), the cell-partitioned IVF index (the dedup
        state) in ``<out_dir>/index``."""
        from .streaming import stream_semantic_ingest

        return stream_semantic_ingest(
            self.spark,
            vecs_dir,
            os.path.join(out_dir, "index"),
            os.path.join(out_dir, "corpus"),
            checkpoint_dir,
            threshold=threshold,
            **kw,
        )

    def stream_training_ingest(
        self,
        docs_dir: str,
        bench_grams_path: str,
        rates_ppm: dict[str, int],
        out_dir: str,
        checkpoint_dir: str,
        **kw,
    ):
        """Continuous training-corpus acquisition: per micro-batch
        quality gate → 13-gram benchmark decontamination (against the
        grams materialized by ``streaming.build_benchmark_grams``) →
        per-source temperature-mixing keep filter.  Stateless across
        batches — batch-wise equals batch-job-over-the-union.  The
        corpus is a KEYED table by default (exactly-once under replay;
        ``delivery="at_least_once"`` opts back into a blind parquet
        append)."""
        from .streaming import stream_training_ingest

        return stream_training_ingest(
            self.spark,
            docs_dir,
            bench_grams_path,
            rates_ppm,
            out_dir,
            checkpoint_dir,
            **kw,
        )


class Table:
    """Handle over one keyed-table target — the whole table-format
    surface (reads, both merge modes, maintenance, indexes, constraints,
    views) behind a single object, so a user never assembles the
    function zoo by hand:

    >>> t = Engine().table("out/events")
    >>> t.merge_mor(batch); t.compact() if t.delta_depth() > 8 else None
    >>> t.read(where=[("v", 0, 10)], where_eq=("tag", "x")).show()

    Every method delegates to the tested sink/bloom/views functions —
    this class adds no behavior, only a surface."""

    def __init__(self, spark: SparkSession, path: str, store=None) -> None:
        from .storage import LOCAL_STORE

        self.spark = spark
        self.path = path
        self.store = store or LOCAL_STORE

    # -- reads --------------------------------------------------------------
    def read(
        self, version=None, as_of=None, where=None, where_eq=None,
        where_isnull=None, where_notnull=None,
    ) -> DataFrame:
        from . import sink

        return sink.read_keyed_table(
            self.spark, self.path, self.store,
            version=version, as_of=as_of, where=where, where_eq=where_eq,
            where_isnull=where_isnull, where_notnull=where_notnull,
        )

    def lookup(self, keys: list) -> DataFrame:
        from . import sink

        return sink.lookup_keys(self.spark, self.path, keys, self.store)

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        from . import sink

        return sink.table_changes(
            self.spark, self.path, from_version, to_version, store=self.store
        )

    # -- writes -------------------------------------------------------------
    def merge(self, batch: DataFrame, expectations=None, **kw):
        """Replace-by-key merge.  With ``expectations=[Rule, ...]`` the
        batch passes through the DQ gate first: clean rows merge,
        predicate-violating rows land in the ``<path>/_quarantine`` keyed
        table, and the per-rule report is persisted — returns the report
        rows (None without expectations)."""
        from . import sink

        if expectations:
            from .operators.expectations import gate_and_merge

            return gate_and_merge(
                self.spark, batch, self.path, expectations,
                store=self.store, **kw,
            )
        sink.keyed_overwrite_parquet(self.spark, batch, self.path, store=self.store, **kw)

    def merge_mor(
        self, batch: DataFrame, expectations=None,
        auto_compact_depth: int | None = None, **kw,
    ):
        """Merge-on-read write; with ``auto_compact_depth=N`` the handle
        compacts automatically once the pending delta chain reaches N —
        Databricks auto-compaction's contract: bounded read
        amplification without a separate maintenance scheduler.  The
        compaction is its own commit (DESCRIBE HISTORY shows
        ``merge_mor`` then ``compact``, like OPTIMIZE)."""
        from . import sink

        if expectations:
            from .operators.expectations import gate_and_merge

            out = gate_and_merge(
                self.spark, batch, self.path, expectations,
                mor=True, store=self.store, **kw,
            )
        else:
            out = None
            sink.keyed_merge_mor(
                self.spark, batch, self.path, store=self.store, **kw
            )
        if (
            auto_compact_depth is not None
            and sink.table_delta_depth(self.path, self.store)
            >= auto_compact_depth
        ):
            sink.compact_keyed_table(self.spark, self.path, store=self.store)
        return out

    def append(self, batch: DataFrame, **kw) -> int:
        """Fast NEW-key append: O(batch) commit, no existing data read
        (``sink.keyed_append``).  Pay the file-count debt back with
        :meth:`optimize`.  Returns the number of files added."""
        from . import sink

        return sink.keyed_append(
            self.spark, batch, self.path, store=self.store, **kw
        )

    def merge_into(self, source: DataFrame, **kw) -> dict:
        """Delta-style MERGE INTO: matched keys update/delete, unmatched
        source rows insert — one MOR delta commit (see sink.merge_into
        for the expression namespace and per-key semantics)."""
        from . import sink

        return sink.merge_into(self.spark, self.path, source, store=self.store, **kw)

    def apply_changes(self, changes: DataFrame, seq_col: str, **kw) -> dict:
        """DLT-style APPLY CHANGES INTO (SCD1): absorb an out-of-order
        CDC feed sequenced by ``seq_col`` — per-key net-change
        resolution in the batch, stale changes dropped against the
        stored per-key sequence, deletes tombstone — one MOR delta
        commit, idempotent under redelivery (see sink.apply_changes)."""
        from . import sink

        return sink.apply_changes(
            self.spark, self.path, changes, seq_col, store=self.store, **kw
        )

    def gc_cdc_tombstones(self, older_than_seq) -> int:
        """Expire CDC delete memory below the feed's lateness horizon
        (sink.gc_cdc_tombstones; DLT's tombstone-GC contract)."""
        from . import sink

        return sink.gc_cdc_tombstones(
            self.spark, self.path, older_than_seq, store=self.store
        )

    def delete_where(self, predicate: str, **kw) -> int:
        from . import sink

        return sink.keyed_delete_where(
            self.spark, self.path, predicate, store=self.store, **kw
        )

    def update_where(self, assignments: dict[str, str], predicate: str, **kw) -> int:
        from . import sink

        return sink.keyed_update_where(
            self.spark, self.path, assignments, predicate, store=self.store, **kw
        )

    # -- maintenance --------------------------------------------------------
    def clone(self, dest: str) -> "Table":
        """Shallow clone (Delta ``CLONE``): ``dest`` becomes an
        independent keyed table referencing this table's current files
        in place — zero data copied, divergence is copy-on-write.  See
        :func:`sink.clone_keyed_table` for the vacuum/retention
        contract.  Returns a handle on the clone."""
        from . import sink

        sink.clone_keyed_table(self.path, dest, store=self.store)
        return Table(self.spark, dest, store=self.store)

    # -- write-audit-publish --------------------------------------------------
    def branch(self, name: str) -> "Table":
        """Open a WAP branch (sink.wap_begin): a shallow clone under
        ``<path>/_branches/<name>`` to stage commits on.  Audit it, then
        :meth:`publish` — main-table readers never see unaudited data."""
        from . import sink

        return Table(
            self.spark, sink.wap_begin(self.path, name, self.store),
            store=self.store,
        )

    def publish(self, name: str, expectations=None) -> dict:
        """Audit branch ``name`` (optional expectation rules over its
        full state) and fast-forward this table to its snapshot — one
        metadata-only CAS (sink.wap_publish)."""
        from . import sink

        return sink.wap_publish(
            self.spark, self.path, name, expectations, store=self.store
        )

    def abandon(self, name: str) -> None:
        """Drop an unpublished WAP branch (sink.wap_abandon)."""
        from . import sink

        sink.wap_abandon(self.path, name, store=self.store)

    def branches(self) -> list[str]:
        from . import sink

        return sink.wap_branches(self.path, store=self.store)

    def expire_snapshots(
        self, keep_last: int | None = None, older_than_s: float | None = None
    ) -> int:
        """Drop old time-travel snapshots (sink.expire_snapshots) —
        bounds the version-manifest metadata; never touches data files
        or the current version."""
        from . import sink

        return sink.expire_snapshots(
            self.path, keep_last, older_than_s, store=self.store
        )

    def adopt_foreign(self) -> int:
        """Copy every foreign (clone-source / published-branch) file
        reference into this table's own directory — one commit, zero
        rows decoded (sink.adopt_foreign_files).  After this, a
        published branch directory can be removed."""
        from . import sink

        return sink.adopt_foreign_files(self.path, store=self.store)

    def restore(self, version: int) -> int:
        """Delta-style RESTORE: make an earlier snapshot current again,
        as a forward metadata-only commit (sink.restore_keyed_table)."""
        from . import sink

        return sink.restore_keyed_table(self.spark, self.path, version, self.store)

    def compact(self) -> int:
        from . import sink

        return sink.compact_keyed_table(self.spark, self.path, self.store)

    def optimize(self, max_files_per_bucket: int = 1) -> int:
        """Bin-pack appended small files (``sink.optimize_keyed_table``):
        rewrite buckets above the file-count threshold to one file each;
        data unchanged, CDF across the commit is empty."""
        from . import sink

        return sink.optimize_keyed_table(
            self.spark, self.path, max_files_per_bucket, self.store
        )

    def vacuum(
        self, retention_s: float | None = None, dry_run: bool = False
    ) -> int | list[str]:
        """Collect unreferenced data files past retention; with
        ``dry_run=True`` return the relative paths that WOULD be
        deleted, touching nothing (``sink.vacuum_dry_run``)."""
        from . import sink

        if retention_s is None:
            retention_s = sink.DEFAULT_RETENTION_S
        if dry_run:
            return sink.vacuum_dry_run(self.path, retention_s, self.store)
        return sink.vacuum_keyed_table(self.path, retention_s, self.store)

    def rebucket(self, num_buckets: int) -> None:
        from . import sink

        sink.rebucket_keyed_table(self.spark, self.path, num_buckets, self.store)

    def widen(self, types: dict[str, str]) -> None:
        from . import sink

        sink.widen_keyed_table(self.spark, self.path, types, self.store)

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only ``RENAME COLUMN`` — one manifest commit, zero
        data moves (see ``sink.rename_column``)."""
        from . import sink

        return sink.rename_column(self.spark, self.path, old, new, self.store)

    def drop_column(self, col: str) -> int:
        """Metadata-only ``DROP COLUMN`` — bytes remain until
        :meth:`purge_column_mapping` (see ``sink.drop_column``)."""
        from . import sink

        return sink.drop_column(self.spark, self.path, col, self.store)

    def purge_column_mapping(self) -> int:
        """One rewrite that physicalizes renames and deletes dropped
        columns' bytes (see ``sink.purge_column_mapping``)."""
        from . import sink

        return sink.purge_column_mapping(self.spark, self.path, self.store)

    def cluster(self, by_col: str, files_per_bucket: int = 4) -> None:
        from . import sink

        sink.cluster_keyed_table(
            self.spark, self.path, by_col, files_per_bucket, self.store
        )

    def zorder(self, cols: list[str], files_per_bucket: int = 4) -> None:
        from . import sink

        sink.zorder_keyed_table(
            self.spark, self.path, cols, files_per_bucket, self.store
        )

    def add_bloom_index(self, col: str, **kw) -> int:
        from . import bloom

        return bloom.add_bloom_index(self.spark, self.path, col, store=self.store, **kw)

    # -- constraints --------------------------------------------------------
    def add_constraint(self, name: str, predicate: str) -> None:
        from . import sink

        sink.add_table_constraint(self.spark, self.path, name, predicate, self.store)

    def drop_constraint(self, name: str) -> None:
        from . import sink

        sink.drop_table_constraint(self.path, name, self.store)

    def constraints(self) -> dict[str, str]:
        from . import sink

        return sink.table_constraints(self.path, self.store)

    # -- introspection ------------------------------------------------------
    def version(self) -> int | None:
        from . import sink

        return sink.table_version(self.path, self.store)

    def history(self) -> list[int]:
        from . import sink

        return sink.table_history(self.path, self.store)

    def register(self, name: str) -> None:
        """Expose the table's CURRENT resolved state (manifest version,
        MOR precedence applied) to ``Engine.sql`` as a temp view.  The
        view captures this snapshot's plan — re-register after commits
        you want visible, the same contract as Delta's
        ``DataFrame.createOrReplaceTempView`` over a snapshot read."""
        self.read().createOrReplaceTempView(name)

    def stats(self) -> dict:
        """Metadata-only statistics — exact ``COUNT(*)`` and per-tracked-
        column min/max/null_count from the manifest, zero data scanned
        (see ``sink.table_stats``; None fields mean "not derivable
        exactly", never an estimate)."""
        from . import sink

        return sink.table_stats(self.path, self.store)

    def history_detail(self) -> list[dict]:
        """``DESCRIBE HISTORY``: version + user-level operation +
        commit timestamp per surviving snapshot (see
        ``sink.table_history_detail``)."""
        from . import sink

        return sink.table_history_detail(self.path, self.store)

    def describe(self) -> dict:
        from . import sink

        return sink.describe_keyed_table(self.path, self.store)

    def delta_depth(self) -> int:
        from . import sink

        return sink.table_delta_depth(self.path, self.store)

    def set_drift_policy(self, rules, fail_thresholds=None) -> int:
        """Arm the distribution-drift circuit breaker at the table:
        stores ``expect_distribution`` rules + micro-PSI thresholds in
        the manifest (one metadata commit); :meth:`maintain` re-checks
        them ambiently from then on.  ``rules=None`` disarms."""
        from . import sink

        return sink.set_drift_policy(
            self.spark, self.path, rules, fail_thresholds, store=self.store
        )

    def drift_policy(self) -> dict | None:
        from . import sink

        return sink.drift_policy(self.path, self.store)

    def check_drift(self) -> list[dict]:
        """Evaluate the stored drift policy against the live table —
        one report dict per rule (``n_violations`` = micro-PSI,
        ``ok`` vs the stored threshold); empty when disarmed."""
        from . import sink

        return sink.check_drift_policy(self.spark, self.path, store=self.store)

    def set_ivf_policy(self, index_path, **kw) -> int:
        """Arm ambient IVF-index health at the table (r10): stores the
        index path, staleness threshold and recall re-gate parameters
        in the manifest; :meth:`maintain` re-checks the index's
        appended fraction from then on, rebuilding from the live table
        and re-running the recall gate when it crosses.
        ``index_path=None`` disarms."""
        from . import sink

        return sink.set_ivf_policy(
            self.spark, self.path, index_path, store=self.store, **kw
        )

    def ivf_policy(self) -> dict | None:
        from . import sink

        return sink.ivf_policy(self.path, self.store)

    def set_minhash_policy(self, index_path, **kw) -> int:
        """Arm ambient MinHash-index compaction at the table (r11):
        stores the index path, staleness threshold and rebuild
        parameters (shingle width, global hot-band cap) in the
        manifest; :meth:`maintain` re-checks the index's appended
        fraction from then on, re-deriving the band table from the live
        corpus when it crosses — the out-of-band twin of the streams'
        in-band ``compact_fraction``.  ``index_path=None`` disarms."""
        from . import sink

        return sink.set_minhash_policy(
            self.spark, self.path, index_path, store=self.store, **kw
        )

    def minhash_policy(self) -> dict | None:
        from . import sink

        return sink.minhash_policy(self.path, self.store)

    def maintain(
        self,
        max_delta_depth: int = 8,
        max_files_per_bucket: int = 4,
        retention_s: float | None = None,
        keep_snapshots: int | None = None,
        on_drift: str = "raise",
    ) -> dict:
        """Policy-driven maintenance in one call — the scheduled job a
        100 TB deployment runs nightly instead of a human reading
        :meth:`describe`.  Inspects the manifest (no data scan) and runs
        only what the thresholds demand, in dependency order:

        1. ``compact`` when the deepest MOR delta chain reaches
           ``max_delta_depth`` (bounds read amplification),
        2. ``optimize`` when any bucket holds more than
           ``max_files_per_bucket`` base files (pays back append debt),
        3. ``expire_snapshots`` when ``keep_snapshots`` is given
           (count-based; runs BEFORE vacuum, whose own retention pass
           also expires snapshot manifests older than ``retention_s``),
        4. ``vacuum`` always (collects retirees past ``retention_s``;
           default = the sink's reader-safety window).

        When a drift policy is armed (:meth:`set_drift_policy`), it is
        re-checked FIRST against the live table — the ambient circuit
        breaker: ``on_drift="raise"`` (default) raises
        ``ExpectationFailure`` before any maintenance side effect, so
        the scheduled job trips loudly on upstream drift;
        ``on_drift="report"`` records the per-rule report under
        ``out["drift"]`` and proceeds.

        When an ambient IVF policy is armed (:meth:`set_ivf_policy`),
        the index's appended fraction is probed LAST — above the stored
        threshold the quantizer rebuilds STAGED from the live table,
        the recall gate runs against the staging generation, and only a
        passing gate swaps it live (``out["ivf"]``; a failed gate
        raises ``IndexRecallError`` with the old index still serving).
        An ambient MinHash policy (:meth:`set_minhash_policy`) is
        probed the same way (``out["minhash"]``) — above threshold the
        band table re-derives from the live corpus and manifest-swaps.

        Returns ``{"compacted", "optimized", "vacuumed_files",
        "expired_snapshots"[, "drift"][, "ivf"][, "minhash"]}`` with
        counts (absent action = not triggered).  Composes the individually-tested
        primitives; the policy itself is test-pinned
        (tests/test_api.py)."""
        from . import sink

        if on_drift not in ("raise", "report"):
            raise ValueError(f"on_drift must be raise|report, got {on_drift!r}")
        out: dict = {}
        drift = self.check_drift()
        if drift:
            out["drift"] = drift
            bad = [r for r in drift if not r["ok"]]
            if bad and on_drift == "raise":
                from .operators.expectations import ExpectationFailure

                raise ExpectationFailure(
                    "drift policy violated before maintenance: "
                    + "; ".join(
                        f"{r['rule']}: psi_micro={r['n_violations']} "
                        f"(> {r['limit']})" if "error" not in r
                        else f"{r['rule']}: {r['error']}"
                        for r in bad
                    )
                )
        d = self.describe()
        if d["max_delta_depth"] >= max_delta_depth:
            out["compacted"] = sink.compact_keyed_table(
                self.spark, self.path, store=self.store
            )
            d = self.describe()
        if d["max_files_per_bucket"] > max_files_per_bucket:
            out["optimized"] = sink.optimize_keyed_table(
                self.spark, self.path, max_files_per_bucket, store=self.store
            )
        if keep_snapshots is not None:
            out["expired_snapshots"] = sink.expire_snapshots(
                self.path, keep_last=keep_snapshots, store=self.store
            )
        kw = {} if retention_s is None else {"retention_s": retention_s}
        out["vacuumed_files"] = sink.vacuum_keyed_table(
            self.path, store=self.store, **kw
        )
        # one manifest read serves BOTH ambient index policies (three
        # separate _load_manifest calls here = two extra JSON GETs per
        # scheduled no-op maintain on an object store)
        manifest = sink._load_manifest(self.path, store=self.store) or {}
        # ambient MinHash compaction (r11): when armed
        # (set_minhash_policy), probe the dedup index's appended
        # fraction — one JSON read below the threshold; above it,
        # re-derive the band table from the live corpus and swap.
        # Runs BEFORE the IVF block: that one RAISES on a failed recall
        # gate (by design, every maintain until fixed), and ordering it
        # first would permanently starve this compaction and the
        # retired-dir vacuum behind it.
        mpol = manifest.get("minhash_policy") or None
        if mpol:
            from .operators.dedup import (
                maintain_minhash_policy,
                vacuum_minhash_index,
            )

            out["minhash"] = maintain_minhash_policy(
                self.spark,
                lambda: sink.read_keyed_table(
                    self.spark, self.path, store=self.store
                ),
                mpol,
                store=self.store,
            )
            # the index's retired data dirs (swapped out by past
            # compactions) reclaim on the same retention schedule as
            # the table's own retirees — one maintain, both surfaces
            out["minhash"]["vacuumed_dirs"] = vacuum_minhash_index(
                mpol["index_path"], retention_s=retention_s,
                store=self.store,
            )
        # ambient IVF index health (r10, VERDICT r9 task 4): when armed
        # (set_ivf_policy), probe the index's appended fraction — one
        # JSON read below the threshold; above it, rebuild the quantizer
        # from the live table and re-run the stored recall gate
        # (similarity.maintain_index_policy raises IndexRecallError on a
        # failed gate).  Runs LAST so the table's own maintenance AND
        # the other ambient policies land either way.
        ipol = manifest.get("ivf_policy") or None
        if ipol:
            from .operators.similarity import maintain_index_policy

            # corpus passed as a THUNK: below the staleness threshold
            # the check stays one JSON read — constructing the
            # keyed-table DataFrame eagerly would footer-sweep every
            # live file on every no-op nightly maintain
            out["ivf"] = maintain_index_policy(
                self.spark,
                lambda: sink.read_keyed_table(
                    self.spark, self.path, store=self.store
                ),
                ipol,
                store=self.store,
            )
        return out

    # -- table-level sketches ------------------------------------------------
    def sketch(self, cols: list[str]) -> DataFrame:
        """Distinct-count estimates per column ``(column, distinct_est)``
        from per-file KMV sketches cached under ``_sketches/`` — after a
        merge only the rewritten buckets' new files are scanned; repeat
        calls are sidecar-only (tablesketch.py)."""
        from . import tablesketch

        return tablesketch.table_kmv_distinct(self.spark, self.path, cols, self.store)

    def frequencies(self, col: str, probes: list) -> DataFrame:
        """Count-min point-frequency estimates ``(item, est_cnt)`` for
        the probe values, from the cached per-file cell sketches."""
        from . import tablesketch

        return tablesketch.table_frequencies(self.spark, self.path, col, probes, self.store)

    def quantiles(self, col: str, qs: list[tuple[str, float]]) -> DataFrame:
        """Sample quantiles from the mergeable bottom-k row sample
        (one row: ``n_sample, <names…>``)."""
        from . import tablesketch

        return tablesketch.table_quantiles(self.spark, self.path, col, qs, self.store)

    # -- data quality -------------------------------------------------------
    def quarantine(self) -> DataFrame:
        """Rows diverted by expectation-gated merges, tagged with the
        comma-joined names of the rules they broke."""
        from .operators.expectations import read_quarantine

        return read_quarantine(self.spark, self.path, self.store)

    def dq_reports(self) -> list[dict]:
        """Per-batch expectation reports persisted by gated merges."""
        from .operators.expectations import read_dq_reports

        return read_dq_reports(self.path, self.store)

    # -- materialized views -------------------------------------------------
    def refresh_view(self, mv_path: str, group_cols: list[str], sum_cols: list[str]) -> dict:
        from . import views

        return views.refresh_aggregate_view(
            self.spark, self.path, mv_path, group_cols, sum_cols, self.store
        )

    def refresh_minmax_view(
        self, mv_path: str, group_cols: list[str], agg_cols: list[str]
    ) -> dict:
        """Grouped n/sum/min/max view maintained by touched-group
        partial recompute (see ``views.refresh_minmax_view``)."""
        from . import views

        return views.refresh_minmax_view(
            self.spark, self.path, mv_path, group_cols, agg_cols, self.store
        )

    def read_view(self, mv_path: str) -> DataFrame:
        from . import views

        return views.read_aggregate_view(self.spark, mv_path, self.store)

    def refresh_distinct_view(
        self, mv_path: str, group_cols: list[str], item_col: str, k: int = 128
    ) -> dict:
        """Per-group approx-COUNT-DISTINCT view stored as a KMV sketch —
        appends maintain it from the added files alone (see
        ``views.refresh_distinct_view``)."""
        from . import views

        return views.refresh_distinct_view(
            self.spark, self.path, mv_path, group_cols, item_col, k,
            self.store,
        )

    def read_distinct_view(self, mv_path: str) -> DataFrame:
        from . import views

        return views.read_distinct_view(self.spark, mv_path, self.store)

    def refresh_quantile_view(
        self,
        mv_path: str,
        group_cols: list[str],
        value_col: str,
        key_col: str,
        k: int = 256,
    ) -> dict:
        """Per-group quantile view stored as a mergeable bottom-k row
        sample (see ``views.refresh_quantile_view``)."""
        from . import views

        return views.refresh_quantile_view(
            self.spark, self.path, mv_path, group_cols, value_col, key_col,
            k, self.store,
        )

    def read_quantile_view(
        self, mv_path: str, qs: list[tuple[str, float]]
    ) -> DataFrame:
        from . import views

        return views.read_quantile_view(self.spark, mv_path, qs, self.store)

    def refresh_cms_view(
        self,
        mv_path: str,
        group_cols: list[str],
        item_col: str,
        depth: int = 4,
        width: int = 128,
    ) -> dict:
        """Per-group Count-Min frequency view — a linear sketch, so
        deletes stay incremental too (see ``views.refresh_cms_view``)."""
        from . import views

        return views.refresh_cms_view(
            self.spark, self.path, mv_path, group_cols, item_col, depth,
            width, self.store,
        )

    def read_cms_view(self, mv_path: str, probes: DataFrame) -> DataFrame:
        from . import views

        return views.read_cms_view(self.spark, mv_path, probes, store=self.store)
