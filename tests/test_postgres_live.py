"""Live-Postgres wire test for S9's relational leg (VERDICT r10 task 5).

The reference's actual sink is Postgres — ``delete_and_insert`` runs
``DELETE WHERE key IN (...)`` + bulk INSERT inside one
``engine.begin()`` transaction (/root/reference/dags/datahelper/
postgres.py:18-38).  Our production path (`sink.keyed_overwrite_jdbc`)
is exercised end-to-end against DuckDB as a stand-in everywhere else
(tests/test_sink_pipeline.py); THIS file is the real-wire leg: it runs
the exact same function against a live Postgres whenever the
environment provides one, and skips with a visible reason when not.

Arming it, in priority order (r11 — the leg now runs with ZERO env):

1. ``export SPARK_GRAFT_PG_URL=postgresql://user:pw@host/db`` — point at
   an existing server (any DSN psycopg/psycopg2/pgwire accepts).
2. No URL but PostgreSQL server binaries on the host (this container
   ships PostgreSQL 15): a throwaway instance is provisioned for the
   session (tests/pg_server.py) and torn down after — trust auth on a
   free 127.0.0.1 port, data dir in /tmp.

Client side never needs psycopg: the engine's own ``pgwire`` module
(pure-stdlib PostgreSQL wire protocol v3) is the fallback driver, so
the wire leg is green wherever a server exists.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest

from airflow_postgres_etl_spark import sink

PG_URL = os.environ.get("SPARK_GRAFT_PG_URL")


@pytest.fixture(scope="session", autouse=True)
def _provisioned_pg():
    """Resolve PG_URL for the whole module: env override first, else a
    session-lifetime throwaway server, else skip with the reason."""
    global PG_URL
    if PG_URL:
        yield
        return
    from tests.pg_server import provision

    url, stop = provision()
    if url is None:
        pytest.skip(
            f"live-Postgres wire leg skipped — no SPARK_GRAFT_PG_URL and "
            f"no local server could be provisioned ({stop}); S9's merge "
            "transaction is still covered against DuckDB in "
            "tests/test_sink_pipeline.py"
        )
    PG_URL = url
    try:
        yield
    finally:
        PG_URL = None
        stop()


def _pg_driver():
    """psycopg (3) or psycopg2 when the environment ships one, else the
    engine's own pure-stdlib wire-protocol client."""
    try:
        import psycopg

        return psycopg
    except ImportError:
        try:
            import psycopg2

            return psycopg2
        except ImportError:
            from airflow_postgres_etl_spark import pgwire

            return pgwire


COLUMNS = {"id": "Integer", "name": "String", "stamp": "DateTime"}


def _fetch_all(drv, table):
    con = drv.connect(PG_URL)
    try:
        cur = con.cursor()
        cur.execute(f'SELECT "id", "name" FROM "{table}" ORDER BY "id"')
        return cur.fetchall()
    finally:
        con.close()


def _drop(drv, *tables):
    con = drv.connect(PG_URL)
    try:
        cur = con.cursor()
        for t in tables:
            cur.execute(f'DROP TABLE IF EXISTS "{t}"')
        con.commit()
    finally:
        con.close()


def _stage_writer(drv, columns_dict):
    """DB-API stage leg: lands the batch without needing a JDBC driver
    jar on the Spark classpath (the injectable seam
    keyed_overwrite_jdbc documents for exactly this situation)."""

    def write(batch, stage_table):
        cols = list(columns_dict)
        rows = [tuple(r) for r in batch.select(*cols).collect()]
        con = drv.connect(PG_URL)
        try:
            cur = con.cursor()
            cur.execute(f'DROP TABLE IF EXISTS "{stage_table}"')
            cur.execute(
                sink.create_table_sql(stage_table, columns_dict)
            )
            ph = ", ".join(["%s"] * len(cols))
            cur.executemany(
                f'INSERT INTO "{stage_table}" VALUES ({ph})', rows
            )
            con.commit()
        finally:
            con.close()

    return write


def test_keyed_overwrite_live_postgres_delete_insert(spark):
    """The full S9 wire path: ensure-target DDL (reserved-word-safe
    quoting), stage, DELETE USING + INSERT SELECT + DROP in one
    transaction, replayed-batch convergence — reference
    postgres.py:18-38 semantics on a real server."""
    drv = _pg_driver()
    table = f"s9_live_{uuid.uuid4().hex[:8]}"
    try:
        b1 = spark.createDataFrame(
            [(1, "alpha", None), (2, "beta", None)],
            "id int, name string, stamp timestamp",
        )
        sink.keyed_overwrite_jdbc(
            b1, PG_URL, table, "id", COLUMNS,
            connection_factory=lambda: drv.connect(PG_URL),
            stage_writer=_stage_writer(drv, COLUMNS),
        )
        assert _fetch_all(drv, table) == [(1, "alpha"), (2, "beta")]

        # overlapping second batch: key 2 replaced, 1 kept, 3 added
        b2 = spark.createDataFrame(
            [(2, "beta2", None), (3, "gamma", None)],
            "id int, name string, stamp timestamp",
        )
        sink.keyed_overwrite_jdbc(
            b2, PG_URL, table, "id", COLUMNS,
            connection_factory=lambda: drv.connect(PG_URL),
            stage_writer=_stage_writer(drv, COLUMNS),
        )
        assert _fetch_all(drv, table) == [
            (1, "alpha"), (2, "beta2"), (3, "gamma"),
        ]

        # replay the same batch: converges, no duplicates
        sink.keyed_overwrite_jdbc(
            b2, PG_URL, table, "id", COLUMNS,
            connection_factory=lambda: drv.connect(PG_URL),
            stage_writer=_stage_writer(drv, COLUMNS),
        )
        assert _fetch_all(drv, table) == [
            (1, "alpha"), (2, "beta2"), (3, "gamma"),
        ]

        # S8's high-water-mark probe and S6's existence probe on the wire
        con = drv.connect(PG_URL)
        try:
            cur = con.cursor()
            cur.execute(sink.high_water_mark_sql(table, "id"))
            assert cur.fetchone()[0] == 3
            cur.execute(sink.table_exists_sql(table))
            assert cur.fetchone() is not None
            cur.execute(sink.table_exists_sql(f"absent_{table}"))
            assert cur.fetchone() is None
        finally:
            con.close()
    finally:
        _drop(drv, table, f"{table}__stage")


def test_merge_failure_rolls_back_live_postgres(spark):
    """Rollback-on-failure on the wire: the INSERT SELECT fails
    mid-transaction (type-mismatched stage) AFTER the DELETE ran — the
    target must come back untouched, the reference's single
    ``engine.begin()`` contract (postgres.py:30-38)."""
    drv = _pg_driver()
    table = f"s9_rollback_{uuid.uuid4().hex[:8]}"
    try:
        seed = spark.createDataFrame(
            [(1, "keep", None), (2, "also-keep", None)],
            "id int, name string, stamp timestamp",
        )
        sink.keyed_overwrite_jdbc(
            seed, PG_URL, table, "id", COLUMNS,
            connection_factory=lambda: drv.connect(PG_URL),
            stage_writer=_stage_writer(drv, COLUMNS),
        )

        def poisoned_stage(batch, stage_table):
            # same key column (so the DELETE executes and removes rows
            # inside the txn) but a TEXT "id"-adjacent payload column of
            # the wrong TYPE, so the INSERT SELECT fails after it
            con = drv.connect(PG_URL)
            try:
                cur = con.cursor()
                cur.execute(f'DROP TABLE IF EXISTS "{stage_table}"')
                cur.execute(
                    f'CREATE TABLE "{stage_table}" '
                    '("id" INTEGER, "name" TEXT, "stamp" TEXT)'
                )
                cur.execute(
                    f'INSERT INTO "{stage_table}" VALUES '
                    "(2, 'overwrite', 'not-a-timestamp')"
                )
                con.commit()
            finally:
                con.close()

        with pytest.raises(Exception):
            sink.keyed_overwrite_jdbc(
                spark.createDataFrame(
                    [(2, "x", None)], "id int, name string, stamp timestamp"
                ),
                PG_URL, table, "id", COLUMNS,
                connection_factory=lambda: drv.connect(PG_URL),
                stage_writer=poisoned_stage,
            )
        # the DELETE that ran inside the failed txn was rolled back
        assert _fetch_all(drv, table) == [(1, "keep"), (2, "also-keep")]
    finally:
        _drop(drv, table, f"{table}__stage")


def test_engine_only_stage_and_merge_copy_from_stdin(spark):
    """The zero-external-deps production path (r11): the ENGINE's own
    stage writer (`sink.pgwire_stage_writer` — COPY FROM STDIN over the
    pure-stdlib wire client) feeds the same merge transaction; no
    test-local stage code, no psycopg, no jar.  Exercises COPY text
    escaping on the wire: tabs, newlines, backslashes, quotes, unicode
    and NULL all round-trip byte-exactly."""
    from airflow_postgres_etl_spark import pgwire

    drv = _pg_driver()
    table = f"s9_copy_{uuid.uuid4().hex[:8]}"
    nasty = "tab\there\nnewline \\ backslash 'quote' café"
    try:
        b1 = spark.createDataFrame(
            [(1, nasty, None), (2, "plain", None)],
            "id int, name string, stamp timestamp",
        )
        sink.keyed_overwrite_jdbc(
            b1, PG_URL, table, "id", COLUMNS,
            connection_factory=lambda: pgwire.connect(PG_URL),
            stage_writer=sink.pgwire_stage_writer(PG_URL, COLUMNS),
        )
        assert _fetch_all(drv, table) == [(1, nasty), (2, "plain")]

        # replace key 2, add 3 — replay semantics through the COPY stage
        b2 = spark.createDataFrame(
            [(2, "replaced", None), (3, "new", None)],
            "id int, name string, stamp timestamp",
        )
        sink.keyed_overwrite_jdbc(
            b2, PG_URL, table, "id", COLUMNS,
            connection_factory=lambda: pgwire.connect(PG_URL),
            stage_writer=sink.pgwire_stage_writer(PG_URL, COLUMNS),
        )
        assert _fetch_all(drv, table) == [
            (1, nasty), (2, "replaced"), (3, "new"),
        ]
    finally:
        _drop(drv, table, f"{table}__stage")


def test_copy_in_server_side_failure_leaves_connection_usable():
    """A COPY that the SERVER rejects mid-stream (type mismatch) raises
    PgError, the implicit transaction rolls back, and the same
    connection keeps working — the aborted-txn drain path."""
    from airflow_postgres_etl_spark import pgwire

    table = f"copyfail_{uuid.uuid4().hex[:8]}"
    con = pgwire.connect(PG_URL)
    try:
        cur = con.cursor()
        cur.execute(f'CREATE TABLE "{table}" ("id" INTEGER)')
        con.commit()
        with pytest.raises(pgwire.PgError):
            con.copy_in(
                f'COPY "{table}" ("id") FROM STDIN',
                [(1,), ("not-an-int",)],
            )
        con.rollback()
        cur.execute(f'SELECT count(*) FROM "{table}"')
        assert cur.fetchone()[0] == 0
        n = con.copy_in(
            f'COPY "{table}" ("id") FROM STDIN', [(7,), (8,)]
        )
        con.commit()
        assert n == 2
        cur.execute(f'SELECT count(*) FROM "{table}"')
        assert cur.fetchone()[0] == 2
    finally:
        try:
            cur = con.cursor()
            cur.execute(f'DROP TABLE IF EXISTS "{table}"')
            con.commit()
        finally:
            con.close()


def test_incremental_load_relational_live_end_to_end(spark, tmp_path):
    """The reference's LITERAL production loop on a real server (r11):
    S6 existence probe + S8 high-water mark read from Postgres, the
    scan/parse/dedup/explode chain, and the S9 staged COPY + delete+
    insert merge per table — `pipeline.incremental_load_relational`
    with every leg on the wire and zero external dependencies.
    Incremental contract: held-back files are invisible until
    delivered, a no-new-files cycle merges nothing, and the final
    relational state has exactly one row per key."""
    from airflow_postgres_etl_spark import pgwire
    from airflow_postgres_etl_spark.pipeline import (
        incremental_load_relational,
        relational_high_water_mark,
    )
    from tests.fixtures.gen_raw import generate

    drv = _pg_driver()
    csv_dir = str(tmp_path / "csv")
    generate(csv_dir)
    run = uuid.uuid4().hex[:8]
    tr, ev = f"tracking_{run}", f"events_{run}"
    factory = lambda: pgwire.connect(PG_URL)  # noqa: E731
    kw = dict(
        connection_factory=factory,
        stage_writer_factory=lambda cols: sink.pgwire_stage_writer(
            PG_URL, cols
        ),
    )
    try:
        all_files = sorted(os.listdir(csv_dir))
        holding = csv_dir + "_held"
        os.makedirs(holding)
        for f in all_files[-2:]:
            os.replace(
                os.path.join(csv_dir, f), os.path.join(holding, f)
            )

        # first load: S6 probe says "no table" -> full load of present files
        con = factory()
        try:
            assert relational_high_water_mark(con, tr) is None
        finally:
            con.close()
        c1 = incremental_load_relational(spark, csv_dir, tr, ev, **kw)
        assert c1["tracking"] > 0 and c1["events"] > 0
        con = factory()
        try:
            assert relational_high_water_mark(con, tr) == all_files[-3]
        finally:
            con.close()

        # no new files: both probes run, nothing merges
        assert incremental_load_relational(
            spark, csv_dir, tr, ev, **kw
        ) == {"tracking": 0, "events": 0}

        # deliver the held files: only they process, HWM advances
        for f in all_files[-2:]:
            os.replace(
                os.path.join(holding, f), os.path.join(csv_dir, f)
            )
        c2 = incremental_load_relational(spark, csv_dir, tr, ev, **kw)
        assert c2["tracking"] > 0
        con = factory()
        try:
            assert relational_high_water_mark(con, tr) == all_files[-1]
            cur = con.cursor()
            cur.execute(
                f'SELECT count(*), count(DISTINCT "oid__id") FROM "{tr}"'
            )
            total, distinct = cur.fetchone()
            assert total == distinct  # one row per key after merges
            cur.execute(sink.table_exists_sql(ev))
            assert cur.fetchone() is not None
        finally:
            con.close()
    finally:
        _drop(drv, tr, ev, f"{tr}__stage", f"{ev}__stage")


def test_wire_value_round_trip_property():
    """Property (live server): any value the engine can render — via
    INSERT literal quoting AND via COPY text format — comes back from
    PostgreSQL exactly equal.  Pins the two escaping paths against each
    other and against the server's own parser (NUL is excluded: a
    Postgres text value cannot contain it by definition)."""
    from datetime import datetime, timezone

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from airflow_postgres_etl_spark import pgwire

    texts = st.text(
        alphabet=st.characters(
            blacklist_characters="\x00", blacklist_categories=("Cs",)
        ),
        max_size=200,
    )
    values = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**62), max_value=2**62),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        texts,
        st.datetimes(
            min_value=datetime(1, 1, 1),
            max_value=datetime(9999, 12, 28),
        ).map(lambda d: d.replace(tzinfo=None)),
    )

    con = pgwire.connect(PG_URL)
    cur = con.cursor()
    cur.execute(
        'CREATE TABLE IF NOT EXISTS "rt" ('
        '"b" BOOLEAN, "i" BIGINT, "f" DOUBLE PRECISION, '
        '"t" TEXT, "ts" TIMESTAMP)'
    )
    con.commit()

    def col_for(v):
        if isinstance(v, bool):
            return "b"
        if isinstance(v, int):
            return "i"
        if isinstance(v, float):
            return "f"
        if isinstance(v, datetime):
            return "ts"
        return "t"

    @settings(
        max_examples=60,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(v=values)
    def check(v):
        # rollback on ANY failure: a server-rejected value (the bug
        # class this property hunts) aborts the shared implicit
        # transaction, and without the rollback every subsequent
        # example/shrink step would fail with 'transaction aborted'
        # noise instead of reproducing the real mis-escaped value
        try:
            col = col_for(v) if v is not None else "t"
            cur.execute('DELETE FROM "rt"')
            # path 1: client-side literal (the merge-statement path)
            cur.execute(f'INSERT INTO "rt" ("{col}") VALUES (%s)', (v,))
            cur.execute(f'SELECT "{col}" FROM "rt"')
            assert cur.fetchone()[0] == v
            cur.execute('DELETE FROM "rt"')
            # path 2: COPY text format (the bulk stage path)
            con.copy_in(f'COPY "rt" ("{col}") FROM STDIN', [(v,)])
            cur.execute(f'SELECT "{col}" FROM "rt"')
            assert cur.fetchone()[0] == v
            con.commit()
        except BaseException:
            con.rollback()
            raise

    try:
        check()
    finally:
        cur.execute('DROP TABLE IF EXISTS "rt"')
        con.commit()
        con.close()


def test_read_relational_table_round_trip_into_spark(spark):
    """Relational SOURCE leg (r11): a table written by the S9 merge
    reads back into Spark as a TYPED DataFrame via the wire client —
    ids as longs, timestamps as timestamps, text as strings — so a
    dimension loaded from Postgres joins directly against parquet
    facts.  Also pins the max_rows contract: an oversized read raises
    instead of silently truncating."""
    from datetime import datetime

    import pytest

    from airflow_postgres_etl_spark import pgwire
    from airflow_postgres_etl_spark.sources.relational import (
        read_relational_query,
        read_relational_table,
    )

    drv = _pg_driver()
    table = f"dim_{uuid.uuid4().hex[:8]}"
    stamp = datetime(2024, 3, 1, 12, 30, 45)
    batch = spark.createDataFrame(
        [(1, "alpha", stamp), (2, "béta\ttabbed", None)],
        "id int, name string, stamp timestamp",
    )
    try:
        sink.keyed_overwrite_jdbc(
            batch, PG_URL, table, "id", COLUMNS,
            connection_factory=lambda: pgwire.connect(PG_URL),
            stage_writer=sink.pgwire_stage_writer(PG_URL, COLUMNS),
        )
        df = read_relational_table(spark, PG_URL, table)
        assert [f.dataType.typeName() for f in df.schema.fields] == [
            "integer", "string", "timestamp_ntz",
        ]
        got = {r["id"]: (r["name"], r["stamp"]) for r in df.collect()}
        assert got == {
            1: ("alpha", stamp), 2: ("béta\ttabbed", None),
        }
        # typed enough to JOIN directly against a Spark-side frame
        joined = batch.select("id").join(df, "id").count()
        assert joined == 2

        # aggregate pushdown stays on the server: one-row result
        agg = read_relational_query(
            spark, PG_URL,
            f'SELECT count(*) AS n, max("id") AS hi FROM "{table}"',
        )
        row = agg.collect()[0]
        assert (row["n"], row["hi"]) == (2, 2)
        assert agg.schema["n"].dataType.typeName() == "long"

        # the dimension-size contract raises, never truncates
        with pytest.raises(ValueError, match="max_rows"):
            read_relational_table(spark, PG_URL, table, max_rows=1)
    finally:
        _drop(drv, table, f"{table}__stage")


def test_stream_ingest_relational_live(spark, tmp_path):
    """The reference's scheduled Postgres pipeline as ONE streaming
    query against a live server (r11): file-source checkpoint decides
    the epochs, each micro-batch lands through the S9 wire merge.
    Pins (a) the final relational state equals the batch loader's on
    the same inputs (differential), (b) a restart from the same
    checkpoint processes ONLY newly delivered files, (c) replace-by-key
    keeps one row per key throughout."""
    from airflow_postgres_etl_spark import pgwire
    from airflow_postgres_etl_spark.pipeline import (
        incremental_load_relational,
    )
    from airflow_postgres_etl_spark.streaming.file_stream import (
        stream_ingest_relational,
    )
    from tests.fixtures.gen_raw import generate

    drv = _pg_driver()
    csv_dir = str(tmp_path / "csv")
    generate(csv_dir)
    # pin epoch grouping: Spark's file source orders by (mtime, path),
    # and generate() writes in one tight loop, so equal mtimes could
    # regroup epochs away from the lexicographic order the batch-twin
    # loop feeds — space the mtimes to match the name order
    for i, f in enumerate(sorted(os.listdir(csv_dir))):
        t = 1_700_000_000 + i * 10
        os.utime(os.path.join(csv_dir, f), (t, t))
    ck = str(tmp_path / "ck")
    run = uuid.uuid4().hex[:8]
    tr, ev = f"s_tracking_{run}", f"s_events_{run}"
    btr, bev = f"b_tracking_{run}", f"b_events_{run}"
    factory = lambda: pgwire.connect(PG_URL)  # noqa: E731
    kw = dict(
        connection_factory=factory,
        stage_writer_factory=lambda cols: sink.pgwire_stage_writer(
            PG_URL, cols
        ),
    )

    def snapshot(table):
        con = factory()
        try:
            cur = con.cursor()
            cur.execute(
                f'SELECT "oid__id", "fileName" FROM "{table}" '
                'ORDER BY "oid__id"'
            )
            return cur.fetchall()
        finally:
            con.close()

    try:
        all_files = sorted(os.listdir(csv_dir))
        holding = csv_dir + "_held"
        os.makedirs(holding)
        for f in all_files[-2:]:
            os.replace(os.path.join(csv_dir, f), os.path.join(holding, f))

        q = stream_ingest_relational(
            spark, csv_dir, tr, ev, ck,
            max_files_per_trigger=2, **kw,
        )
        assert q.awaitTermination(300)  # timed out = partial state
        assert q.exception() is None
        phase1 = snapshot(tr)
        assert len(phase1) > 0
        assert len({k for k, _ in phase1}) == len(phase1)  # keyed

        # restart with NO new files: checkpoint says nothing to do
        q = stream_ingest_relational(
            spark, csv_dir, tr, ev, ck,
            max_files_per_trigger=2, **kw,
        )
        assert q.awaitTermination(300)  # timed out = partial state
        assert q.exception() is None
        assert snapshot(tr) == phase1

        # deliver the held files; only they process, state advances
        for f in all_files[-2:]:
            os.replace(os.path.join(holding, f), os.path.join(csv_dir, f))
        q = stream_ingest_relational(
            spark, csv_dir, tr, ev, ck,
            max_files_per_trigger=2, **kw,
        )
        assert q.awaitTermination(300)  # timed out = partial state
        assert q.exception() is None
        final = snapshot(tr)
        assert max(fn for _, fn in final) == all_files[-1]

        # differential: the BATCH loader fed the same 2-file increments
        # lands the identical relational state (a one-shot full load is
        # NOT comparable on events: delete+insert only touches keys
        # present in a batch, so a key whose newest file version builds
        # zero event rows keeps its older rows under ANY incremental
        # schedule — the reference's own delete_and_insert semantics)
        bcsv = str(tmp_path / "bcsv")
        os.makedirs(bcsv)
        for i in range(0, len(all_files), 2):
            for f in all_files[i : i + 2]:
                shutil.copy(
                    os.path.join(csv_dir, f), os.path.join(bcsv, f)
                )
            incremental_load_relational(spark, bcsv, btr, bev, **kw)
        assert final == snapshot(btr)
        assert snapshot(ev) == snapshot(bev)
    finally:
        _drop(
            drv, tr, ev, btr, bev,
            f"{tr}__stage", f"{ev}__stage",
            f"{btr}__stage", f"{bev}__stage",
        )


def test_read_relational_unrepresentable_values_raise_named_errors():
    """Legal Postgres values a mapped Spark type cannot hold (timestamp
    'infinity', numeric NaN, numeric past DECIMAL(38,18)) raise a
    ValueError NAMING the column and the SQL-cast fix — never a silent
    null or an opaque createDataFrame failure; the suggested ::text
    cast then reads the value as a string.  The max_rows cap is
    enforced server-side (LIMIT subselect), so the oversize error fires
    without shipping the whole result."""
    import pytest

    from airflow_postgres_etl_spark import pgwire
    from airflow_postgres_etl_spark.session import get_spark
    from airflow_postgres_etl_spark.sources.relational import (
        read_relational_query,
    )

    spark = get_spark()
    with pytest.raises(ValueError, match="valid_to.*::text"):
        read_relational_query(
            spark, PG_URL,
            "SELECT 'infinity'::timestamp AS valid_to",
        )
    with pytest.raises(ValueError, match="weight.*DECIMAL"):
        read_relational_query(
            spark, PG_URL, "SELECT 'NaN'::numeric AS weight"
        )
    with pytest.raises(ValueError, match="big.*DECIMAL"):
        read_relational_query(
            spark, PG_URL, "SELECT 1e30::numeric AS big"
        )
    df = read_relational_query(
        spark, PG_URL,
        "SELECT 'infinity'::timestamp::text AS valid_to, "
        "'NaN'::numeric::text AS weight",
    )
    assert df.collect()[0].asDict() == {
        "valid_to": "infinity", "weight": "NaN",
    }
    # server-side cap: generate_series would be 1M rows; LIMIT stops it
    with pytest.raises(ValueError, match="max_rows"):
        read_relational_query(
            spark, PG_URL,
            "SELECT g FROM generate_series(1, 1000000) g",
            max_rows=100,
        )


def test_read_relational_edge_numerics_and_comment_sql():
    """r11 review regressions: (a) legal numerics in [1e10, 1e20) must
    NOT be falsely rejected (the default 28-digit decimal context
    couldn't quantize them to scale 18); (b) SQL ending in a line
    comment survives the server-side LIMIT wrapper; (c) a DATE
    'infinity' gets the same named error as timestamps, not an opaque
    decode failure."""
    from decimal import Decimal

    import pytest

    from airflow_postgres_etl_spark.session import get_spark
    from airflow_postgres_etl_spark.sources.relational import (
        read_relational_query,
    )

    spark = get_spark()
    df = read_relational_query(
        spark, PG_URL,
        "SELECT 12345678901.5::numeric AS ok_big, "
        "1693000000000::numeric AS epochish  -- trailing comment",
    )
    row = df.collect()[0]
    assert row["ok_big"] == Decimal("12345678901.5")
    assert row["epochish"] == Decimal("1693000000000")
    with pytest.raises(ValueError, match="toobig.*DECIMAL"):
        read_relational_query(
            spark, PG_URL, "SELECT 1e21::numeric AS toobig"
        )
    with pytest.raises(ValueError, match="d.*::text"):
        read_relational_query(
            spark, PG_URL, "SELECT 'infinity'::date AS d"
        )
