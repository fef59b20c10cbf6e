"""Engine facade + zip source tests."""

from __future__ import annotations

import os
import zipfile

from airflow_postgres_etl_spark.api import Engine
from airflow_postgres_etl_spark.sources.zip_source import extract_zip

from .conftest import SF_SMOKE
from .fixtures.gen_raw import generate


def test_engine_full_workflow(spark, tmp_path):
    csv_dir = str(tmp_path / "csv")
    generate(csv_dir, n_files=3, rows_per_file=30)
    eng = Engine(spark)
    counts = eng.ingest(csv_dir, str(tmp_path / "out"))
    assert counts["tracking"] > 0

    # interactive SQL over the loaded tables (reference entry point C),
    # including the reserved-word columns
    n = eng.sql('SELECT count(*) AS n FROM events WHERE `from` IS NOT NULL').collect()[0].n
    assert n > 0
    per_min = eng.sql(
        "SELECT date_trunc('minute', createdAt) AS m, count(*) AS n "
        "FROM tracking GROUP BY 1 ORDER BY 1"
    )
    assert per_min.count() > 0

    # named query library
    assert "q3_rank_event_types" in eng.queries()
    assert eng.query("q2_top_event_types", SF_SMOKE).count() > 0
    assert eng.oracle("q2_top_event_types") is not None


def test_extract_zip(tmp_path):
    src = tmp_path / "payload.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("a.csv", "Op,oid__id\nU,x")
        zf.writestr("sub/b.csv", "Op,oid__id\nI,y")
    out = extract_zip(str(src), str(tmp_path / "dest"))
    assert sorted(out) == ["a.csv", "sub/b.csv"]
    assert os.path.exists(tmp_path / "dest" / "sub" / "b.csv")


def test_extract_zip_rejects_escape(tmp_path):
    src = tmp_path / "evil.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("../evil.txt", "x")
    try:
        extract_zip(str(src), str(tmp_path / "dest"))
        raised = False
    except ValueError:
        raised = True
    assert raised
