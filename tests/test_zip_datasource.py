"""Distributed zip-of-CSVs Python DataSource (sources/zip_datasource):
executor-side member reads replace the reference's driver-side unpack
script — contract tests over quoting, lineage, alignment, parallelism."""

from __future__ import annotations

import zipfile

import pytest

from airflow_postgres_etl_spark.sources.zip_datasource import read_zip_csv


def _mk_zip(path, members: dict[str, str]) -> None:
    with zipfile.ZipFile(path, "w") as zf:
        for name, body in members.items():
            zf.writestr(name, body)


@pytest.fixture()
def zip_dir(tmp_path):
    d = tmp_path / "zips"
    d.mkdir()
    _mk_zip(
        d / "a.zip",
        {
            "20240101-000000000.csv": 'id,desc\n1,"hello, world"\n2,plain\n',
            "20240102-000000000.csv": 'id,desc\n3,"say ""hi"""\n',
        },
    )
    _mk_zip(d / "b.zip", {"20240103-000000000.csv": "desc,id\nswapped,4\n"})
    return str(d)


def test_members_read_with_lineage_and_quoting(spark, zip_dir):
    df = read_zip_csv(spark, zip_dir, ["id", "desc"])
    rows = {
        (r["id"], r["desc"], r["fileName"]) for r in df.collect()
    }
    assert rows == {
        ("1", "hello, world", "20240101-000000000.csv"),
        ("2", "plain", "20240101-000000000.csv"),
        ("3", 'say "hi"', "20240102-000000000.csv"),
        ("4", "swapped", "20240103-000000000.csv"),  # header order aligned
    }


def test_one_partition_per_member(spark, zip_dir):
    df = read_zip_csv(spark, zip_dir, ["id", "desc"])
    assert df.rdd.getNumPartitions() == 3


def test_missing_column_raises(spark, zip_dir):
    df = read_zip_csv(spark, zip_dir, ["id", "nope"])
    with pytest.raises(Exception, match="missing column"):
        df.collect()


def test_extra_member_columns_dropped(spark, zip_dir):
    df = read_zip_csv(spark, zip_dir, ["id"])
    assert df.columns == ["id", "fileName"]
    assert {r["id"] for r in df.collect()} == {"1", "2", "3", "4"}


def test_empty_string_is_null(spark, tmp_path):
    d = tmp_path / "z"
    d.mkdir()
    _mk_zip(d / "a.zip", {"m.csv": "id,desc\n1,\n"})
    row = read_zip_csv(spark, str(d), ["id", "desc"]).collect()[0]
    assert row["desc"] is None


def test_no_members_raises(spark, tmp_path):
    d = tmp_path / "z"
    d.mkdir()
    _mk_zip(d / "a.zip", {"readme.txt": "not a csv"})
    with pytest.raises(Exception, match="no .csv members"):
        read_zip_csv(spark, str(d), ["id"]).collect()


def test_filter_and_projection_compose(spark, zip_dir):
    df = read_zip_csv(spark, zip_dir, ["id", "desc"])
    got = df.filter("id = '3'").select("desc").collect()
    assert [r["desc"] for r in got] == ['say "hi"']
