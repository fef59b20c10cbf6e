"""Unit tests for the shared streaming delivery helpers
(streaming/delivery.py) — the validation knob and the checkpoint-
incarnation writer identity (r10)."""

from __future__ import annotations

import json
import os

import pytest

from airflow_postgres_etl_spark.streaming.delivery import (
    stream_txn_app,
    validate_delivery,
)


def test_validate_delivery_contract():
    assert validate_delivery("exactly_once", ("exactly_once", "at_most_once"))
    assert not validate_delivery(
        "at_most_once", ("exactly_once", "at_most_once")
    )
    assert not validate_delivery(
        "at_least_once", ("exactly_once", "at_least_once")
    )
    with pytest.raises(ValueError, match="delivery must be"):
        validate_delivery("at_least_once", ("exactly_once", "at_most_once"))
    with pytest.raises(ValueError, match="delivery must be"):
        validate_delivery("", ("exactly_once", "at_most_once"))


def test_stream_txn_app_salts_with_run_uuid(tmp_path):
    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    # pre-start (no metadata yet): path fallback, never an error
    assert stream_txn_app(ck) == ck
    with open(os.path.join(ck, "metadata"), "w") as fh:
        json.dump({"id": "run-uuid-1"}, fh)
    assert stream_txn_app(ck) == f"{ck}#run-uuid-1"
    # a RECREATED checkpoint gets a new uuid -> a new writer identity
    with open(os.path.join(ck, "metadata"), "w") as fh:
        json.dump({"id": "run-uuid-2"}, fh)
    assert stream_txn_app(ck) == f"{ck}#run-uuid-2"
    # corrupt metadata: fallback, never an error
    with open(os.path.join(ck, "metadata"), "w") as fh:
        fh.write("not json")
    assert stream_txn_app(ck) == ck
