"""Property test for the column-mapping × drift-policy × txn-watermark
interaction (r10, VERDICT r9 task 7): random sequences of
{rename, drop, set_policy, merge, append(txn), maintain, optimize}
against a keyed table must keep THREE things equal to a plain dict
model at every step —

- the table content (``read_keyed_table`` == row dict),
- the stored drift policy's referenced columns (renames must be
  followed, drops of referenced columns must be REJECTED with the
  policy intact),
- the writer-transaction watermark (advances exactly on applied
  epochs, never on replays, and survives every metadata/maintenance
  commit via the manifest carry).

r9 added rebase-proof guards for each pairwise interaction; this
closes the combinatorial tail the same way test_property_colmap did
for mapping ops.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_postgres_etl_spark import sink
from airflow_postgres_etl_spark.api import Table
from airflow_postgres_etl_spark.operators.expectations import (
    expect_distribution,
)
from airflow_postgres_etl_spark.sink import (
    drop_column,
    keyed_append,
    keyed_overwrite_parquet,
    optimize_keyed_table,
    read_keyed_table,
    rename_column,
    set_drift_policy,
)

NAME_POOL = ["a", "b", "c", "p1", "p2", "p3", "p4"]

op_strategy = st.one_of(
    st.tuples(st.just("rename"), st.integers(0, 2), st.sampled_from(NAME_POOL)),
    st.tuples(st.just("drop"), st.integers(0, 2), st.just("")),
    st.tuples(st.just("set_policy"), st.integers(0, 7), st.just("")),
    st.tuples(st.just("merge"), st.integers(0, 9), st.just("")),
    st.tuples(st.just("append"), st.integers(0, 9), st.just("")),
    st.tuples(st.just("maintain"), st.just(0), st.just("")),
    st.tuples(st.just("optimize"), st.just(0), st.just("")),
)


def _rules_for(names: dict[int, str], mask: int):
    """One numeric PSI rule per masked slot — no thresholds, so the
    rules are REPORT-ONLY (set_drift_policy's documented semantics) and
    maintain(on_drift='raise') must never trip on them."""
    return [
        expect_distribution(
            f"r{slot}", names[slot], edges=[50.0], probs=[0.5, 0.5]
        )
        for slot in sorted(names)
        if mask & (1 << slot)
    ]


def _check(spark, target, names, model, policy_slots, watermark):
    got = {
        r["oid__id"]: {c: r[c] for c in names.values()}
        for r in (x.asDict() for x in read_keyed_table(spark, target).collect())
    }
    assert got == model, (names, got, model)
    pol = sink.drift_policy(target)
    want_refs = {f"r{s}": names[s] for s in policy_slots}
    got_refs = (
        {r["name"]: r["col"] for r in pol["rules"]} if pol else {}
    )
    assert got_refs == want_refs, (got_refs, want_refs)
    m = sink._load_manifest(target)
    assert m.get("txns", {}).get("w") == watermark, (
        m.get("txns"), watermark,
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(ops=st.lists(op_strategy, min_size=1, max_size=6))
def test_policy_txn_mapping_ops_match_dict_model(
    spark, tmp_path_factory, ops
):
    tmp = tmp_path_factory.mktemp("policy_txn_prop")
    target = str(tmp / "t")
    names = {0: "a", 1: "b", 2: "c"}
    rows = [(f"k{i}", i, i * 10, i * 100) for i in range(8)]
    keyed_overwrite_parquet(
        spark,
        spark.createDataFrame(rows, ["oid__id", "a", "b", "c"]),
        target,
        num_buckets=2,
        vacuum=False,
    )
    model = {k: {"a": x, "b": y, "c": z} for k, x, y, z in rows}
    dropped: set[str] = set()
    policy_slots: set[int] = set()
    watermark: int | None = None
    next_key = 100

    for kind, arg, name in ops:
        if kind == "rename":
            slot = arg % 3
            if slot not in names:
                continue
            old = names[slot]
            if (
                name == old
                or name in names.values()
                or name in dropped
                or name == "oid__id"
            ):
                continue
            rename_column(spark, target, old, name)
            names[slot] = name
            for k in model:
                model[k][name] = model[k].pop(old)
            # the policy's col refs must FOLLOW automatically — checked
            # via policy_slots (slot→current-name) in _check
        elif kind == "drop":
            slot = arg % 3
            if slot not in names or len(names) == 1:
                continue
            if slot in policy_slots:
                # a referenced column may NOT be dropped; the policy and
                # the column must both survive the rejected attempt
                with pytest.raises(ValueError, match="drift-policy"):
                    drop_column(spark, target, names[slot])
            else:
                old = names.pop(slot)
                drop_column(spark, target, old)
                dropped.add(old)
                for k in model:
                    model[k].pop(old)
        elif kind == "set_policy":
            mask = arg & sum(1 << s for s in names)
            if mask == 0:
                set_drift_policy(spark, target, None)
                policy_slots = set()
            else:
                set_drift_policy(spark, target, _rules_for(names, mask))
                policy_slots = {s for s in names if mask & (1 << s)}
        elif kind == "merge":
            cols = ["oid__id"] + [names[s] for s in sorted(names)]
            k_old, k_new = f"k{arg % 8}", f"k{next_key}"
            next_key += 1
            vals_old = tuple(arg * 7 + s for s in sorted(names))
            vals_new = tuple(arg * 11 + s for s in sorted(names))
            if k_old not in model:
                continue
            keyed_overwrite_parquet(
                spark,
                spark.createDataFrame(
                    [(k_old, *vals_old), (k_new, *vals_new)], cols
                ),
                target,
                vacuum=False,
            )
            model[k_old] = dict(zip(cols[1:], vals_old))
            model[k_new] = dict(zip(cols[1:], vals_new))
        elif kind == "append":
            # even arg: next epoch (applies); odd arg: replay an already
            # -applied (or pre-first) epoch — MUST be a content no-op
            if arg % 2 == 0 or watermark is None:
                seq = (watermark or 0) + 1
            else:
                seq = max(0, watermark - arg % 3)
            cols = ["oid__id"] + [names[s] for s in sorted(names)]
            k = f"k{next_key}"
            vals = tuple(arg * 13 + s for s in sorted(names))
            keyed_append(
                spark,
                spark.createDataFrame([(k, *vals)], cols),
                target,
                verify_new=False,
                txn_app="w",
                txn_seq=seq,
            )
            if watermark is None or seq > watermark:
                next_key += 1
                model[k] = dict(zip(cols[1:], vals))
                watermark = seq
            # else: replayed epoch — nothing changes, watermark keeps max
        elif kind == "maintain":
            # report-only rules: on_drift='raise' must NOT trip (no
            # thresholds stored), and maintenance must not move content,
            # policy, or watermark
            Table(spark, target).maintain(retention_s=0.0, on_drift="raise")
        elif kind == "optimize":
            optimize_keyed_table(spark, target, max_files_per_bucket=1)
        _check(spark, target, names, model, policy_slots, watermark)
