"""Property-based test for column mapping: random sequences of
rename / drop / merge / delete / purge against a keyed table must keep
`read_keyed_table` equal to a plain dict model at every step.

The model is the obvious thing the mapping machinery must emulate:
a {key: {logical_col: value}} dict where rename relabels a field,
drop deletes it, merge replaces whole rows, delete removes by
predicate, and purge is a no-op on CONTENT.  Any divergence — a
stale physical name leaking, a dropped column resurfacing, a freed
name resolving to the wrong physical, a purge changing data — fails
the comparison immediately at the op that introduced it.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_postgres_etl_spark.sink import (
    compact_keyed_table,
    drop_column,
    keyed_delete_where,
    keyed_overwrite_parquet,
    purge_column_mapping,
    read_keyed_table,
    rename_column,
)

#: fresh names a rename may introduce — includes previously-used ones so
#: freed-name reuse (the hazardous case) is generated naturally
NAME_POOL = ["a", "b", "c", "n1", "n2", "n3", "n4"]

op_strategy = st.one_of(
    st.tuples(st.just("rename"), st.integers(0, 2), st.sampled_from(NAME_POOL)),
    st.tuples(st.just("drop"), st.integers(0, 2), st.just("")),
    st.tuples(st.just("merge"), st.integers(0, 9), st.just("")),
    st.tuples(st.just("delete"), st.integers(0, 4), st.just("")),
    st.tuples(st.just("purge"), st.just(0), st.just("")),
)


def _check(spark, target, names, model):
    got = {
        r["oid__id"]: {c: r[c] for c in names.values()}
        for r in (
            x.asDict() for x in read_keyed_table(spark, target).collect()
        )
    }
    assert got == model, (names, got, model)
    cols = set(read_keyed_table(spark, target).columns)
    assert cols == {"oid__id", *names.values()}, (cols, names)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(ops=st.lists(op_strategy, min_size=1, max_size=7))
def test_mapping_ops_match_dict_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("colmap_prop")
    target = str(tmp / "t")
    # three value slots; `names[slot]` is the slot's CURRENT logical name
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
    dropped_names: set[str] = set()
    next_key = 100

    for kind, arg, name in ops:
        if kind == "rename":
            slot = arg % 3 if names else 0
            if slot not in names:
                continue
            old = names[slot]
            if (
                name == old
                or name in names.values()
                or name in dropped_names
                or name == "oid__id"
            ):
                continue
            rename_column(spark, target, old, name)
            names[slot] = name
            for k in model:
                model[k][name] = model[k].pop(old)
        elif kind == "drop":
            slot = arg % 3
            if slot not in names or len(names) == 1:
                continue  # keep at least one value column
            old = names.pop(slot)
            drop_column(spark, target, old)
            dropped_names.add(old)
            for k in model:
                model[k].pop(old)
        elif kind == "merge":
            # replace one existing key and insert one new, with the
            # CURRENT logical schema
            cols = ["oid__id"] + [names[s] for s in sorted(names)]
            k_old, k_new = f"k{arg % 8}", f"k{next_key}"
            next_key += 1
            vals_old = tuple(arg * 7 + s for s in sorted(names))
            vals_new = tuple(arg * 11 + s for s in sorted(names))
            batch = spark.createDataFrame(
                [(k_old, *vals_old), (k_new, *vals_new)], cols
            )
            keyed_overwrite_parquet(spark, batch, target, vacuum=False)
            model[k_old] = dict(zip(cols[1:], vals_old))
            model[k_new] = dict(zip(cols[1:], vals_new))
        elif kind == "delete":
            col = names[sorted(names)[0]]
            keyed_delete_where(spark, target, f"{col} % 5 = {arg}")
            compact_keyed_table(spark, target)
            model = {
                k: v for k, v in model.items() if not v[col] % 5 == arg
            }
            if not model:
                return  # empty table: schema resolution is undefined
        elif kind == "purge":
            purge_column_mapping(spark, target)
            dropped_names.clear()  # purged names may be reused again
        _check(spark, target, names, model)
