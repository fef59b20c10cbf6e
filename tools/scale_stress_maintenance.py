"""Measure the ambient-maintenance surfaces: staged IVF rebuild
(r11) and MinHash policy compaction (r11) at a given SF.

Usage: python tools/scale_stress_maintenance.py [sf_dir]
(default /root/testdata/sf0.1).  Prints one JSON line per measurement.
Run single-tenant — never while the test suite or another Spark job
shares the host (contaminated readings measured 10x off).

What the numbers support (SCALE.md r11):
- the below-threshold maintain probe is METADATA-ONLY (ms-class, no
  data scan) for both policies;
- the staged rebuild costs the same data work as the old in-place
  rebuild (same build, same writes) plus one meta JSON write — the
  generation indirection is free at rebuild time and buys gate-before-
  serve + crash immunity;
- the recall gate adds a bounded probe panel (queries x corpus exact
  leg + staged-index probe), linear in the corpus.
"""

import json
import os
import sys
import time

os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.getcwd())

from airflow_postgres_etl_spark.operators import dedup as D  # noqa: E402
from airflow_postgres_etl_spark.operators import similarity as S  # noqa: E402
from airflow_postgres_etl_spark.session import get_spark  # noqa: E402
from airflow_postgres_etl_spark.sources.parquet_source import (  # noqa: E402
    load_table,
)


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(json.dumps({"step": label, "sec": round(dt, 3)}), flush=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tmp = f"/tmp/maint_stress_{int(time.time())}"
    spark = get_spark(app_name="scale-stress-maintenance")

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cut = int(n * 0.7)
    base = emb.filter(emb.vec_id < cut)
    batch = emb.filter(emb.vec_id >= cut)
    idx = f"{tmp}/ivf"
    print(json.dumps({"corpus_vectors": n, "sf_dir": sf_dir}), flush=True)

    timed("ivf_build_flat", lambda: S.build_ivf_index(base, idx))
    timed("ivf_append_30pct", lambda: S.append_to_ivf_index(batch, idx))
    timed(
        "ivf_below_threshold_probe",
        lambda: S.ivf_appended_fraction(idx),
    )
    timed(
        "ivf_staged_rebuild_ungated",
        lambda: S.rebuild_ivf_index_staged(emb, idx),
    )
    S.append_to_ivf_index(
        batch.selectExpr(f"vec_id + {n} as vec_id", "embedding"), idx
    )
    gate = {"recall_k": 10, "recall_queries": 30, "min_recall": 0.5}
    timed(
        "ivf_staged_rebuild_gated_30q",
        lambda: S.rebuild_ivf_index_staged(
            emb.select("vec_id", "embedding").union(
                batch.selectExpr(f"vec_id + {n} as vec_id", "embedding")
            ),
            idx,
            gate=gate,
        ),
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nd = docs.count()
    dcut = int(nd * 0.7)
    dbase = docs.filter(docs.doc_id < dcut)
    dbatch = docs.filter(docs.doc_id >= dcut)
    mh = f"{tmp}/mh"
    print(json.dumps({"corpus_docs": nd}), flush=True)
    timed("minhash_build", lambda: D.build_minhash_index(dbase, mh))
    timed(
        "minhash_append_30pct",
        lambda: D.append_to_minhash_index(dbatch, mh),
    )
    timed(
        "minhash_below_threshold_probe",
        lambda: D.minhash_appended_fraction(mh),
    )
    policy = {
        "index_path": mh,
        "id_col": "doc_id",
        "text_col": "text",
        "max_appended_fraction": 0.2,
        "shingle_n": 3,
        "max_band_size": None,
    }
    timed(
        "minhash_policy_compact",
        lambda: D.maintain_minhash_policy(spark, docs, policy),
    )

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
